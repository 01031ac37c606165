"""Text analysis over the `documents` table — language ID, quality
scoring, token counting, fingerprinting.

Everything here compiles to built-in Spark SQL expressions (split,
lambda higher-order functions, md5, regexp) — no Python UDFs — so the
operators scale linearly with executors and stay inside whole-stage
codegen. Each has an exact ANSI-SQL oracle (queries.py) because the
implementations avoid engine-specific hash functions: fingerprints use
md5 (identical across Spark/DuckDB), not murmur.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small deterministic stopword list (quality scoring + lang heuristic).
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")


def explode_once(
    df: DataFrame,
    keep: list[str],
    arr: Column,
    aliases: list[str],
    pos: bool = False,
) -> DataFrame:
    """explode/posexplode an EXPENSIVE computed array without paying it
    twice — the InferFiltersFromGenerate trap: for a non-outer
    Generate, Catalyst infers ``size(<generator input>) > 0`` and
    predicate pushdown then re-inlines the WHOLE array-building
    expression as a scan-level Filter, so the gram/hash/encode tree
    runs once in the filter (on the scan's split count — one core on a
    single-file input) and again in the project above (measured on
    pq_encode: 2.83 -> 0.29 s warm; the plan grows
    ``Filter (size(transform(...)))`` on the FileScan).

    The *_outer form is exempt from the inference; it emits one
    all-null marker row per empty/null array, which the cheap
    isNotNull on the GENERATOR OUTPUT (not pushable below the
    Generate) removes. With ``pos=True`` the filter runs on the
    POSITION alias (r10 ADVICE #1): the marker row is the only row
    with a NULL position, so the helper is exact even for arrays
    holding legitimately-NULL elements. With ``pos=False`` there is
    no position column, so the value-column filter remains and the
    row set matches the non-outer explode PROVIDED the array has no
    null elements (true for every split/concat/hash-built array in
    this codebase; use pos=True for arrays that can hold nulls)."""
    gen = F.posexplode_outer(arr) if pos else F.explode_outer(arr)
    out = df.select(*keep, gen.alias(*aliases))
    marker = aliases[0] if pos else aliases[-1]
    return out.where(F.col(marker).isNotNull())


def where_once(df: DataFrame, cond: Column) -> DataFrame:
    """``df.where(cond)`` with the predicate PINNED at this point in
    the plan. PushDownPredicates clones a filter condition through
    every deterministic Project and Exchange down to the scan — for an
    expensive condition (a quality-metric struct over the tokenized
    text) that re-sites the whole evaluation into a scan-level Filter,
    BELOW the parallelizing spread exchange: on a single-split input
    the gate then runs on one core. Routing the condition through a
    Generate fences it — a filter on a GENERATOR OUTPUT cannot be
    pushed below the Generate, and the condition itself is evaluated
    exactly once, where this call stands.

    Row-set equality with ``where(cond)``: the marker array has one
    element when cond is TRUE, and is NULL when cond is FALSE or NULL
    — explode_outer emits one row either way, and the isNotNull keeps
    exactly the TRUE rows (SQL filter semantics drop NULL conds)."""
    # helper-column names must not collide with the caller's schema
    # (r10 ADVICE #2): a df already carrying `_w_once`/`_w_keep` would
    # hit an ambiguous-column failure or a wrong drop — suffix until
    # both names are free
    mark, keep_c = "_w_once", "_w_keep"
    while mark in df.columns or keep_c in df.columns:
        mark, keep_c = mark + "_", keep_c + "_"
    marked = df.select(
        df["*"], F.when(cond, F.array(F.lit(True))).alias(mark)
    )
    gen = marked.select(
        marked["*"], F.explode_outer(mark).alias(keep_c)
    )
    return gen.where(F.col(keep_c).isNotNull()).drop(mark, keep_c)


def tokens(col: Column) -> Column:
    """Whitespace tokenization (literal single-space split: the corpus is
    single-space separated; a regex split would also work but ' ' keeps
    the oracle trivially identical)."""
    return F.split(col, " ")


def bind_array(arr: Column, f) -> Column:
    """Evaluate `arr` ONCE per row and hand the materialized value to
    `f` as a lambda variable — the antidote to the HOF-capture
    pitfall: an expression captured in a higher-order-function lambda
    BODY is re-evaluated per element, so e.g.
    ``transform(sequence(...), i -> slice(split(text), i, n))``
    re-splits the whole document for every window — O(len²) per row
    (measured 274 s for ONE 65k-token document in word_ngrams before
    the r9 fix). Lambda variables are evaluated values, so
    ``bind_array(split(text), ws -> transform(..., i -> slice(ws, i,
    n)))`` is linear. The one-element transform wrapper is free —
    Catalyst keeps it a single array allocation per row."""
    return F.element_at(F.transform(F.array(arr), f), 1)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def stopword_count(col: Column) -> Column:
    return F.size(F.filter(tokens(col), lambda w: w.isin(*STOPWORDS_EN)))


def quality_score(col: Column) -> Column:
    """Heuristic quality score in [0,1]: blends length saturation and
    stopword ratio (a proxy for natural-language-ness). Deterministic,
    SQL-expressible."""
    n_tok = token_count(col).cast("double")
    sw_ratio = stopword_count(col).cast("double") / n_tok
    len_sat = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    return F.round((len_sat + sw_ratio) / F.lit(2.0), 6)


def language_id(col: Column) -> Column:
    """N-gram-free language heuristic: share of English stopwords among
    tokens; >= 5% -> 'en' else 'other'. (The corpus carries a ground
    truth `lang` column; this is the operator a pipeline would run when
    it doesn't.)"""
    n_tok = token_count(col).cast("double")
    ratio = stopword_count(col).cast("double") / n_tok
    # NULL text propagates NULL — without the explicit branch the NULL
    # ratio fails the when() and falls into otherwise(), counting
    # missing documents as real 'other'-language documents (every
    # other operator in this file returns NULL for NULL input)
    return F.when(col.isNull(), F.lit(None).cast("string")).when(
        ratio >= 0.05, F.lit("en")
    ).otherwise(F.lit("other"))


# BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def regex_token_count(col: Column) -> Column:
    """Token count under a BPE-style regex tokenization (letters /
    digits / punctuation as separate tokens) — the pre-tokenizer shape
    real BPE vocabularies use."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_REGEX), F.lit(0)))


def rolling_fingerprint(col: Column, n: int = 4) -> Column:
    """Winnowing-style document fingerprint: minimum hash over the
    document's n-word rolling shingles (md5 for cross-engine parity —
    the min over a rolling window of shingle hashes is the standard
    fingerprint selection rule; full winnowing keeps one min per
    window, this keeps the global min as a single-column digest).
    Documents shorter than n words fall back to whole-text md5."""
    def fp(tok: Column) -> Column:
        shingles = F.transform(
            F.sequence(F.lit(0), F.size(tok) - n),
            lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)),
        )
        return F.when(
            F.size(tok) >= n, F.array_min(F.transform(shingles, F.md5))
        ).otherwise(F.md5(col))

    # bind the split once — tok captured in the lambda body would
    # re-split the document per shingle (the HOF-capture pitfall)
    return bind_array(tokens(col), fp)


def doc_fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (lower, trimmed,
    whitespace-collapsed). md5 is identical in Spark and DuckDB, so the
    oracle can reproduce it bit-for-bit — unlike murmur `hash()`."""
    normalized = F.lower(F.trim(F.regexp_replace(col, "\\s+", " ")))
    return F.md5(normalized)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: chars, tokens, avg token length, stopword
    ratio, quality score, fingerprint."""
    c = F.col(text_col)
    n_tok = token_count(c)
    return df.select(
        "doc_id",
        F.length(c).alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        F.round(
            (F.length(c) - n_tok + 1).cast("double") / n_tok.cast("double"), 6
        ).alias("avg_token_len"),
        F.round(stopword_count(c).cast("double") / n_tok.cast("double"), 6).alias(
            "stopword_ratio"
        ),
        quality_score(c).alias("quality"),
        doc_fingerprint(c).alias("fingerprint"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-bounded chunking with overlap — the standard prep step that
    turns variable-length documents into training-window-sized pieces.

    Chunk i covers tokens [i*step, i*step + chunk_tokens) with
    step = chunk_tokens - overlap; the last chunk may be shorter; a
    document shorter than one chunk yields itself. Declarative
    (sequence -> posexplode -> slice -> concat_ws): a narrow 1->N row
    expansion inside codegen, no shuffle, no Python — at 100 TB this is
    a map stage whose output size is input*(1+overlap/step).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    tok = F.col("_tok")
    n = F.size(tok)
    # start offsets: 0, step, 2*step, ... while start < n (and at least
    # one chunk); a start whose window is fully inside the previous
    # chunk (start >= n - overlap, start > 0) adds no new tokens -> cap
    # the range at max(n - overlap - 1, 0).
    starts = F.sequence(
        F.lit(0), F.greatest(n - F.lit(overlap) - 1, F.lit(0)), F.lit(step)
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(tok, s + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
            F.least(n - s, F.lit(chunk_tokens)).alias("n_chunk_tokens"),
        ),
    )
    return explode_once(
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tok")),
        [id_col],
        chunks,
        ["chunk_idx", "_c"],
        pos=True,
    ).select(
        id_col,
        "chunk_idx",
        F.col("_c.n_chunk_tokens").alias("n_chunk_tokens"),
        F.col("_c.chunk_text").alias("chunk_text"),
    )


# PII patterns restricted to the regex subset Java (Spark) and RE2
# (DuckDB) interpret identically: no backrefs, no lookaround. Order is
# most-specific first: emails (may contain digits/dots), then IPv4,
# then the loose phone shape — a phone pattern run earlier would
# swallow IPs (digits + dots satisfy its character class).
PII_PATTERNS = (
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("\\+?[0-9][0-9() .-]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(col: Column) -> Column:
    """Rule-based PII redaction (emails, phone-number shapes, IPv4) —
    the scrubbing pass a training corpus gets before tokenization.
    Chained regexp_replace, all JVM-side; specificity order per
    PII_PATTERNS."""
    out = col
    for pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_pair: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k adjacent-token collocations ranked by the PMI RATIO
    p(w1,w2) / (p(w1) p(w2)) — the corpus-analysis pass that surfaces
    multi-word expressions ("new york", "machine learning") before
    tokenizer training or phrase-aware dedup. The ratio form (not
    log-PMI) is deliberate: every term is an integer count, so the
    score is a pinned sequence of correctly-rounded IEEE ops that a
    SQL oracle reproduces bit-for-bit — ln() is a transcendental whose
    last ulp differs across libm implementations (the same reason
    _hll_estimate skips the linear-counting correction), and
    monotonically it ranks identically anyway.

    Scale shape at 100 TB: the bigram groupBy is THE shuffle (partial
    map-side combine; key space = distinct adjacent pairs), and the
    ``min_pair`` filter runs BEFORE the unigram joins, so the Zipf
    tail of hapax bigrams — the overwhelming majority of the key
    space — never enters an exchange again. Unigram counts join on
    token (equi-join; AQE broadcasts the vocabulary side when it
    fits); totals ride in as a 1-row broadcast. Everything else is a
    narrow transform inside codegen — no UDFs, no corpus re-scan.

    Output: (w1, w2, n_pair, pmi_ratio), ordered by
    (pmi_ratio DESC, w1, w2), exactly k rows (fewer if the corpus has
    fewer qualifying pairs)."""
    ws = tokens(F.col(text_col))
    base = docs.select(ws.alias("ws"))
    # explode_once on both streams: the non-outer explode's inferred
    # size()>0 filter (and the old where(size>=2) guard) re-ran the
    # split at the scan per stream
    uni = (
        explode_once(base, [], F.col("ws"), ["w"])
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_uni"))
    )
    # adjacent pairs via a 1->(n-1) narrow transform; sequence(1, n-1)
    # would DESCEND for 1-token docs (Spark fills in step -1), so the
    # short docs map to NULL (the outer explode's filtered marker row)
    # rather than being pre-filtered
    pairs_all = (
        explode_once(
            base,
            [],
            F.when(
                F.size("ws") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.element_at("ws", i).alias("w1"),
                        F.element_at("ws", i + 1).alias("w2"),
                    ),
                ),
            ),
            ["p"],
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    pairs = pairs_all.where(F.col("n_pair") >= min_pair)
    # the normalizers are DERIVED, not re-scanned: N = sum of the
    # unigram counts (its exchange is reused — plan-verified), and
    # M = total adjacent pairs = N - n_tokenized_docs, exact because a
    # single-space split yields >= 1 token for every NON-NULL text
    # (empty text -> [""]), so sum(len-1) telescopes. NULL-text docs
    # tokenize to NULL — 0 tokens, 0 pairs — so they must not count
    # toward the subtraction: F.count("ws") skips nulls (a bare
    # count(*) would undercount M by one per null doc and silently
    # inflate every ratio — on BOTH engines, so the oracle gate could
    # never catch it). The doc count is a narrow scan of the one
    # split column. Net: the corpus is tokenized exactly twice
    # (unigram pass + bigram pass) — the honest minimum without
    # caching a corpus-sized tokenized frame.
    totals = (
        uni.agg(F.sum("n_uni").alias("_n"))
        .crossJoin(base.agg(F.count("ws").alias("_d")))
        .select(
            F.col("_n").cast("double").alias("n_total"),
            (F.col("_n") - F.col("_d")).cast("double").alias("m_total"),
        )
    )
    scored = (
        pairs.join(
            uni.select(
                F.col("w").alias("w1"), F.col("n_uni").alias("n_w1")
            ),
            "w1",
        )
        .join(
            uni.select(
                F.col("w").alias("w2"), F.col("n_uni").alias("n_w2")
            ),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
    )
    # pinned left-to-right op order — the oracle repeats it verbatim:
    # ((((n_pair * N) / M) / n_w1) * N) / n_w2
    ratio = F.round(
        F.col("n_pair").cast("double")
        * F.col("n_total")
        / F.col("m_total")
        / F.col("n_w1").cast("double")
        * F.col("n_total")
        / F.col("n_w2").cast("double"),
        6,
    )
    return (
        scored.select(
            "w1",
            "w2",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            ratio.alias("pmi_ratio"),
        )
        .orderBy(F.desc("pmi_ratio"), "w1", "w2")
        .limit(k)
    )
