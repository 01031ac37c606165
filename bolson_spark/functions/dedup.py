"""Deduplication operators over the `documents` table.

Scale design (the point of each choice):

- **exact_dedup** — hash-groupBy on a stable digest of normalized text.
  One shuffle on a high-cardinality uniform key (md5) => no skew; at
  100 TB this is the canonical map-side-combine aggregation.
- **minhash_lsh_pairs** — MinHash + banded LSH. Per-doc signature
  computation is a narrow map (no shuffle); candidate generation is a
  self-equi-join on (band_id, band_hash) — an equi-join Spark executes
  as a shuffled hash join on a uniform hash key, NOT an O(n^2) cross
  join. Verification (exact Jaccard) runs only on candidates.
- **ngram_jaccard_pairs** — inverted-index self-join on shingles:
  explode -> join on shingle -> count intersections -> Jaccard. Skew
  guard: drop ultra-frequent shingles (document-frequency cap), the
  standard trick that keeps the join key distribution bounded.
- **simhash64** — 64-bit SimHash from md5-derived per-token bits,
  built entirely from higher-order built-in functions.

Hash choice: md5 (bit-identical in Spark and DuckDB) rather than
murmur `hash()`, so every operator has an exact cross-engine oracle.
MinHash "permutations" are md5(seed || token) lexicographic minima —
a valid universal-hash family for Jaccard estimation and portable SQL.
"""

from __future__ import annotations

import os
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bolson_spark.functions.text import doc_fingerprint, tokens

# LSH parameters: b bands of r rows; candidate probability at Jaccard J
# is 1-(1-J^r)^b with threshold ~ (1/b)^(1/r). The two competing forces:
# RECALL wants more/shorter bands (higher hit probability at the target
# J); SELECTIVITY wants longer bands — on a low-entropy corpus (tiny
# vocabulary) a low-r banding makes buckets collide for thousands of
# docs and the candidate join output goes quadratic. choose_bands picks
# the longest rows-per-band whose candidate recall at the caller's
# threshold still clears MIN_RECALL — maximum selectivity subject to a
# recall floor, which is what survives a 100 TB corpus.
DEFAULT_NUM_HASHES = 16
MIN_RECALL = 0.95


def lsh_candidate_recall(j: float, num_hashes: int, bands: int) -> float:
    """P(candidate) for a pair at Jaccard j under b bands of r rows:
    1-(1-j^r)^b."""
    r = num_hashes // bands
    return 1.0 - (1.0 - j**r) ** bands


def choose_bands(
    num_hashes: int = DEFAULT_NUM_HASHES,
    threshold: float = 0.9,
    min_recall: float = MIN_RECALL,
) -> int:
    """Fewest bands (longest rows-per-band = max selectivity) whose
    candidate recall at `threshold` is >= min_recall. At the defaults
    (16 hashes, J=0.9) this picks b=4/r=4: recall 0.986 vs b=2/r=8's
    0.675 (the round-1 default — a production recall bug for exactly-
    at-threshold pairs)."""
    divisors = [b for b in range(1, num_hashes + 1) if num_hashes % b == 0]
    for b in divisors:  # ascending bands = descending rows-per-band
        if lsh_candidate_recall(threshold, num_hashes, b) >= min_recall:
            return b
    return num_hashes  # r=1: recall is maximal, selectivity minimal


def _spread(df: DataFrame, already_spread: bool = False) -> DataFrame:
    """Repartition to the cluster's parallelism ahead of a CPU-heavy
    narrow map — but ONLY when the input is under-split. File-split
    parallelism tracks *bytes*, but hashing every token of every
    document costs CPU per row — a handful of small input splits would
    serialize the whole stage, so when splits < cores one cheap
    round-robin exchange decouples map parallelism from file layout.
    When splits >= cores (the 100 TB case: thousands of parquet
    row-group splits vs hundreds of cores) the exchange would be a
    full shuffle of the corpus for nothing, so it is skipped.

    `already_spread=True` skips the probe entirely — for callers that
    KNOW their input's parallelism was already set (e.g. the streaming
    near-dup gate, whose micro-batches arrive pre-split by the source):
    the detection below forces full driver-side physical planning,
    which a steady-state per-micro-batch path must not pay.
    """
    if already_spread:
        return df
    n = _spread_partitions(df)
    return df if n == 0 else df.repartition(n)


def _spread_hash(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """_spread's pipeline-ENTRY sibling: when the input is under-split,
    repartition by HASH of the dominant join key instead of
    round-robin. The single exchange then does double duty — it buys
    the narrow stages cluster parallelism AND pre-satisfies every
    downstream equi-join / groupBy on that key at the session's
    shuffle-partition count (their per-side Exchanges vanish), where a
    round-robin spread forces each consumer to re-exchange. Measured
    on the spandedup pipeline boundaries (sf0.1, warm): stage builds
    2.4/3.1 s hash vs 4.3/7.3 s round-robin vs 3.8/3.2 s unspread-
    single-core. Same no-op conditions as _spread: an already-shuffled
    or well-split input (the 100 TB case) passes through untouched."""
    n = _spread_partitions(df)
    return df if n == 0 else df.repartition(n, F.col(key))


# Compressed bytes of under-split input per spread task. Tuned for
# CPU-heavy text work (tokenize + multi-hash per doc), LOCAL-ONLY by
# construction: on a well-split production input (splits >= cores —
# the 100 TB case) the spread is skipped entirely, so this constant
# never shapes a cluster plan. It exists so a TINY input (the twin-SF
# bench runs, unit tests) is not exploded into defaultParallelism
# near-empty partitions whose per-task scheduling dwarfs the work —
# the measured fixed driver term of the sf0.01 twin family.
_SPREAD_TASK_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPREAD_TASK_BYTES", 16 * 1024)
)


def _spread_partitions(df: DataFrame) -> int:
    """Target partition count for an under-split input, or 0 for
    'leave it alone' (already shuffled upstream, or already split at
    least as wide as the cluster). Scale-adaptive in BOTH directions
    (guide §2.4): full defaultParallelism once the input carries
    enough bytes to feed every core, proportionally fewer partitions
    for tiny inputs. Size comes from the optimized plan's stats
    (driver-side, no job; parquet scans report file size, cached
    relations their actual size); sources with unknown stats estimate
    as huge and get full parallelism — the prior behavior."""
    sc = df.sparkSession.sparkContext
    parts = _under_split(df)
    if parts < 0:
        return 0
    size = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    n = max(1, min(sc.defaultParallelism, size // _SPREAD_TASK_BYTES))
    # a spread that does not INCREASE parallelism is a pure cost — a
    # tiny single-split input must pass through, not pay an exchange
    # to its own partition count (repartition(1) also reads as an
    # undocumented SinglePartition to the plan-hygiene sweep).
    # `parts` rides back from _under_split so df.rdd is touched ONCE
    # per probe (r10 VERDICT #5 minor).
    return 0 if n <= parts else n


def _under_split(df: DataFrame) -> int:
    """Current partition count when `df` is under-split, -1 when it
    must be left alone (already shuffled upstream, or split at least
    as wide as the cluster). Returning the count lets the caller skip
    a second `df.rdd` materialization (r10 VERDICT #5 minor)."""
    sc = df.sparkSession.sparkContext
    # An upstream SHUFFLE Exchange means parallelism was already set by
    # spark.sql.shuffle.partitions — and, under AQE, touching df.rdd on
    # a shuffled plan would EXECUTE the query stages just to count
    # partitions. Detection must use executedPlan(): EnsureRequirements
    # inserts Exchange nodes there and NOT into sparkPlan() (verified
    # on this Spark build), and printing the adaptive plan runs zero
    # jobs. BroadcastExchange does NOT count as parallelism — a
    # single-split corpus joined with a broadcast dim is still
    # under-split on the streamed side. The probe forces full driver-
    # side physical planning, so callers that need both token sets and
    # signatures from one input should call _spread ONCE and reuse the
    # result (see _minhash_prep) rather than probing per branch.
    plan = df._jdf.queryExecution().executedPlan().toString()
    # word-boundary node-name match, not a bare substring: 'Exchange'
    # as a standalone node (shuffle) counts; 'BroadcastExchange' /
    # 'BroadcastQueryStage' must not (\bExchange\b cannot match inside
    # BroadcastExchange — 'E' is preceded by a word char). AQE rewrites
    # materialized shuffles into ShuffleQueryStage/AQEShuffleRead nodes.
    if re.search(r"\b(?:Exchange|ShuffleQueryStage|AQEShuffleRead)\b", plan):
        return -1
    parts = df.rdd.getNumPartitions()
    return parts if parts < sc.defaultParallelism else -1


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by normalized-text digest.

    Returns one row per distinct content: (fingerprint, n_copies,
    representative doc_id = min). dropDuplicates-style selection but
    with explicit group stats so the oracle can verify counts.
    """
    return (
        df.select(doc_fingerprint(F.col(text_col)).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("representative"),
        )
    )


def frequency_cap(
    df: DataFrame, text_col: str = "text", k: int = 2
) -> DataFrame:
    """Frequency CAPPING — the soft alternative to exact dedup some
    pretraining recipes use (duplication carries signal up to a point;
    unbounded copies are just over-weighting): keep at most `k` copies
    of each exact-content group, preferring the lowest doc ids.
    ``exact_dedup`` is the k=1 special case with group stats instead
    of surviving rows. Returns (doc_id, fingerprint, copy_rank) for
    the survivors.

    Scale shape: one window partitioned by the content fingerprint —
    hash-partitioned, no global sort; per-group sort is bounded by
    group size, the same envelope every exact-dedup groupBy already
    has."""
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        df.select(
            "doc_id", doc_fingerprint(F.col(text_col)).alias("fingerprint")
        )
        .withColumn("copy_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("copy_rank") <= k)
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """doc_id + minhash signature columns mh0..mh{k-1} (narrow map).

    Carter-Wegman family over a single md5 per distinct token: md5's
    first/second 4 bytes become 32-bit (hi, lo); permutation i is
    min over tokens of (hi + i*lo) mod 2^32. ONE cryptographic hash
    per token (not one per token per permutation — 16× less hashing),
    the rest is integer arithmetic inside whole-stage codegen; the
    identical formula runs in the DuckDB oracle via
    CAST('0x'||substr(md5(w),..) AS BIGINT). No Python anywhere.
    """
    tok = F.array_distinct(tokens(F.col(text_col)))
    md5s = F.transform(tok, lambda w: F.md5(w))
    halves = F.transform(
        md5s,
        lambda m: F.struct(
            F.conv(F.substring(m, 1, 8), 16, 10).cast("bigint").alias("hi"),
            F.conv(F.substring(m, 9, 8), 16, 10).cast("bigint").alias("lo"),
        ),
    )
    base = df.select("doc_id", halves.alias("_halves"))
    cols = [
        F.array_min(
            F.transform(
                F.col("_halves"),
                lambda h: (h["hi"] + F.lit(i) * h["lo"]) % F.lit(1 << 32),
            )
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return base.select("doc_id", *cols)


def band_keys_from_signature(
    sig: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int | None = None,
) -> DataFrame:
    """(doc_id, band, band_key) rows from a minhash signature frame:
    band b's key = md5('|'.join(mh[b*r .. b*r+r-1])). Narrow map +
    posexplode — the bucket join key for LSH candidate generation."""
    bands = choose_bands(num_hashes) if bands is None else bands
    r = num_hashes // bands
    # Band key = first 60 bits of md5 as a BIGINT, not the 32-char hex
    # string: an 8-byte fixed-width join/shuffle key instead of a 32-byte
    # UTF-8 one (same digest family as the oracle, which applies the
    # identical truncation — collision odds unchanged in practice:
    # ~n_docs*bands pairs vs 2^60 keyspace per band).
    keys = F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"mh{b * r + k}").cast("string")
                                for k in range(r)
                            ],
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            for b in range(bands)
        ]
    )
    return sig.select(
        "doc_id", F.posexplode(keys).alias("band", "band_key")
    )


def band_keys_vectorized(
    col: Column,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int | None = None,
) -> Column:
    """Arrow-batched pandas_udf computing the SAME band keys as the
    declarative minhash_signature → band_keys_from_signature path
    (tested equal) — kept as the engine's second physical
    implementation of the minhash operator, mirroring the reference's
    CPU-vs-FPGA dual execution of one logical parse op."""
    import hashlib

    bands = choose_bands(num_hashes) if bands is None else bands
    rows_per_band = num_hashes // bands

    @F.pandas_udf("array<long>")
    def _keys(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            toks = list(dict.fromkeys(text.split(" ")))
            hs = [
                (
                    int.from_bytes(d[:4], "big"),
                    int.from_bytes(d[4:8], "big"),
                )
                for d in (
                    hashlib.md5(w.encode("utf-8")).digest() for w in toks
                )
            ]
            mh = [
                min((hi + i * lo) % (1 << 32) for hi, lo in hs)
                for i in range(num_hashes)
            ]
            out.append(
                [
                    # same 60-bit md5 truncation as the declarative path
                    int(
                        hashlib.md5(
                            "|".join(
                                str(v)
                                for v in mh[
                                    b * rows_per_band : (b + 1) * rows_per_band
                                ]
                            ).encode("utf-8")
                        ).hexdigest()[:15],
                        16,
                    )
                    for b in range(bands)
                ]
            )
        return pd.Series(out)

    return _keys(col)


def _set_fingerprint(col: Column) -> Column:
    """Fingerprint of a document's token SET: md5 over the sorted
    64-bit token hashes — order/multiplicity-free, numeric so no
    delimiter ambiguity. One narrow map. Documents with equal
    fingerprints have identical token sets (J=1 by construction)."""
    return F.md5(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.array_distinct(
                        F.transform(tokens(col), lambda w: F.xxhash64(w))
                    )
                ),
                lambda x: x.cast("string"),
            ),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int | None = None,
    jaccard_threshold: float = 0.9,
    canonicalize: bool = False,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH, then
    verified with exact token-set Jaccard; returns (doc_a, doc_b,
    jaccard) with doc_a < doc_b and jaccard >= threshold.

    bands=None auto-selects the most selective banding whose candidate
    recall at `jaccard_threshold` clears MIN_RECALL (choose_bands);
    pass bands explicitly to pin a different recall/selectivity point.

    canonicalize=True collapses documents with IDENTICAL token sets to
    one representative before the pairwise stage, then expands verified
    pairs back to document pairs with cheap integer joins. MinHash
    depends only on the token set, so identical-set copies share every
    band key: a group of m exact copies inflates every one of its LSH
    buckets m-fold and pays m² array-intersect verifications for pairs
    that are J=1 by construction. Turn it on when the corpus carries
    real exact-duplicate mass (crawls routinely do — the "dedup before
    pairwise" rule); at low multiplicity its extra shuffles cost more
    than they save (this synthetic corpus: 1.27× multiplicity → the
    direct path wins, measured), so the default is off. Output is
    IDENTICAL either way (differential-tested, and both are registry
    queries against the same oracle)."""
    bands = (
        choose_bands(num_hashes, jaccard_threshold) if bands is None else bands
    )
    if not canonicalize:
        return _banded_verified_pairs(
            df, text_col, num_hashes, bands, jaccard_threshold
        )

    # cached for the same three-consumer reason as neardup_components
    sets = df.select(
        "doc_id", _set_fingerprint(F.col(text_col)).alias("set_fp")
    ).cache()
    groups = sets.groupBy("set_fp").agg(F.min("doc_id").alias("rep_id"))
    members = (
        sets.join(groups, "set_fp").select("doc_id", "rep_id").cache()
    )
    rep_docs = df.join(
        groups.select(F.col("rep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    rep_pairs = _banded_verified_pairs(
        rep_docs, text_col, num_hashes, bands, jaccard_threshold
    )
    ma, mb = members.alias("ma"), members.alias("mb")
    cross = (
        rep_pairs.join(ma, rep_pairs.doc_a == F.col("ma.rep_id"))
        .join(mb, rep_pairs.doc_b == F.col("mb.rep_id"))
        .select(
            F.least(F.col("ma.doc_id"), F.col("mb.doc_id")).alias("doc_a"),
            F.greatest(F.col("ma.doc_id"), F.col("mb.doc_id")).alias("doc_b"),
            "jaccard",
        )
    )
    x, y = members.alias("x"), members.alias("y")
    intra = (
        x.join(y, "rep_id")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(intra)


def _banded_verified_pairs(
    df: DataFrame,
    text_col: str,
    num_hashes: int,
    bands: int,
    jaccard_threshold: float,
) -> DataFrame:
    """The banded core: band-key equi-join candidates + exact Jaccard
    verification. Shuffle profile: one equi-join on (band, band_key) +
    one equi-join back to token sets — both hash-partitioned on
    uniform keys; no cross join anywhere. Verification computes
    |A∩B| once and derives the union as |A|+|B|-|A∩B| from
    precomputed set sizes (half the per-pair array work of an
    explicit array_union).
    """
    # Verify on 64-bit token hashes, not strings: |A∩B| and the set
    # sizes only need token IDENTITY, and long-array intersects are
    # several× cheaper than string-array intersects at any scale
    # (8-byte fixed-width comparisons, no UTF-8 walks). xxhash64
    # collisions are ~V²/2⁶⁵ for vocabulary V — immaterial.
    # Band keys computed ONCE per doc in a JVM-side narrow map (one
    # md5 per token + codegen arithmetic — see minhash_signature), then
    # posexploded to (band, band_key) rows for the bucket self-join.
    # Each band row carries the doc's set SIZE so the size-ratio
    # prefilter can run inside the candidate join, before distinct().
    # _minhash_prep caches its shared projection; both frames are
    # narrow views over it — no second per-frame cache needed.
    toksets, band_rows = _minhash_prep(df, text_col, num_hashes, bands)
    return _verified_pairs_prepped(toksets, band_rows, jaccard_threshold)


# Hot-bucket sub-split threshold for the banded LSH candidate
# self-join (guide §2.5 skew): a (band, band_key) equi-join key is ONE
# reduce task — AQE skew handling cannot split a single key — and a
# bucket holding B docs emits ~B²/2 raw pairs inside it. The sf0.1
# probe (scripts/probe_band_buckets.py, table in SCALING.md) measured
# the top-10 buckets owning 96% of all raw pairs (max bucket 2337 docs
# = 5.5M pairs in one task; 23k docs = 273M at 10x dup mass — the
# boilerplate-crawl regime). Buckets above this size are split into
# ceil(B/K) deterministic chunks and the join runs per chunk-PAIR
# cell, bounding any task at ~K² pairs with every pair still seen
# exactly once (result-identical at any K — see _verified_pairs
# _prepped). Env-tunable for cluster sizing; 0 disables.
_LSH_MAX_BUCKET = int(os.environ.get("SPARK_GRAFT_LSH_MAX_BUCKET", 4096))

# The guard's fixed cost is SF-independent — one occupancy aggregate +
# broadcast barrier and two extra generate/key columns, measured 0.4 s
# per query at sf0.1 (interleaved A/B, OPTIMIZATION_r11.md) where the
# worst bucket is only ~0.3 s of single-task work — so it engages only
# when the ESTIMATED band-row bytes (driver-side optimizer stats, no
# job) say the corpus is big enough for a B²/2 bucket to dominate:
# above ~25k docs (1 MB of band rows at the measured ~40 B/row
# estimate) a single hot bucket can exceed tens of seconds of
# single-task work while the guard constant stays sub-second. sf0.1
# estimates 194 KB (guard off, bench comparable — the parameterised-
# conf pattern the round rules prescribe for scale-dependent
# settings); the 10x dup-mass probe estimates 12.4 MB (guard on). At
# 100 TB the guard is always on. 0 = always guard (tests force this
# to pin result-identity and capture the guarded plan).
_LSH_GUARD_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_LSH_GUARD_MIN_BYTES", 1 << 20)
)


def _lsh_guard_engaged(band_rows: DataFrame) -> bool:
    if _LSH_MAX_BUCKET <= 0:
        return False
    if _LSH_GUARD_MIN_BYTES <= 0:
        return True
    est = int(
        band_rows._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    return est >= _LSH_GUARD_MIN_BYTES


def _verified_pairs_prepped(
    toksets: DataFrame,
    band_rows: DataFrame,
    jaccard_threshold: float,
    guard: bool | None = None,
) -> DataFrame:
    """The pair-emitting core over already-prepped `_minhash_prep`
    frames — shared by `_banded_verified_pairs` and the streaming
    gate's in-batch pass (which reuses the micro-batch's own prepped
    frames instead of re-hashing the text).

    ``guard`` selects the hot-bucket sub-split: None (default) probes
    the input size per `_lsh_guard_engaged`; the streaming in-batch
    pass passes False — its input is bounded by the micro-batch
    trigger, and the steady-state per-batch path must not pay a
    driver-side planning probe (the _spread already_spread rationale).
    """
    # Size-ratio prefilter — an EXACT necessary condition, not a
    # heuristic: J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so any pair whose
    # size ratio is below the threshold cannot verify. Two integer
    # comparisons per raw candidate kill ~half the spurious bucket
    # collisions (sf0.1: 6.2M -> 2.9M) before the expensive per-pair
    # array intersects — and before distinct() ever shuffles them.
    #
    # Hot-bucket sub-split (_LSH_MAX_BUCKET, guide §2.5): members of a
    # bucket larger than K get a deterministic chunk id
    # c = pmod(xxhash64(doc_id), m), m = ceil(B/K); the left side
    # replicates each row to cells (c, j) for j in c..m-1, the right
    # side to (i, c) for i in 0..c, and the join adds (_i, _j) to the
    # equi-key. An unordered pair {x, y} with chunks cx <= cy meets in
    # EXACTLY the cell (cx, cy): as l=x,r=y it needs l._i = cx <= cy
    # and r._j = cy >= cx (both true, one j/i value each); as l=y,r=x
    # it needs cy <= cx — only when cx == cy, where both orderings
    # land in the diagonal cell and the (_i == _j) => doc_id< filter
    # keeps one, exactly the old self-join dedup. Off-diagonal cells
    # carry each pair once in arbitrary order, so the emit normalizes
    # with least/greatest before the (multi-band) distinct. Non-hot
    # buckets have m=1: every row sits in cell (0,0) and the plan
    # degenerates to the previous join with two constant key columns.
    # The occupancy aggregate is one extra pass over the fixed-width
    # band rows (map-side combined to distinct buckets); the hot set
    # it broadcasts is bounded by corpus_bytes/K — tiny by
    # construction (stop-phrase analog of the ngram df-cap).
    if guard is None:
        guard = _lsh_guard_engaged(band_rows)
    if guard:
        hot = F.broadcast(
            band_rows.groupBy("band", "band_key")
            .agg(F.count(F.lit(1)).alias("_b"))
            .where(F.col("_b") > _LSH_MAX_BUCKET)
            .select(
                "band",
                "band_key",
                F.ceil(F.col("_b") / _LSH_MAX_BUCKET)
                .cast("int")
                .alias("_m"),
            )
        )
        chunked = (
            band_rows.join(hot, ["band", "band_key"], "left")
            .withColumn("_m", F.coalesce(F.col("_m"), F.lit(1)))
            .withColumn(
                "_c",
                F.pmod(F.xxhash64(F.col("doc_id")), F.col("_m")).cast("int"),
            )
        )
        lhs = chunked.select(
            "doc_id",
            "band",
            "band_key",
            "n_toks",
            F.col("_c").alias("_i"),
            F.explode(
                F.sequence(F.col("_c"), F.col("_m") - 1)
            ).alias("_j"),
        )
        rhs = chunked.select(
            "doc_id",
            "band",
            "band_key",
            "n_toks",
            F.explode(F.sequence(F.lit(0), F.col("_c"))).alias("_i"),
            F.col("_c").alias("_j"),
        )
        join_keys = ["band", "band_key", "_i", "_j"]
        keep_order = (F.col("l.doc_id") != F.col("r.doc_id")) & (
            (F.col("_i") != F.col("_j"))
            | (F.col("l.doc_id") < F.col("r.doc_id"))
        )
    else:
        lhs = rhs = band_rows
        join_keys = ["band", "band_key"]
        keep_order = F.col("l.doc_id") < F.col("r.doc_id")
    # off-diagonal chunk cells carry each pair once in ARBITRARY id
    # order, so the guarded emit normalizes with least/greatest; the
    # unguarded self-join's l < r filter already orders the pair, so
    # its emit stays the plain (l, r) projection (no per-candidate
    # least/greatest work on the unguarded hot path)
    emit = (
        [
            F.least(F.col("l.doc_id"), F.col("r.doc_id")).alias("doc_a"),
            F.greatest(F.col("l.doc_id"), F.col("r.doc_id")).alias("doc_b"),
        ]
        if guard
        else [
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        ]
    )
    cands = (
        lhs.alias("l")
        .join(rhs.alias("r"), join_keys)
        .where(
            keep_order
            & (
                F.least(F.col("l.n_toks"), F.col("r.n_toks"))
                >= jaccard_threshold
                * F.greatest(F.col("l.n_toks"), F.col("r.n_toks"))
            )
        )
        .select(*emit)
        .distinct()
    )

    a = toksets.alias("a")
    b = toksets.alias("b")
    verified = (
        cands.join(a, cands.doc_a == F.col("a.doc_id"))
        .join(b, cands.doc_b == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
            .cast("double")
            .alias("inter"),
            (F.col("a.n_toks") + F.col("b.n_toks")).alias("n_ab"),
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("n_ab") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    jaccard_threshold: float = 0.5,
    max_df: int = 1000,
) -> DataFrame:
    """Exact n-gram (word shingle) Jaccard via inverted-index self-join.

    explode(shingles) -> filter shingles with document frequency >
    max_df (skew guard) -> self-join on shingle -> |intersection| per
    pair -> Jaccard with |A|+|B|-|inter|. Only pairs sharing >= 1
    shingle are ever materialized.
    """
    # The token array is materialized in its own projection first: a
    # free column reference inside a lambda is re-evaluated per
    # element, so leaving `split()` inline would re-tokenize the
    # document once per shingle position. Join key is the 64-bit hash
    # of the shingle, not the string — a fixed-width shuffle key keeps
    # exchange and hash-probe cost flat no matter how long shingles
    # are.
    tok = F.col("_tok")
    shingles = F.when(
        F.size(tok) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(tok) - n),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tok, i + 1, n))),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    sh = (
        _spread(df).select("doc_id", tokens(F.col(text_col)).alias("_tok"))
        .select("doc_id", shingles.alias("sh"))
        # no size(sh)>0 guard: it pushed a second full shingle build
        # into a scan-level Filter (single-core); empty-shingle docs
        # are inert anyway — explode emits nothing for them and their
        # `sizes` rows never match a pair, so the row set of every
        # downstream frame is identical (text.explode_once rationale)
        .cache()
    )
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("sh").alias("shingle")).cache()
    # Skew guard: drop shingles whose document frequency exceeds
    # max_df. Broadcast the FREQUENT set (tiny by construction — stop
    # phrases) and anti-join, never the kept/rare set, which is nearly
    # the whole vocabulary and would be an unbounded broadcast at scale.
    frequent = (
        inv.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .where(F.col("df_count") > max_df)
    )
    inv = inv.join(
        F.broadcast(frequent.select("shingle")), "shingle", "left_anti"
    )
    inter = (
        inv.alias("l")
        .join(inv.alias("r"), "shingle")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("inter")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    containment_threshold: float = 0.8,
    max_df: int = 1000,
) -> DataFrame:
    """Asymmetric near-SUBSET detection (Broder containment): for each
    candidate pair, C = |A∩B| / |inner| where `inner` is the smaller
    shingle set (ties: lower doc_id). Resemblance (Jaccard) misses the
    quote/wrapper-page case — a short doc fully embedded in a long one
    has high containment but low Jaccard, and a dedup pipeline wants
    BOTH signals (drop the contained copy, keep the superset).

    Same inverted-index shape and skew guard as
    :func:`ngram_jaccard_pairs` (equi-join on 64-bit shingle hashes,
    df-capped frequent-shingle anti-join, Theta(sharing pairs) — never
    all-pairs). Theta(sharing pairs) is quadratic in duplicate mass
    (10x exact copies = ~100x co-occurrence pairs; measured 6.4x wall
    at 10x, SCALING.md): on duplicate-heavy corpora run exact /
    identical-set canonicalization first (the
    `q_dedup_minhash_components` move) so containment sees one
    representative per copy group. Output ratios are FIXED-POINT
    micro-units (bigint div): rational ratios rounded as doubles can
    tie at the 6th decimal and diverge 1 ulp between engines.
    """
    tok = F.col("_tok")
    shingles = F.when(
        F.size(tok) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(tok) - n),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tok, i + 1, n))),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    sh = (
        _spread(df)
        .select("doc_id", tokens(F.col(text_col)).alias("_tok"))
        .select("doc_id", shingles.alias("sh"))
        # no size(sh)>0 guard: it pushed a second full shingle build
        # into a scan-level Filter (single-core); empty-shingle docs
        # are inert anyway — explode emits nothing for them and their
        # `sizes` rows never match a pair, so the row set of every
        # downstream frame is identical (text.explode_once rationale)
        .cache()
    )
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("sh").alias("shingle")).cache()
    frequent = (
        inv.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .where(F.col("df_count") > max_df)
    )
    inv = inv.join(
        F.broadcast(frequent.select("shingle")), "shingle", "left_anti"
    )
    inter = (
        inv.alias("l")
        .join(inv.alias("r"), "shingle")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    joined = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            F.col("sa.n_sh").alias("na"),
            F.col("sb.n_sh").alias("nb"),
        )
    )
    a_inner = (F.col("na") < F.col("nb")) | (
        (F.col("na") == F.col("nb")) & (F.col("doc_a") < F.col("doc_b"))
    )
    out = joined.select(
        F.when(a_inner, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
            "inner_doc"
        ),
        F.when(a_inner, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
            "outer_doc"
        ),
        F.expr("CAST((1000000 * inter) div least(na, nb) AS BIGINT)").alias(
            "containment_e6"
        ),
        F.expr(
            "CAST((1000000 * inter) div (na + nb - inter) AS BIGINT)"
        ).alias("jaccard_e6"),
    )
    return out.where(
        F.col("containment_e6") >= int(containment_threshold * 1_000_000)
    )


def canonical_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    containment_threshold: float = 0.8,
    max_df: int = 1000,
) -> DataFrame:
    """Canonicalize-then-contain: collapse EXACT-content copy groups to
    their min-id representative, then run
    :func:`ngram_containment_pairs` over representatives only.

    This is the executable form of the duplicate-mass guidance in
    ngram_containment_pairs' docstring: the pair stage is
    Theta(sharing pairs), so m exact copies of a doc contribute m²
    co-occurrence pairs (measured ~100x pairs / 6.4x wall at 10x
    dup-mass, SCALING.md) — all of them containment=1.0 by
    construction, pure waste. Canonicalizing first makes the pair
    space a function of DISTINCT content only: duplicate mass adds one
    groupBy(text) exchange (linear) and nothing downstream. Output
    rows are representative-id pairs; expanding to member pairs is the
    same cheap integer join minhash_lsh_pairs(canonicalize=True) uses,
    deliberately not done here — a dedup pipeline acts on groups, not
    on m² restatements of the same relation."""
    # ngram_containment_pairs keys on "doc_id" internally
    reps = (
        df.select(id_col, text_col)
        .groupBy(text_col)
        .agg(F.min(id_col).alias("doc_id"))
    )
    return ngram_containment_pairs(
        reps,
        text_col=text_col,
        n=n,
        containment_threshold=containment_threshold,
        max_df=max_df,
    )


def strip_repeated_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 16,
    hash_fn=None,
) -> DataFrame:
    """The REMOVAL step of exact-substring dedup: hash every w-token
    window at STRIDE 1 (removal needs the full grid — a stride on both
    sides misses shifted copies), find windows shared by >= 2 distinct
    documents, keep the minimum-id document's copy, and drop every
    token position covered by a removable window from the others.
    Returns the whole corpus as (doc_id, clean_text, n_removed);
    untouched docs pass through with n_removed=0 (text rebuilt from
    tokens, i.e. whitespace-normalized).

    Scale shape: the window table is O(total tokens) rows of
    (id, start, hash bigint) hashed in the scan — never passage text;
    one groupBy(hash), one equi-join back, one per-doc start-list agg,
    then a narrow HOF map rebuilds the text. Same order as the token
    table itself — the cost any exact-substring dedup pays.

    ``hash_fn`` maps a window-text Column to its hash Column (default:
    60-bit md5 prefix, the cross_doc_passages convention)."""
    from bolson_spark.functions.text import tokens

    if hash_fn is None:
        # 60-bit md5 prefix over the already-md5'd window — the
        # _md5_prefix60 idiom of queries_train (oracle twin:
        # ('0x' || substr(md5(...), 1, 15))::BIGINT)
        def hash_fn(c):
            return F.conv(F.substring(c, 1, 15), 16, 10).cast("bigint")

    # the window stream below runs an md5 per token position — spread
    # an under-split input so both generations run at cluster
    # parallelism (no-op at scale / on shuffled input)
    docs = _spread(df).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_tok")
    )
    tok = F.col("_tok")
    starts = F.sequence(F.lit(0), F.size(tok) - w)
    from bolson_spark.functions.text import explode_once

    # explode_once + when-guard (text.explode_once): the old
    # where(size>=w) + inferred size()>0 filter re-ran the tokenize
    # and the whole md5-window build at the scan, single-core
    wins = explode_once(
        docs,
        ["doc_id"],
        F.when(
            F.size(tok) >= w,
            F.transform(
                starts,
                lambda i: F.struct(
                    i.alias("start"),
                    hash_fn(
                        F.md5(F.concat_ws(" ", F.slice(tok, i + 1, w)))
                    ).alias("h"),
                ),
            ),
        ),
        ["w"],
    ).select(
        "doc_id", F.col("w.start").alias("start"), F.col("w.h").alias("h")
    )
    rep = (
        wins.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )
    removable = (
        wins.join(rep.select("h", "first_doc"), "h")
        .where(F.col("doc_id") != F.col("first_doc"))
        .groupBy("doc_id")
        .agg(F.collect_set("start").alias("_starts"))
    )
    out = docs.join(removable, "doc_id", "left")
    pos = F.sequence(F.lit(0), F.size(tok) - 1)
    kept = F.when(F.col("_starts").isNull(), pos).otherwise(
        F.filter(
            pos,
            lambda p: ~F.exists(
                F.col("_starts"), lambda s: (p >= s) & (p < s + w)
            ),
        )
    )
    return out.select(
        "doc_id",
        F.concat_ws(
            " ", F.transform(kept, lambda p: F.element_at(tok, p + 1))
        ).alias("clean_text"),
        (F.size(tok) - F.size(kept)).cast("bigint").alias("n_removed"),
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    driver_finish_threshold: int = 2_000_000,
) -> DataFrame:
    """Collapse near-duplicate PAIRS into duplicate GROUPS: for every
    node appearing in a pair, its component representative = the
    minimum id reachable through the pair graph. Returns (node,
    representative).

    This is the dedup-to-representatives step SCALING.md prescribes
    instead of materializing quadratic pair lists at 100 TB. Hybrid
    execution, the shape production CC systems use:

    - Pair lists whose symmetrized size (2 x pairs) is at or below
      ``driver_finish_threshold`` (default 2M edges ≈ 32 MB of longs —
      bounded driver memory by construction) finish with a driver-side
      union-find: one Arrow collect of the RAW pair list (union-find
      needs each undirected edge once, so no symmetrize/distinct
      shuffle is ever built on this path), linear work, zero iterative
      jobs. The pair count is known for free — the pair cache is
      materialized by a count() either way.
    - Larger graphs run distributed min-label propagation: each
      iteration is one equi-join (edges ⋈ labels) + a map-side-
      combinable min-aggregate + one pointer jump; near-dup components
      are dense, so the frontier converges in a handful of iterations
      (bounded by graph diameter, checked via a driver-side
      changed-count). localCheckpoint truncates the plan lineage per
      iteration — without it the plan doubles each round.

    Both paths produce identical output (tested equal); pass
    ``driver_finish_threshold=0`` to force the distributed loop.
    """
    e = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).cache()
    n_pairs = e.count()
    # Driver gate on 2*n_pairs (the symmetrized upper bound): union-find
    # consumes each undirected edge ONCE, so the driver path never needs
    # the symmetrize+distinct shuffle the r9 shape paid (a 2x-edge
    # exchange built only to be collected). The distributed loop below
    # still builds real symmetric edges — propagation needs both
    # directions.
    if 2 * n_pairs <= driver_finish_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        # Arrow transfer (toPandas) instead of Row collect: two int64
        # columns, ~16 bytes/edge on the driver rather than per-Row
        # Python objects — the threshold's memory bound stays honest.
        pdf = e.toPandas()
        node_schema = e.select(
            F.col("src").alias("node"),
            F.col("src").alias("representative"),
        ).schema
        e.unpersist()
        srcs, dsts = pdf["src"].tolist(), pdf["dst"].tolist()
        for a, b in zip(srcs, dsts):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN root so find() converges to the
                # component minimum directly
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = sorted(set(srcs) | set(dsts))
        out = pd.DataFrame(
            {"node": nodes, "representative": [find(n) for n in nodes]}
        )
        # pandas -> Arrow createDataFrame (fast path; the session pins
        # arrow.pyspark.enabled) instead of a list-of-tuples, whose
        # per-row verification dominated for 10^5-node graphs.
        return pairs.sparkSession.createDataFrame(out, schema=node_schema)
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .cache()
    )
    edges.count()
    e.unpersist()
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        updated = labels.join(
            nbr_min, labels.node == nbr_min.src, "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce("nbr_min", F.col("label"))
            ).alias("label"),
            (F.coalesce("nbr_min", F.col("label")) < F.col("label")).alias(
                "_changed"
            ),
        )
        # Pointer jumping (path compression): label <- label's label,
        # ONCE per round. Each jump is a self-join that doubles the
        # round's uncheckpointed plan (no exchange reuse — the two
        # sides hash on different keys), so stacking k jumps costs 2^k
        # executions of the round's base plan; one jump still doubles
        # the propagation distance per round → O(log diameter) rounds.
        parent = updated.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        compressed = updated.join(
            parent, updated.label == parent.pnode, "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce("plabel", F.col("label"))
            ).alias("label"),
            "_changed",
        )
        # Lazy checkpoint: the convergence count below is the action
        # that materializes it, so each round runs ONE job (an eager
        # checkpoint would run the plan once for the checkpoint and
        # schedule a second job for the count).
        compressed = compressed.localCheckpoint(eager=False)
        n_changed = compressed.where(F.col("_changed")).count()
        labels = compressed.drop("_changed")
        if n_changed == 0:
            break
    edges.unpersist()
    return labels.select(
        F.col("node"), F.col("label").alias("representative")
    )


def simhash64(col: Column) -> Column:
    """64-bit SimHash of the token set, as a 16-hex-char string.

    Per token, take the first 16 hex chars of md5(token) as 64 bits; for
    each bit position, sum +1/-1 across tokens; the sign vector is the
    SimHash. Built from higher-order functions only (no UDF), in ONE
    pass over the tokens: each token is hashed once (transform), the 64
    per-bit counters are folded in a single ``aggregate`` with an
    array<int> accumulator (``zip_with`` merge), and the final hex is
    derived from the counter array. A naive per-bit formulation (64
    independent aggregates) re-evaluates the md5-per-token subtree 64
    times — O(64·|tokens|) hashes instead of O(|tokens|) — and is
    ~25× slower at any scale.
    """
    tok = F.array_distinct(tokens(col))
    # One md5 per token, split into two 32-bit halves (conv of 8 hex
    # chars; 32-bit values are exact in LongType).
    halves = F.transform(
        F.transform(tok, lambda w: F.md5(w)),
        lambda m: F.struct(
            F.conv(F.substring(m, 1, 8), 16, 10).cast("bigint").alias("hi"),
            F.conv(F.substring(m, 9, 8), 16, 10).cast("bigint").alias("lo"),
        ),
    )

    def bits64(s: Column) -> Column:
        # Bit j (msb-first over the 16-hex prefix): j<32 from hi, else lo.
        return F.array(
            *[
                F.shiftright(s["hi"] if j < 32 else s["lo"], (31 - j) % 32)
                .bitwiseAND(F.lit(1))
                .cast("int")
                for j in range(64)
            ]
        )

    counts = F.aggregate(
        halves,
        F.array_repeat(F.lit(0), 64),
        lambda acc, s: F.zip_with(acc, bits64(s), lambda a, b: a + b * 2 - 1),
    )

    def hex_from_counts(c: Column) -> Column:
        digits = []
        for nibble in range(16):
            val = sum(
                [
                    F.when(
                        F.element_at(c, nibble * 4 + b + 1) > 0,
                        F.lit(1 << (3 - b)),
                    ).otherwise(F.lit(0))
                    for b in range(4)
                ],
                F.lit(0),
            )
            digits.append(F.lower(F.hex(val.cast("bigint"))))
        return F.concat(*digits)

    # Let-binding via single-element transform: `counts` (the expensive
    # fold) is evaluated exactly once, then referenced 64× as a cheap
    # lambda variable while assembling the hex digits.
    return F.element_at(F.transform(F.array(counts), hex_from_counts), 1)


def simhash64_vectorized(col: Column) -> Column:
    """Arrow-batched pandas_udf computing the SAME 64-bit SimHash as
    :func:`simhash64` (identical md5 bit derivation, tested equal).

    Rationale: the md5-per-token fold is inherently per-element work
    that Spark's higher-order functions execute interpreted; hashlib's
    C md5 + numpy unpackbits/popcount run the same computation
    vectorized per Arrow batch. Still a narrow map — scales linearly
    with executors, no shuffle.
    """
    import hashlib

    import numpy as np

    @F.pandas_udf("string")
    def _simhash(texts: pd.Series) -> pd.Series:
        # Per-batch memo of token -> unpacked 64-bit row. Natural text
        # is Zipfian: the same tokens recur across documents, so most
        # lookups hit the cache and the md5 count collapses from
        # sum(doc lengths) to ~|batch vocabulary|.
        bit_cache: dict[str, np.ndarray] = {}

        def tok_bits(t: str) -> np.ndarray:
            b = bit_cache.get(t)
            if b is None:
                b = np.unpackbits(
                    np.frombuffer(
                        hashlib.md5(t.encode("utf-8")).digest()[:8],
                        dtype=np.uint8,
                    )
                )
                bit_cache[t] = b
            return b

        out = []
        for text in texts:
            # Matches F.split(col, " ") (Java limit=-1: empties kept)
            # + array_distinct; summation order is immaterial.
            toks = list(dict.fromkeys(text.split(" ")))
            bits = np.stack([tok_bits(t) for t in toks])  # (ntok, 64)
            counts = bits.sum(axis=0, dtype=np.int64) * 2 - len(toks)
            out.append(
                np.packbits((counts > 0).astype(np.uint8)).tobytes().hex()
            )
        return pd.Series(out)

    return _simhash(col)


def incremental_minhash_dedup(
    corpus: DataFrame,
    delta: DataFrame,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int | None = None,
    jaccard_threshold: float = 0.9,
) -> DataFrame:
    """Near-duplicate INGEST GATE: probe a DELTA batch against the
    CORPUS's MinHash band index — the incremental companion of
    :func:`minhash_lsh_pairs` (all-pairs within one corpus) and of
    ``corpus.incremental_ingest`` (exact fingerprints only). This is
    how a production crawl re-ingest runs: the existing corpus's band
    rows are a persisted index; each new batch computes its own band
    keys and equi-joins against the index, so work is
    O(|delta| + matched buckets), never all-pairs and never a rescan
    of the corpus text (only candidate corpus docs' token sets are
    fetched for verification via an equi-join).

    Returns one row per delta document:
    (doc_id, accepted, dup_of, jaccard) — accepted=false when some
    corpus document verifies at true Jaccard >= `jaccard_threshold`;
    dup_of is the best-matching corpus doc (ties: lowest id), null
    when accepted.

    Same candidate recall, size-ratio prefilter, and exact
    verification as the all-pairs operator; the DuckDB oracle mirrors
    the banded probe in lock-step.
    """
    bands = (
        choose_bands(num_hashes, jaccard_threshold) if bands is None else bands
    )
    c_toks, c_bands = _minhash_prep(corpus, text_col, num_hashes, bands)
    d_toks, d_bands = _minhash_prep(delta, text_col, num_hashes, bands)
    return _minhash_probe_gate(
        c_toks, c_bands, d_toks, d_bands, delta, jaccard_threshold
    )


def _minhash_prep(
    df: DataFrame,
    text_col: str,
    num_hashes: int,
    bands: int,
    already_spread: bool = False,
    cache: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(toksets, band_rows) for the banded probe: hashed distinct token
    arrays with sizes, and (doc_id, band, band_key, n_toks) rows.

    Both frames are narrow views over ONE shared projection
    (doc_id, toks, n_toks, band-key array): the text is tokenized and
    hashed once, and n_toks rides along instead of being attached to
    the band rows with a doc_id equi-join (the pre-r10 shape paid a
    second full text pass for the signature AND a join — broadcast at
    small SF, but a corpus-sized SMJ at 100 TB). With ``cache=True``
    the projection is persisted — the same in-query stage-boundary
    cache the callers used to place on the two derived frames, now one
    copy instead of two. The streaming gate passes ``cache=False``: its
    per-micro-batch cache list must own every persisted frame
    (unpersisted at batch end), and its frames derive from the already-
    cached delta."""
    sdf = _spread(df, already_spread)  # probe once, reuse for both branches
    # distinct WORDS first, then both hash families over that array:
    # dedup-then-hash keeps md5/xxhash64 to one call per distinct token.
    # toks = distinct(xxhash64 over distinct words) is element- and
    # ORDER-identical to the old distinct(xxhash64 over all words):
    # equal words hash equal (inner distinct removes only rows the
    # outer distinct would), and first-occurrence order is preserved.
    # Both projections are SQL TEXT parsed in one call each (r11,
    # completing the r10 one-parse sweep for this function): the
    # Column-API lambda chain spent ~0.1 s of py4j round trips per
    # prep call — an SF-independent driver constant paid by every
    # minhash query and streaming micro-batch. The nested
    # transform(transform(_w, md5), ...) keeps ONE md5 per token,
    # same tree as the Column form; `words` stays its own projection
    # so CollapseProject cannot inline the double use of _w into two
    # tokenize passes.
    words = sdf.selectExpr(
        "doc_id", f"array_distinct(split({text_col}, ' ')) AS _w"
    )
    staged = words.selectExpr(
        "doc_id",
        "array_distinct(transform(_w, w -> xxhash64(w))) AS toks",
        "transform(transform(_w, w -> md5(w)),"
        " m -> named_struct("
        "'hi', cast(conv(substring(m, 1, 8), 16, 10) as bigint),"
        " 'lo', cast(conv(substring(m, 9, 8), 16, 10) as bigint)"
        ")) AS _halves",
    )
    # identical Carter-Wegman arithmetic to minhash_signature (kept as
    # its own projection so CollapseProject cannot inline the 16-way
    # reuse of _halves back into per-permutation md5 recomputation).
    # The permutation fold and the band keys are built as SQL TEXT and
    # parsed in ONE selectExpr call each: the Column-API form spent
    # ~0.9 s of py4j round trips PER PREP CALL on the 16 transform
    # lambdas + band md5 chains (measured; an SF-independent driver
    # constant paid by every minhash query and every streaming micro-
    # batch — the bpe_encode/_merge_pair_sql pattern). 4294967296 is
    # 1 << 32 as a BIGINT literal; explicit parens keep the SQL
    # precedence identical to the Column form (+ binds before %).
    sig = staged.selectExpr(
        "doc_id",
        "toks",
        *[
            f"array_min(transform(_halves,"
            f" h -> (h.hi + {i} * h.lo) % 4294967296)) AS mh{i}"
            for i in range(num_hashes)
        ],
    )
    # identical 60-bit truncated-md5 band keys to band_keys_from_signature
    r = num_hashes // bands
    band_exprs = ", ".join(
        "cast(conv(substring(md5(concat_ws('|', {cols})), 1, 15), 16, 10)"
        " as bigint)".format(
            cols=", ".join(
                f"cast(mh{b * r + k} as string)" for k in range(r)
            )
        )
        for b in range(bands)
    )
    prepped = sig.selectExpr(
        "doc_id", "toks", "size(toks) AS n_toks", f"array({band_exprs}) AS _keys"
    )
    if cache:
        prepped = prepped.cache()
    toksets = prepped.select("doc_id", "toks", "n_toks")
    band_rows = prepped.select(
        "doc_id", F.posexplode("_keys").alias("band", "band_key"), "n_toks"
    )
    return toksets, band_rows


def _minhash_probe_gate(
    c_toks: DataFrame,
    c_bands: DataFrame,
    d_toks: DataFrame,
    d_bands: DataFrame,
    delta: DataFrame,
    jaccard_threshold: float,
) -> DataFrame:
    """The asymmetric banded probe shared by the inline gate and the
    persisted-index gate: candidates via (band, band_key) equi-join
    with the exact size-ratio prefilter, exact Jaccard verification,
    lowest-id best-match, one output row per delta document."""
    from pyspark.sql.window import Window

    cands = (
        d_bands.alias("d")
        .join(c_bands.alias("c"), ["band", "band_key"])
        .where(
            F.least(F.col("d.n_toks"), F.col("c.n_toks"))
            >= jaccard_threshold
            * F.greatest(F.col("d.n_toks"), F.col("c.n_toks"))
        )
        .select(
            F.col("d.doc_id").alias("delta_id"),
            F.col("c.doc_id").alias("corpus_id"),
        )
        .distinct()
    )
    dt, ct = d_toks.alias("dt"), c_toks.alias("ct")
    verified = (
        cands.join(dt, cands.delta_id == F.col("dt.doc_id"))
        .join(ct, cands.corpus_id == F.col("ct.doc_id"))
        .select(
            "delta_id",
            "corpus_id",
            F.size(F.array_intersect(F.col("dt.toks"), F.col("ct.toks")))
            .cast("double")
            .alias("inter"),
            (F.col("dt.n_toks") + F.col("ct.n_toks")).alias("n_ab"),
        )
        .select(
            "delta_id",
            "corpus_id",
            (F.col("inter") / (F.col("n_ab") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select(
            "delta_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")
        )
    )
    w = Window.partitionBy("delta_id").orderBy(
        F.col("jaccard").desc(), F.col("corpus_id").asc()
    )
    best = (
        verified.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .withColumnRenamed("delta_id", "doc_id")
    )
    return (
        delta.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.col("corpus_id").isNull().alias("accepted"),
            F.col("corpus_id").alias("dup_of"),
            "jaccard",
        )
    )


def save_minhash_index(
    corpus: DataFrame,
    name: str,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int | None = None,
    jaccard_threshold: float = 0.9,
    buckets: int = 16,
) -> None:
    """Persist the corpus's MinHash probe index as two BUCKETED tables
    (the near-dup analog of similarity.save_ivf_index):

    - ``<name>_bands`` bucketed+sorted by ``band_key`` — the probe
      join key, so `probe_minhash_index` joins the (huge) index WITHOUT
      shuffling it: the bucketed scan's hash distribution on band_key
      satisfies the (band, band_key) clustering requirement, and only
      the (small) delta side exchanges;
    - ``<name>_toks`` bucketed+sorted by ``doc_id`` — the verification
      join key, same property for the token-set fetch.

    At 100 TB the index is built ONCE per corpus snapshot and every
    ingest batch probes it; re-deriving band rows per batch would be a
    full corpus rescan per batch.

    Catalog note: bucketing metadata lives in the session catalog, so
    cross-process reuse needs a persistent metastore (Hive/Glue/Unity —
    standard on a real cluster). The parquet files themselves are
    plain; `streaming/ingest.py` uses the directory-based variant of
    the same index for its checkpoint-friendly accumulation.
    """
    bands = (
        choose_bands(num_hashes, jaccard_threshold) if bands is None else bands
    )
    toksets, band_rows = _minhash_prep(corpus, text_col, num_hashes, bands)
    (
        band_rows.write.bucketBy(buckets, "band_key")
        .sortBy("band_key")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{name}_bands")
    )
    (
        toksets.write.bucketBy(buckets, "doc_id")
        .sortBy("doc_id")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{name}_toks")
    )
    # persist the signature parameters: a probe computed with different
    # num_hashes/bands would produce band keys that never match —
    # silently accepting every near-dup — so the probe reads these back
    corpus.sparkSession.createDataFrame(
        [(int(num_hashes), int(bands))], "num_hashes int, bands int"
    ).write.mode("overwrite").format("parquet").saveAsTable(f"{name}_meta")


def probe_minhash_index(
    spark,
    name: str,
    delta: DataFrame,
    text_col: str = "text",
    num_hashes: int | None = None,
    bands: int | None = None,
    jaccard_threshold: float = 0.9,
) -> DataFrame:
    """Gate a delta batch against a PERSISTED MinHash index written by
    :func:`save_minhash_index` — identical output to
    :func:`incremental_minhash_dedup` (tested equal), but the corpus is
    never rescanned: band rows and token sets come from the bucketed
    index tables, and the probe/verify joins leave the index side
    exchange-free."""
    # The index's signature parameters are authoritative: band keys
    # from mismatched num_hashes/bands would never equi-match and every
    # near-dup would silently pass. ANY explicitly-passed value that
    # conflicts with the meta is an error (num_hashes=None is the
    # unambiguous 'unspecified' sentinel — an explicit num_hashes=16
    # against an index built with 32 errors rather than being silently
    # overridden); a meta-less (pre-meta) index falls back to the
    # caller's parameters with a logged warning, since a wrong guess
    # there silently accepts every near-dup.
    try:
        meta = spark.table(f"{name}_meta").first()
    except Exception:  # noqa: BLE001 — pre-meta index, trust the caller
        meta = None
    if meta is not None:
        if num_hashes is not None and num_hashes != meta["num_hashes"]:
            raise ValueError(
                f"index {name!r} was built with num_hashes="
                f"{meta['num_hashes']}, probe requested {num_hashes}"
            )
        if bands is not None and bands != meta["bands"]:
            raise ValueError(
                f"index {name!r} was built with bands={meta['bands']}, "
                f"probe requested {bands}"
            )
        num_hashes, bands = meta["num_hashes"], meta["bands"]
    else:
        import warnings

        if num_hashes is None:
            num_hashes = DEFAULT_NUM_HASHES
        # resolve bands BEFORE formatting the warning: an unspecified
        # bands would otherwise report 'bands=None' instead of the
        # band count the probe actually uses
        if bands is None:
            bands = choose_bands(num_hashes, jaccard_threshold)
        warnings.warn(
            f"index {name!r} has no _meta table; trusting caller "
            f"parameters (num_hashes={num_hashes}, bands={bands}) — a "
            "mismatch with the build parameters silently accepts every "
            "near-dup",
            stacklevel=2,
        )
    c_bands = spark.table(f"{name}_bands")
    c_toks = spark.table(f"{name}_toks")
    d_toks, d_bands = _minhash_prep(delta, text_col, num_hashes, bands)
    return _minhash_probe_gate(
        c_toks, c_bands, d_toks, d_bands, delta, jaccard_threshold
    )


def neardup_components(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int | None = None,
    jaccard_threshold: float = 0.9,
) -> DataFrame:
    """(id, representative) for every document in a near-duplicate
    group — the mapping a 100 TB dedup stage ships (one keeper per
    group). Factored out of the `dedup_minhash_components` registry
    query so pipeline compositions (training_corpus_neardup) run the
    SAME rep-level optimization: exact-copy groups (identical token
    sets) contribute MEMBERSHIP, not clique edges, so the banded LSH
    join and the iterative component propagation run on the
    exact-group REPRESENTATIVE graph only; group members expand back
    with integer joins afterwards. Component representative = min id
    (equals min rep id because every group rep IS its group's min).

    Docs in no group (no exact twin, no verified near-dup pair) are
    absent from the output — they represent themselves.

    The rep-level `members` frame is persisted for its two consumers
    (component expansion + isolated-multi groups) and stays pinned for
    the life of the returned frame — a DELIBERATE stage-boundary cache
    (the training_corpus s3 convention), not releasable inside the
    call because the corpus-sized result must keep referencing it
    (contrast hll_union/heavy_hitters, whose bounded aggregates could
    be materialized to release theirs). Reference anchor: the
    reference dedups exact
    payloads only (seq-keyed publish, src/bolson/convert/converter.cpp);
    near-dup grouping is the LLM-pipeline extension over it."""
    from pyspark.sql import functions as F

    # cache the (id, set_fp) frame: it feeds groups, the membership
    # join AND (via groups) the rep-doc semi-join — uncached, the
    # full tokenize+hash+sort fingerprint pass runs three times
    sets = docs.select(
        id_col, _set_fingerprint(F.col(text_col)).alias("set_fp")
    ).cache()
    groups = sets.groupBy("set_fp").agg(
        F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("m")
    )
    # two consumers (component expansion + isolated-multi groups) —
    # cached exactly as the original registry query did
    members = sets.join(groups, "set_fp").select(id_col, "rep_id").cache()
    rep_docs = docs.join(
        groups.select(F.col("rep_id").alias(id_col)), id_col, "left_semi"
    )
    rep_pairs = _banded_verified_pairs(
        rep_docs,
        text_col,
        num_hashes,
        bands if bands is not None else choose_bands(
            num_hashes, jaccard_threshold
        ),
        jaccard_threshold,
    )
    cc = connected_components(rep_pairs, "doc_a", "doc_b")
    part1 = members.join(cc, members.rep_id == cc.node).select(
        id_col, "representative"
    )
    iso_multi = (
        groups.where(F.col("m") >= 2)
        .join(cc, groups.rep_id == cc.node, "left_anti")
        .select("rep_id")
    )
    part2 = members.join(iso_multi, "rep_id").select(
        id_col, F.col("rep_id").alias("representative")
    )
    return part1.unionByName(part2)
