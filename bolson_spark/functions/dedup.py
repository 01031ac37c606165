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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bolson_spark.functions.text import doc_fingerprint, tokens

# LSH parameters: b bands of r rows; candidate probability at Jaccard J
# is 1-(1-J^r)^b with threshold ~ (1/b)^(1/r). r=4, b=4 puts the knee at
# ~0.71 — right for near-dup detection at J>=0.8 while suppressing the
# candidate blowup a low-r configuration suffers on low-entropy corpora
# (a tiny vocabulary makes 2-row bands collide for thousands of docs).
DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4  # rows-per-band = num_hashes / bands = 4


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


def _minhash_one(tok: Column, seed: int) -> Column:
    """One MinHash 'permutation': lexicographic min over tokens of
    md5(seed || token). Hex-string min is a total order identical in
    every engine."""
    return F.array_min(F.transform(tok, lambda w: F.md5(F.concat(F.lit(f"s{seed}:"), w))))


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """doc_id + minhash signature columns mh0..mh{k-1} (narrow map)."""
    tok = F.array_distinct(tokens(F.col(text_col)))
    cols = [_minhash_one(tok, i).alias(f"mh{i}") for i in range(num_hashes)]
    return df.select("doc_id", *cols)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH, then
    verified with exact token-set Jaccard; returns (doc_a, doc_b,
    jaccard) with doc_a < doc_b and jaccard >= threshold.

    Shuffle profile: one equi-join on (band, band_key) + one equi-join
    back to token sets for verification — both hash-partitioned on
    uniform keys; no cross join anywhere.
    """
    rows_per_band = num_hashes // bands
    # Compute each signature ONCE; emit (band, band_key) rows by
    # exploding an array of structs (a unionAll of per-band projections
    # would re-evaluate the minhash subtree once per band, and the
    # self-join would double that again).
    sigs = minhash_signature(df, text_col, num_hashes)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    band_rows = (
        sigs.select("doc_id", F.explode(band_structs).alias("bk"))
        .select("doc_id", "bk.band", "bk.band_key")
        .cache()
    )

    cands = (
        band_rows.alias("l")
        .join(band_rows.alias("r"), ["band", "band_key"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )

    toksets = df.select(
        "doc_id", F.array_distinct(tokens(F.col(text_col))).alias("toks")
    ).cache()
    a = toksets.alias("a")
    b = toksets.alias("b")
    verified = (
        cands.join(a, cands.doc_a == F.col("a.doc_id"))
        .join(b, cands.doc_b == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks"))).cast(
                    "double"
                )
                / F.size(F.array_union(F.col("a.toks"), F.col("b.toks"))).cast(
                    "double"
                )
            ).alias("jaccard"),
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
    tok = tokens(F.col(text_col))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(tok) - n),
            lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)),
        )
    )
    sh = df.select("doc_id", shingles.alias("sh")).where(F.size("sh") > 0).cache()
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("sh").alias("shingle")).cache()
    rare = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_count")).where(
        F.col("df_count") <= max_df
    )
    inv = inv.join(F.broadcast(rare.select("shingle")), "shingle")
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


def simhash64(col: Column) -> Column:
    """64-bit SimHash of the token set, as a 16-hex-char string.

    Per token, take the first 16 hex chars of md5(token) as 64 bits; for
    each bit position, sum +1/-1 across tokens; the sign vector is the
    SimHash. Built from higher-order functions only (no UDF): for each
    of 16 hex digits, sum the 4-bit patterns and emit the majority hex
    digit.
    """
    tok = F.array_distinct(tokens(col))
    # Per token, nibble i (1-based) of md5 hex; bit b of that nibble via
    # shiftright/&. Sum of (2*bit - 1) across tokens; sign -> bit.
    nibbles = F.transform(
        tok,
        lambda w: F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: F.conv(F.substring(F.md5(w), 1, 16).substr(i, F.lit(1)), 16, 10).cast("int"),
        ),
    )

    def bit_sum(nibble_idx: int, bit: int) -> Column:
        # sum over tokens of +1/-1 for bit `bit` (msb=3) of nibble
        return F.aggregate(
            nibbles,
            F.lit(0),
            lambda acc, nb: acc
            + (
                F.shiftright(F.element_at(nb, nibble_idx + 1), 3 - bit).bitwiseAND(
                    F.lit(1)
                )
                * 2
                - 1
            ),
        )

    hex_digits = []
    for nibble in range(16):
        val = sum(
            [
                F.when(bit_sum(nibble, b) > 0, F.lit(1 << (3 - b))).otherwise(F.lit(0))
                for b in range(4)
            ],
            F.lit(0),
        )
        hex_digits.append(F.lower(F.hex(val.cast("bigint"))))
    return F.concat(*hex_digits)
