"""Training-data-pipeline registry queries (round 2 widening): Gopher-
style quality filtering, deterministic stratified sampling, and
embedding quantization (int8 scalar + product quantization with ADC
kNN). Merged into ``QUERIES`` by queries.py; every entry carries an
exact DuckDB oracle.

Oracle technique for the quantization family: like `ivf_assign`
(queries.py), the "trained" artifacts (PQ codebooks) are derived
deterministically FROM THE DATA (subvectors of the first-k vectors) so
the oracle can re-derive them in pure SQL — the learned-artifact path
(Lloyd's refinement) is covered separately by `pq_train`'s pytest
equality against its own seeded fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bolson_spark.functions.quality import (
    quality_metrics,
    stratified_sample,
)
from bolson_spark.queries import QuerySpec, _t

# ---------------------------------------------------------------------------
# Gopher-style quality filter
# ---------------------------------------------------------------------------


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based corpus filter: per-doc scalar metrics in one narrow
    codegen map + top-bigram repetition via explode/two-level agg."""
    docs = _t(spark, sf_dir, "documents")
    return quality_metrics(docs)


# Both engines: words = whitespace split with empties dropped; all
# float metrics rounded to 6.
_W = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"

O_GOPHER_QUALITY = f"""
WITH w AS (
  SELECT doc_id, text, {_W} AS words FROM documents
),
scalar AS (
  SELECT doc_id,
         len(words) AS n_words,
         ROUND(list_aggregate(list_transform(words, x -> CAST(len(x) AS DOUBLE)), 'sum')
               / len(words), 6) AS mean_word_len,
         ROUND(CAST(len(list_distinct(words)) AS DOUBLE) / len(words), 6)
           AS unique_word_frac,
         ROUND(CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
               / len(words), 6) AS alpha_word_frac,
         ROUND((CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE)
                + (len(text) - len(replace(text, '...', ''))) / 3.0)
               / len(words), 6) AS symbol_word_ratio
  FROM w
),
bg AS (
  SELECT doc_id,
         UNNEST(list_transform(
           range(1, len(words)),
           i -> words[i] || ' ' || words[i + 1])) AS bigram
  FROM w
),
counts AS (
  SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram
),
top AS (
  SELECT doc_id,
         ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_bigram_frac
  FROM counts GROUP BY doc_id
)
SELECT s.doc_id, s.n_words, s.mean_word_len, s.unique_word_frac,
       s.alpha_word_frac, s.symbol_word_ratio, t.top_bigram_frac,
       (s.n_words BETWEEN 20 AND 100000
        AND s.mean_word_len BETWEEN 2.0 AND 12.0
        AND s.alpha_word_frac >= 0.8
        AND s.symbol_word_ratio <= 0.1
        AND s.unique_word_frac >= 0.2
        AND COALESCE(t.top_bigram_frac, 0.0) <= 0.20) AS keep
FROM scalar s LEFT JOIN top t USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

_STRATA = {"en": 0.5, "de": 1.0, "fr": 1.0, "es": 0.25, "zh": 0.25}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language rebalancing sample (downsample the dominant
    stratum) — deterministic md5 buckets, reproducible on any cluster
    size and in the oracle."""
    docs = _t(spark, sf_dir, "documents")
    out = stratified_sample(docs, "lang", _STRATA, id_col="doc_id")
    return out.select("doc_id", "lang", "source")


def _strat_sql() -> str:
    from bolson_spark.functions.quality import fraction_hex_threshold

    cases = " ".join(
        "WHEN lang = '%s' THEN %s"
        % (
            k,
            "TRUE"
            if v >= 1.0
            else "substring(md5('strat' || '|' || CAST(doc_id AS VARCHAR)), 1, 8)"
            " < '%s'" % fraction_hex_threshold(v),
        )
        for k, v in _STRATA.items()
    )
    return f"""
SELECT doc_id, lang, source FROM documents
WHERE (CASE {cases} ELSE FALSE END)
"""


O_STRATIFIED_SAMPLE = _strat_sql()


# ---------------------------------------------------------------------------
# Embedding quantization: int8 scalar quantization
# ---------------------------------------------------------------------------


def q_sq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of embeddings (4x memory reduction for
    the 100 TB ANN index): per-vector scale = max(|x|)/127, code_i =
    floor(x_i/scale + 0.5). One narrow codegen map; floor(x+0.5)
    instead of round() so Spark and DuckDB agree on halfway cases."""
    from bolson_spark.functions.similarity import sq_encode

    emb = _t(spark, sf_dir, "embeddings")
    # Registry outputs must be scalar columns (driver canonicalizer
    # cannot hash array cells) — explode the code vector to
    # (vec_id, dim_idx, code) rows. sq_encode() itself keeps the
    # array-valued API for programmatic use.
    codes = sq_encode(emb)
    return codes.select(
        "vec_id",
        "sq_scale",
        F.posexplode("sq_codes").alias("dim_idx", "code"),
    )


O_SQ_ENCODE = """
WITH s AS (
  SELECT vec_id,
         list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max')
           / 127.0 AS scale,
         embedding
  FROM embeddings
)
SELECT vec_id,
       ROUND(scale, 6) AS sq_scale,
       CAST(i AS INT) AS dim_idx,
       CAST(floor(CAST(embedding[i + 1] AS DOUBLE) / scale + 0.5) AS BIGINT)
         AS code
FROM s, LATERAL unnest(range(len(embedding))) AS t(i)
"""


# ---------------------------------------------------------------------------
# Product quantization (PQ): encode + ADC kNN
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces (64-dim embeddings -> 8 dims per subspace)
PQ_K = 16  # codes per subspace
PQ_DSUB = 8


def _pq_codebooks(spark: SparkSession, sf_dir: str):
    """Deterministic data-derived codebooks: codebook[j] = the j-th
    subvectors of vectors vec_id < PQ_K (same technique as
    `ivf_assign`'s data-derived centroids, so the oracle can re-derive
    them in SQL)."""
    emb = _t(spark, sf_dir, "embeddings")
    rows = (
        emb.where(F.col("vec_id") < PQ_K)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    # codebooks[j][c] = list of PQ_DSUB floats
    return [
        [
            [float(v) for v in r.embedding[j * PQ_DSUB:(j + 1) * PQ_DSUB]]
            for r in rows
        ]
        for j in range(PQ_M)
    ]


def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bolson_spark.functions.similarity import pq_encode

    emb = _t(spark, sf_dir, "embeddings")
    # Scalar-column output shape (see q_sq_encode): one row per
    # (vector, subspace) with its selected code.
    codes = pq_encode(emb, _pq_codebooks(spark, sf_dir))
    return codes.select(
        "vec_id", F.posexplode("pq_codes").alias("subspace", "code")
    )


def _pq_encode_sql() -> str:
    return f"""
WITH cb AS (  -- codebook: (subspace j, code c, centroid subvector)
  SELECT j.j, e.vec_id AS c,
         e.embedding[j.j * {PQ_DSUB} + 1 : (j.j + 1) * {PQ_DSUB}] AS cent
  FROM embeddings e, (SELECT UNNEST(range({PQ_M})) AS j) j
  WHERE e.vec_id < {PQ_K}
),
sub AS (      -- every (vector, subspace) subvector
  SELECT e.vec_id, j.j,
         e.embedding[j.j * {PQ_DSUB} + 1 : (j.j + 1) * {PQ_DSUB}] AS sv
  FROM embeddings e, (SELECT UNNEST(range({PQ_M})) AS j) j
),
dist AS (
  SELECT s.vec_id, s.j, cb.c,
         list_aggregate(
           list_transform(
             list_zip(s.sv, cb.cent),
             p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                  * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
           'sum') AS d2
  FROM sub s JOIN cb ON s.j = cb.j
),
best AS (
  SELECT vec_id, j, c
  FROM dist
  QUALIFY row_number() OVER (
    PARTITION BY vec_id, j ORDER BY d2 ASC, c ASC) = 1
)
SELECT vec_id, CAST(j AS INT) AS subspace, CAST(c AS INT) AS code
FROM best
"""


O_PQ_ENCODE = _pq_encode_sql()


def q_pq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN by asymmetric distance computation: the query
    builds an m x k lookup table of subspace distances once
    (driver-side, tiny), each encoded vector's distance is m table
    lookups — the FAISS IVFADC scan pattern, here as a pure codegen
    expression over the broadcast LUT."""
    from bolson_spark.functions.similarity import pq_adc_knn, pq_encode

    emb = _t(spark, sf_dir, "embeddings")
    books = _pq_codebooks(spark, sf_dir)
    qv = [
        float(v)
        for v in emb.where(F.col("vec_id") == 0).select("embedding")
        .collect()[0].embedding
    ]
    codes = pq_encode(emb, books)
    return pq_adc_knn(codes, books, qv, k=10)


def _pq_adc_sql() -> str:
    return f"""
WITH enc AS ({_pq_encode_sql()}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
lut AS (    -- LUT[j][c] = ||q_sub_j - codebook[j][c]||^2
  SELECT j.j, e.vec_id AS c,
         list_aggregate(
           list_transform(
             list_zip(q.qv[j.j * {PQ_DSUB} + 1 : (j.j + 1) * {PQ_DSUB}],
                      e.embedding[j.j * {PQ_DSUB} + 1 : (j.j + 1) * {PQ_DSUB}]),
             p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                  * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
           'sum') AS d2
  FROM embeddings e, (SELECT UNNEST(range({PQ_M})) AS j) j, q
  WHERE e.vec_id < {PQ_K}
),
codes AS (  -- encode SQL already emits one (vec_id, subspace, code) row
  SELECT vec_id, code, subspace AS j
  FROM enc
),
scored AS (
  SELECT codes.vec_id, SUM(lut.d2) AS adc
  FROM codes JOIN lut ON lut.j = codes.j AND lut.c = codes.code
  GROUP BY codes.vec_id
)
SELECT vec_id, ROUND(adc, 6) AS adc_dist
FROM scored
ORDER BY adc_dist ASC, vec_id ASC
LIMIT 10
"""


O_PQ_ADC_KNN = _pq_adc_sql()


TRAIN_QUERIES: dict[str, QuerySpec] = {
    "gopher_quality": QuerySpec(
        q_gopher_quality, O_GOPHER_QUALITY, ("text", "quality")
    ),
    "stratified_sample": QuerySpec(
        q_stratified_sample, O_STRATIFIED_SAMPLE, ("text", "pipeline")
    ),
    "sq_encode": QuerySpec(
        q_sq_encode, O_SQ_ENCODE, ("similarity", "quantization")
    ),
    "pq_encode": QuerySpec(
        q_pq_encode, O_PQ_ENCODE, ("similarity", "quantization")
    ),
    "pq_adc_knn": QuerySpec(
        q_pq_adc_knn, O_PQ_ADC_KNN, ("similarity", "quantization")
    ),
}
