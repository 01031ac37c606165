"""Analytics function library for the extended (training-data pipeline)
surface: text analysis, deduplication, similarity search, multimodal
column handling. All hot paths are built-in pyspark.sql.functions
(JVM-side, whole-stage codegen); Python appears only behind Arrow-batched
UDFs in the multimodal stubs."""

from bolson_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    text_stats,
    token_count,
)
from bolson_spark.functions.dedup import (
    exact_dedup,
    minhash_signature,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from bolson_spark.functions.similarity import (
    cosine_similarity_col,
    knn_bruteforce,
    ivf_assign,
    ivf_knn,
)
