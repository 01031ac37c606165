"""Analytics function library for the extended (training-data pipeline)
surface: text analysis, deduplication, similarity search, multimodal
column handling, corpus hygiene, sketching/sampling, tokenizer
training, and data layout. All hot paths are built-in
pyspark.sql.functions (JVM-side, whole-stage codegen); Python appears
only behind Arrow-batched UDFs (media decode, GEMM blocks, vectorized
hashing twins)."""

from bolson_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    text_stats,
    token_count,
)
from bolson_spark.functions.dedup import (
    connected_components,
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
from bolson_spark.functions.corpus import (
    decontaminate,
    dup_ngram_fraction,
    incremental_ingest,
    pack_sequences,
    word_ngrams,
)
from bolson_spark.functions.sketch import (
    kmv_distinct,
    temperature_mix,
    weighted_sample,
)
from bolson_spark.functions.bpe import bpe_encode_col, bpe_train
from bolson_spark.functions.layout import (
    write_shards,
    zorder_key_scaled,
    zorder_stats,
)
from bolson_spark.functions.quality import quality_metrics, stratified_sample
