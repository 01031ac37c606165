#!/usr/bin/env python
"""Scale probe: materialize an N× replica of the sf0.1 testdata (doc
ids offset per copy, texts repeated — the exact-duplicate structure a
crawl re-ingest produces) and time the headline operators on it.

Usage: python scripts/scale_probe.py [multiplier] [out_dir]

This is the evidence script behind SCALING.md's "10× documents"
table: the pair-emitting dedup is expected to blow up quadratically
(its OUTPUT does), while the representative path (identical-set
canonicalization + hybrid components) and the pipeline composition
should grow roughly linearly.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bolson_spark.queries import QUERIES  # noqa: E402
from bolson_spark.session import TABLES, get_spark, load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
PROBES = [
    "dedup_minhash_components",
    "training_corpus",
    "dedup_exact",
    "decontaminate",
    "pack_sequences",
    "convert_pipeline",
    # similarity/quantization family (round-5 ask): the embeddings
    # table is replicated with per-copy vec_id offsets, so corpus-side
    # cost terms (assignment scan, ADC scan, tiled GEMM) scale with
    # the multiplier while query/codebook/centroid sides stay fixed.
    "ivf_pq_knn",
    "pq_adc_knn",
    "knn_sq",
    "embedding_blocked_nn",
    "embedding_blocked_nn_tiled",
    "embedding_blocked_nn_gemm_unsplit",
    # round-6: scalable-cells IVF dedup — n_cells = N // target_cell
    # holds per-cell pair space flat, so wall should grow ~linearly
    # where the fixed-8-cell twin measured 42x at 100x.
    "dedup_embedding_ivf_scaled",
    # round-9: the composed substring+near-dup flagship (window-stream
    # linear term) and the full Gopher repetition family (7 gram
    # streams, one count shuffle)
    "training_corpus_spandedup",
    "repetition_metrics",
    # round-10: DSIR importance weights + the budgeted Gumbel
    # resample (two token aggs + vocab join back + bucketed cumsum)
    "dsir_selection",
    "dsir_resample",
]


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scale_probe")
    # SCALE_PROBES=a,b,c narrows the probe set — at 100x the
    # quadratic-pair brute-force family is deliberately excluded
    # (its growth is established at 10x; 100x would be 10^4x pairs).
    global PROBES
    sel = os.environ.get("SCALE_PROBES")
    if sel:
        PROBES = [p.strip() for p in sel.split(",") if p.strip()]
    spark = get_spark("scale-probe")
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    # Replicate documents and events with per-copy id offsets; link the
    # other tables unchanged (the probes don't scale them).
    docs = load_table(spark, SRC, "documents")
    reps = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        for i in range(mult)
    ]
    big_docs = reps[0]
    for r in reps[1:]:
        big_docs = big_docs.unionByName(r)
    big_docs.write.mode("overwrite").parquet(str(out / "documents.parquet"))

    ev = load_table(spark, SRC, "events")
    evs = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
        for i in range(mult)
    ]
    big_ev = evs[0]
    for r in evs[1:]:
        big_ev = big_ev.unionByName(r)
    big_ev.write.mode("overwrite").parquet(str(out / "events.parquet"))

    # Embeddings: replicate with vec_id offsets. vec 0 (the query
    # vector) and the low-id centroid/codebook rows keep their ids in
    # copy 0 only, so the query/centroid/codebook sides of every ANN
    # probe stay FIXED while the scanned corpus grows by `mult` — the
    # scaling shape of a real index serving a growing corpus.
    emb = load_table(spark, SRC, "embeddings")
    ems = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        for i in range(mult)
    ]
    big_emb = ems[0]
    for r in ems[1:]:
        big_emb = big_emb.unionByName(r)
    big_emb.write.mode("overwrite").parquet(str(out / "embeddings.parquet"))

    for t in TABLES:
        dst = out / f"{t}.parquet"
        if not dst.exists():
            (dst).symlink_to(f"{SRC}/{t}.parquet")

    n_docs = load_table(spark, str(out), "documents").count()
    n_ev = load_table(spark, str(out), "events").count()
    print(f"probe data: {n_docs} docs, {n_ev} events ({mult}x sf0.1)")

    for name in PROBES:
        t0 = time.perf_counter()
        n = (
            QUERIES[name]
            .fn(spark, str(out))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        dt = time.perf_counter() - t0
        print(f"{name:28s} {dt:7.1f} s")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
