#!/usr/bin/env python
"""Probe the LSH band-bucket size distribution (r10 VERDICT #2): the
banded candidate join emits ~B²/2 raw pairs for a bucket holding B
docs, all inside ONE reduce task (an equi-join key cannot be split by
AQE), so one boilerplate-heavy band key is a straggler at 100 TB.

Measures, for the sf0.1 documents corpus and a 10x-duplicate-mass
variant (each document replicated 10x with offset doc_ids — the
boilerplate-crawl analog), the (band, band_key) occupancy histogram
and the share of raw candidate pairs owned by the hottest buckets.
Results table goes to SCALING.md by hand.

Usage: python scripts/probe_band_buckets.py [mult ...] (default: 1 10)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bolson_spark.functions.dedup import (  # noqa: E402
    DEFAULT_NUM_HASHES,
    _minhash_prep,
    choose_bands,
)
from bolson_spark.session import get_spark, load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("band-bucket-probe")
    docs = load_table(spark, SRC, "documents").select("doc_id", "text")
    n_docs = docs.count()
    bands = choose_bands(DEFAULT_NUM_HASHES, 0.9)
    for mult in mults:
        if mult == 1:
            corpus = docs
        else:
            corpus = docs.crossJoin(
                spark.range(mult).select(F.col("id").alias("_rep"))
            ).select(
                (F.col("doc_id") + F.col("_rep") * (n_docs * 10)).alias(
                    "doc_id"
                ),
                "text",
            )
        _, band_rows = _minhash_prep(
            corpus, "text", DEFAULT_NUM_HASHES, bands, cache=False
        )
        occ = band_rows.groupBy("band", "band_key").agg(
            F.count(F.lit(1)).alias("b")
        )
        stats = occ.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("b").alias("max_b"),
            F.expr("percentile(b, 0.5)").alias("p50"),
            F.expr("percentile(b, 0.99)").alias("p99"),
            F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("raw_pairs"),
        ).first()
        top = (
            occ.orderBy(F.desc("b"))
            .limit(10)
            .select("b")
            .agg(
                F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("top10_pairs"),
            )
            .first()
        )
        over = {
            k: occ.where(F.col("b") > k).count() for k in (256, 512, 1024, 2048)
        }
        print(
            f"mult={mult} docs={n_docs * mult} buckets={stats['n_buckets']} "
            f"max={stats['max_b']} p50={stats['p50']} p99={stats['p99']} "
            f"raw_pairs={int(stats['raw_pairs'])} "
            f"top10_pair_share={top['top10_pairs'] / stats['raw_pairs']:.3f} "
            f"buckets_over_K={over}"
        )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
