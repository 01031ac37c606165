#!/usr/bin/env python
"""Probe the repetition_metrics gram-count shuffle trade (r9 VERDICT
#4): the STRING shape ships the gram text through the (doc, n, gram)
count shuffle; the HASH shape ships fixed-width (xxhash64, length)
rows plus a doc-local rederive pass for the top gram's tie-break.

Long documents are the regime where the trade matters — gram-string
bytes grow with document length while the hash rows stay fixed-width —
so the probe corpus concatenates groups of 50 sf0.1 documents into
~2.7k-token docs (sf0.1 caps at 100 tokens/doc), then replicates with
doc_id offsets for the 10x/100x points.

Usage: python scripts/probe_repetition_shuffle.py [mult ...]
(default: 1 10 100). Results table goes to SCALING.md by hand.
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bolson_spark.functions.quality import repetition_metrics  # noqa: E402
from bolson_spark.session import get_spark, load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
GROUP = 50
OUT = Path("/tmp/repetition_shuffle_probe")


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("repetition-shuffle-probe")
    if OUT.exists():
        shutil.rmtree(OUT)
    OUT.mkdir(parents=True)

    docs = load_table(spark, SRC, "documents")
    n_src = docs.count()
    longdocs = (
        docs.groupBy((F.col("doc_id") % (n_src // GROUP)).alias("doc_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "text"))
                    ),
                    lambda s: s.getField("text"),
                ),
                " ",
            ).alias("text")
        )
    )
    base = OUT / "base.parquet"
    longdocs.write.mode("overwrite").parquet(str(base))

    for mult in mults:
        b = spark.read.parquet(str(base))
        big = b
        for i in range(1, mult):
            big = big.unionByName(
                b.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
            )
        p = OUT / f"docs_{mult}x.parquet"
        # repartition BEFORE writing: the 1x corpus is 100 docs in one
        # parquet file — without this the 1x point measures 1-2 busy
        # cores against 10x/100x's 32, poisoning the growth ratio
        big.repartition(64, "doc_id").write.mode("overwrite").parquet(str(p))
        d = spark.read.parquet(str(p))
        nd, toks = d.agg(
            F.count(F.lit(1)), F.sum(F.size(F.split("text", " ")))
        ).first()
        print(f"-- {mult}x: {nd} long docs, {toks} tokens")
        for mode in ("string", "hash"):
            t0 = time.perf_counter()
            repetition_metrics(d, gram_shuffle=mode).write.mode(
                "overwrite"
            ).format("noop").save()
            dt = time.perf_counter() - t0
            print(f"{mult:4d}x  {mode:6s} {dt:7.1f} s", flush=True)
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
