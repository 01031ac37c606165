#!/usr/bin/env python
"""Shuffle-BYTES companion to probe_repetition_shuffle.py: wall-clock
alone cannot adjudicate the string-vs-hash gram-shuffle trade, because
on local[32] the "shuffle" is memory/local-disk — the hash shape's
whole advantage (fewer NETWORK bytes) is priced at zero while its
extra CPU (hashing + rederive regeneration) is priced in full. This
script runs both modes on the long-doc probe corpus with the Spark UI
enabled and sums per-stage shuffle write bytes from the REST API —
the number a 1000-executor cluster would actually move over the wire.

Usage: python scripts/probe_repetition_shuffle_bytes.py [docs_parquet]
(default: the 10x corpus probe_repetition_shuffle.py leaves behind).
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

from bolson_spark.functions.quality import repetition_metrics  # noqa: E402

DATA = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/tmp/repetition_shuffle_probe/docs_10x.parquet"
)


def rest_stage_totals(port: int = 4040) -> tuple[int, int]:
    base = f"http://localhost:{port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete")
    )
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return w, r


def main() -> None:
    spark = (
        SparkSession.builder.appName("repetition-shuffle-bytes")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .getOrCreate()
    )
    d = spark.read.parquet(DATA)
    print(f"corpus: {DATA}")
    for mode in ("string", "hash"):
        w0, r0 = rest_stage_totals()
        t0 = time.perf_counter()
        repetition_metrics(d, gram_shuffle=mode).write.mode(
            "overwrite"
        ).format("noop").save()
        dt = time.perf_counter() - t0
        w1, r1 = rest_stage_totals()
        print(
            f"{mode:6s} wall {dt:7.1f} s  "
            f"shuffle write {(w1 - w0) / 1e6:10.1f} MB  "
            f"read {(r1 - r0) / 1e6:10.1f} MB",
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
