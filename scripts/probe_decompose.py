#!/usr/bin/env python
"""Per-query cost decomposition probe (guide §1: measure first).

For each named query, times three phases separately, min-of-N:
  build  — spec.fn(spark, sf_dir): Python-side plan construction
           (py4j round trips, any driver-side .collect()s inside the
           builder, index ensure-builds, fits)
  plan   — df.schema touch: Catalyst analysis of the built plan
  exec   — noop write: optimization + physical planning + execution

Usage: python scripts/probe_decompose.py q1 q2 ... [--sf DIR] [--n 3]
Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.1"
    n = 3
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf = sys.argv[i + 1]
        if a == "--n":
            n = int(sys.argv[i + 1])
    from bolson_spark.queries import QUERIES
    from bolson_spark.session import get_spark

    spark = get_spark("probe-decompose")
    spark.range(1000).count()  # JVM warm
    for name in args:
        spec = QUERIES[name]
        rows = []
        for _ in range(n):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf)
            t1 = time.perf_counter()
            df.schema
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"probe:{name}")
            df.write.mode("overwrite").format("noop").save()
            t3 = time.perf_counter()
            spark.catalog.clearCache()
            rows.append(
                {
                    "build": round(t1 - t0, 4),
                    "plan": round(t2 - t1, 4),
                    "exec": round(t3 - t2, 4),
                    "total": round(t3 - t0, 4),
                }
            )
        best = min(rows, key=lambda r: r["total"])
        print(json.dumps({"query": name, "sf": sf, "best": best, "runs": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
