"""M1/M2 — metrics aggregation and latency tracking.

Reference: per-thread convert::Metrics / publish::Metrics reduced with
operator+= (convert/metrics.h:26-56, publish/metrics.h:23-38), plus a
6-time-point latency CSV (Received, Parsed, Resized, Serialized,
Popped, Published — latency.h:30-47, latency.cpp:24-56) and a stats CSV
(metrics.cpp:26-63).

Spark mapping:
- throughput counters come from StreamingQuery progress events
  (numInputRows, batchDuration) via a StreamingQueryListener — the
  engine-native replacement for hand-rolled per-thread counters;
- per-batch latency points are wall-clock stamps taken in the
  foreachBatch body around each stage (parse/resize happen fused inside
  one Spark job, so the observable stages here are batch-received,
  converted (job done), published (sink write done) — the fused stages
  are intentionally not separable: that fusion IS the optimization);
- ``save_latency_csv``/``save_metrics_csv`` write the reference's
  column layout so downstream tooling can diff them.
"""

from __future__ import annotations

import csv
import time
from dataclasses import dataclass, field


@dataclass
class BatchLatency:
    """Latency points for one published batch (epoch seconds)."""

    seq_first: int
    seq_last: int
    received: float
    converted: float
    published: float


@dataclass
class LatencyTracker:
    points: list[BatchLatency] = field(default_factory=list)

    def stamp(self, seq_first: int, seq_last: int, received: float, converted: float) -> None:
        self.points.append(
            BatchLatency(seq_first, seq_last, received, converted, time.time())
        )

    def save_latency_csv(self, path: str) -> None:
        """CSV layout after latency.cpp:34-40 (subset of time points —
        see module docstring for why parse/resize/serialize are fused)."""
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(
                ["seq_first", "seq_last", "received", "converted", "published",
                 "convert_ms", "publish_ms", "total_ms"]
            )
            for p in self.points:
                w.writerow(
                    [
                        p.seq_first,
                        p.seq_last,
                        f"{p.received:.6f}",
                        f"{p.converted:.6f}",
                        f"{p.published:.6f}",
                        f"{(p.converted - p.received) * 1e3:.3f}",
                        f"{(p.published - p.converted) * 1e3:.3f}",
                        f"{(p.published - p.received) * 1e3:.3f}",
                    ]
                )


def save_metrics_csv(path: str, metrics, elapsed_sec: float) -> None:
    """Stats CSV after metrics.cpp:26-63: counts, bytes, rates."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["num_jsons", "json_bytes", "num_ipc", "ipc_bytes", "elapsed_sec",
             "json_mbs", "ipc_mbs", "mjs"]
        )
        mb = 1e6
        w.writerow(
            [
                metrics.num_jsons,
                metrics.json_bytes,
                metrics.num_ipc,
                metrics.ipc_bytes,
                f"{elapsed_sec:.3f}",
                f"{metrics.json_bytes / mb / elapsed_sec:.3f}" if elapsed_sec else "",
                f"{metrics.ipc_bytes / mb / elapsed_sec:.3f}" if elapsed_sec else "",
                f"{metrics.num_jsons / 1e6 / elapsed_sec:.6f}" if elapsed_sec else "",
            ]
        )


class ProgressListener:
    """StreamingQueryListener-shaped collector (M1). Implemented as a
    plain class wired via ``spark.streams.addListener`` when available;
    falls back to polling ``query.lastProgress``."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def record(self, query) -> None:
        p = query.lastProgress
        if p:
            self.progress.append(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "inputRowsPerSecond": p.get("inputRowsPerSecond"),
                    "durationMs": p.get("durationMs"),
                }
            )
