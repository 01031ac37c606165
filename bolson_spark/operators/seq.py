"""P4 — sequence-number generation.

Reference semantics: every JSON gets a monotonically-increasing sequence
number reflecting arrival order, carried as a physical non-nullable
``bolson_seq`` uint64 column prepended to the schema
(parse/arrow.cpp:147-163, parse/parser.cpp:34-60). Sequence numbers are
contiguous and 0-based.

Two implementations:

- ``add_seq``        — exact semantics via ``row_number() OVER (ORDER BY
  key)``. A global window is a single-reducer sort: correct and what the
  parity tests use (the reference is itself a single TCP stream,
  stream.cpp:70), but NOT the 100 TB path.
- ``add_seq_scalable`` — the scale path: a two-pass partition-offset
  scheme (count rows per partition, exclusive-prefix-sum the counts on
  the driver — thousands of longs, not data — then seq = partition base
  + intra-partition row_number). No global shuffle of the data; each
  partition is numbered independently. Requires data already
  range-partitioned/sorted by the arrival key so that partition order ==
  key order (a parquet scan of a sorted table, or repartitionByRange
  upstream, satisfies this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bolson_spark import SEQ_COL


def add_seq(
    df: DataFrame,
    order_by: str | list[str],
    name: str = SEQ_COL,
    start: int = 0,
) -> DataFrame:
    """Exact contiguous 0-based sequence numbers in `order_by` order."""
    keys = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.orderBy(*[F.col(k) for k in keys])
    out = df.withColumn(name, F.row_number().over(w).cast("bigint") - 1 + start)
    # Reference prepends bolson_seq at column index 0 (parse/arrow.cpp:155)
    return out.select(name, *df.columns)


def add_seq_scalable(
    df: DataFrame,
    order_by: str | list[str],
    name: str = SEQ_COL,
    start: int = 0,
) -> DataFrame:
    """Contiguous sequence numbers without a global sort.

    Ranges-partitions by the arrival key (so partition i holds keys
    smaller than partition i+1), then numbers rows with partition-local
    windows plus driver-computed base offsets. The only driver-side data
    is one (partition_id, count) pair per partition.
    """
    keys = [order_by] if isinstance(order_by, str) else list(order_by)
    key_cols = [F.col(k) for k in keys]
    parts = df.repartitionByRange(*key_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Pass 1: per-partition counts -> exclusive prefix sums (driver-side,
    # O(num_partitions) not O(rows)).
    counts = dict(
        parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    bases: dict[int, int] = {}
    running = start
    for pid in sorted(counts):
        bases[pid] = running
        running += counts[pid]
    base_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(bases) for x in (pid, bases[pid])]
        ),
        F.col("_pid"),
    )
    # Pass 2: partition-local row_number (no cross-partition shuffle).
    w = Window.partitionBy("_pid").orderBy(*key_cols)
    out = parts.withColumn(
        name, (base_expr + F.row_number().over(w) - 1).cast("bigint")
    )
    # Reference prepends bolson_seq at column index 0 (parse/arrow.cpp:155)
    return out.select(name, *df.columns)
