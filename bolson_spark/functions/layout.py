"""Data-layout operators — multi-dimensional clustering for scan
pruning (the lakehouse OPTIMIZE ZORDER pattern).

At 100 TB the cheapest query is the one whose files are never opened:
min/max file statistics prune scans only when each file's value ranges
are NARROW, and a single-column sort gives narrow ranges on one column
only. A Z-order (Morton) key interleaves the bits of two (or more)
dimensions so that range-clustering by the key yields files narrow in
ALL interleaved dimensions at once — multiplicative pruning for
conjunctive predicates.

Everything is integer arithmetic inside whole-stage codegen (bit
shifts unrolled over a fixed bit width — 32 literal terms, a small
expression tree), plus one global min/max aggregate broadcast back as
a 1-row join for domain normalization. Deterministic and
SQL-expressible, so the layout op is DuckDB-oracle-checked like any
other operator.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension -> 32-bit z-values


def zorder_key_scaled(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton interleave of two ALREADY-SCALED non-negative ints in
    [0, 2^bits): bit i of x lands at z-bit 2i, bit i of y at 2i+1.
    Unrolled literal shifts — codegen-friendly, no lambdas needed."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def scale_to_bits(x: Column, xmin: Column, xmax: Column,
                  bits: int = ZBITS) -> Column:
    """Min/max-normalize x into [0, 2^bits): floor((x - min) * 2^bits
    / (max - min + 1)). The +1 keeps the top value inside the range;
    float64 multiply-then-floor is exact for these magnitudes and
    identical across engines."""
    span = (xmax - xmin + 1).cast("double")
    return F.floor(
        (x - xmin).cast("double") * float(1 << bits) / span
    ).cast("bigint")


def zorder_stats(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bucket_shift: int = 24,
) -> DataFrame:
    """Z-order the rows of `df` on (col_x, col_y) and emit the
    per-bucket min/max skipping statistics a lakehouse writer would
    attach to each file: bucket id = zval >> bucket_shift (256 buckets
    at the defaults), with row count and both dimensions' ranges.

    Scale shape: one global min/max aggregate (4 numbers) broadcast
    back as a 1-row join, one narrow map computing the z-value, one
    map-side-combined aggregation on the bucket id. The actual
    clustered WRITE at scale is `repartitionByRange(zval)` +
    `sortWithinPartitions(zval)` — range boundaries from Spark's
    sampled range partitioner — followed by a partitioned/bucketed
    sink; this operator materializes the statistics that make the
    layout's pruning power measurable (see the locality test).
    """
    bounds = df.agg(
        F.min(col_x).alias("_xmin"),
        F.max(col_x).alias("_xmax"),
        F.min(col_y).alias("_ymin"),
        F.max(col_y).alias("_ymax"),
    )
    z = zorder_key_scaled(
        scale_to_bits(F.col(col_x), F.col("_xmin"), F.col("_xmax")),
        scale_to_bits(F.col(col_y), F.col("_ymin"), F.col("_ymax")),
    )
    keyed = df.crossJoin(F.broadcast(bounds)).select(
        F.col(col_x), F.col(col_y), z.alias("zval")
    )
    return (
        keyed.groupBy(
            F.shiftright(F.col("zval"), bucket_shift).alias("zbucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(col_x).alias(f"min_{col_x}"),
            F.max(col_x).alias(f"max_{col_x}"),
            F.min(col_y).alias(f"min_{col_y}"),
            F.max(col_y).alias(f"max_{col_y}"),
        )
    )


def write_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 10_000,
    partition_by: str | None = None,
) -> DataFrame:
    """Write a corpus as size-bounded parquet shards and return the
    shard MANIFEST — the delivery step of a training-data pipeline
    (the consumer's dataloader reads the manifest, not a directory
    listing).

    Scale shape: `maxRecordsPerFile` bounds every shard without any
    extra shuffle (Spark splits files as tasks write); an optional
    `partition_by` adds hive-style directory pruning on top. The
    manifest is computed by ONE pass over the written files (grouped
    by `input_file_name`), giving per-shard row counts and doc-id
    ranges a resumable loader needs. At 100 TB the manifest is
    thousands of rows — driver-safe by construction.

    Returns (shard, n_rows, min_doc_id, max_doc_id) — one row per
    written file.
    """
    writer = df.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)
    spark = df.sparkSession
    written = spark.read.parquet(path)
    # Shard key = path RELATIVE TO THE OUTPUT ROOT, not the basename:
    # with partition_by, Spark's dynamic-partition writer resets the
    # per-task file counter per partition value, so files in different
    # partition directories share identical basenames and a basename
    # key would silently merge distinct physical files (breaking the
    # one-row-per-file contract a resumable dataloader relies on).
    # input_file_name() returns a percent-encoded URI — decode before
    # matching so a root dir containing spaces/special characters still
    # keys every file (an unmatched regex would collapse the manifest
    # to one '' row). url_decode is FORM decoding ('+' -> space), which
    # would corrupt literal '+' in paths; protect it by re-encoding '+'
    # as %2B first, making the combination a pure percent-decoder.
    root = re.escape(path.rstrip("/").split("/")[-1])
    decoded = F.url_decode(
        F.regexp_replace(F.input_file_name(), r"\+", "%2B")
    )
    return (
        written.groupBy(
            F.regexp_extract(
                decoded,
                rf"/{root}/(.+\.parquet)",
                1,
            ).alias("shard")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def range_cluster_write(
    df: DataFrame, path: str, cluster_col: str, num_files: int
) -> None:
    """The clustered write itself (the step zorder_stats models the
    statistics for): range-repartition on the cluster key — Spark
    samples range boundaries, so each output file owns a DISJOINT key
    range — and sort within partitions so row groups inside a file are
    ordered too. Min/max file statistics then prune scans maximally:
    a point/range predicate on the cluster key touches exactly the
    files whose range intersects it. For two-dimensional pruning pass
    a Morton key (zorder_key_scaled) as the cluster column."""
    (
        df.repartitionByRange(num_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_shards(
    spark,
    path: str,
    out_path: str,
    target_records_per_file: int = 10_000,
    partition_by: str | None = None,
) -> DataFrame:
    """Small-file compaction — the lakehouse OPTIMIZE step for a shard
    directory that accumulated many undersized files (streaming ingest
    and dynamic-partition writes both produce them). One count pass
    sizes the job, then a round-robin repartition to
    ceil(n / target) tasks makes every output file land within one
    record of the target (repartition splits differ by <= 1 row, so
    ``maxRecordsPerFile`` never fragments them). Returns the fresh
    manifest from :func:`write_shards`.

    With ``partition_by`` the repartition is BY the partition column,
    not round-robin: each task then owns whole partition values, so
    the dynamic-partition writer emits ceil(rows_p / target) files per
    partition value instead of one sliver per (task x partition) pair
    — round-robin there would re-fragment exactly what compaction is
    meant to fix.

    At 100 TB this is the periodic maintenance job that keeps scan
    task counts proportional to DATA size rather than to ingest batch
    count; without it a year of micro-batches means millions of tiny
    files and a scheduler-bound scan.
    """
    import math
    import os

    # refuse in-place compaction: the overwrite-mode write CLEARS the
    # target before the lazy read of the same directory executes, so
    # compact_shards(spark, d, d) would permanently destroy the input.
    # Compact to a staging dir and swap.
    if os.path.abspath(out_path) == os.path.abspath(path):
        raise ValueError(
            "compact_shards: out_path must differ from path — an "
            "overwrite write into its own lazy source deletes the "
            "data before it is read; compact into a staging dir and "
            "swap"
        )
    df = spark.read.parquet(path)
    if partition_by:
        compacted = df.repartition(F.col(partition_by))
    else:
        n = df.count()
        n_files = max(1, math.ceil(n / target_records_per_file))
        compacted = df.repartition(n_files)
    return write_shards(
        compacted,
        out_path,
        max_records_per_file=target_records_per_file,
        partition_by=partition_by,
    )


def token_balanced_shards(
    df: DataFrame,
    n_shards: int,
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-BALANCED shard assignment: round-robin over documents in
    weight-descending order — the classic LPT-flavored bound that
    per-shard totals differ by at most one document's weight, which is
    what `write_shards`' record-count bound cannot promise when doc
    lengths are skewed (a 10k-doc shard of books vs one of tweets).

    The global weight-descending position comes from the scalable
    sequence operator (operators/seq.py::add_seq_scalable: frozen
    bucket bounds + exact per-bucket counts + intra-bucket window —
    no global sort, no single reducer), so the assignment is exact at
    any scale; shard = pos % n_shards is then a narrow map. Consumers
    write with ``df.repartition(n_shards, "shard")`` or
    ``partitionBy("shard")``.

    Output: (id_col, weight_col, shard).
    """
    from bolson_spark.operators.seq import add_seq_scalable

    keyed = df.select(
        id_col,
        F.col(weight_col).cast("bigint").alias(weight_col),
        (-F.col(weight_col).cast("bigint")).alias("_negw"),
    )
    pos = add_seq_scalable(keyed, ["_negw", id_col], name="_pos")
    return pos.select(
        id_col,
        weight_col,
        F.pmod(F.col("_pos"), F.lit(n_shards)).cast("bigint").alias("shard"),
    )
