"""SparkSession construction + testdata loading.

The driver supplies its own SparkSession to ``__spark_entry__``; this
builder is for tests and bench runs. Configs are chosen for the target
execution model (AQE on, Arrow interop on) — see SURVEY.md §4.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "bolson-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local SparkSession tuned for this engine.

    AQE handles runtime coalescing/skew; Arrow enables fast pandas/Arrow
    UDF interchange; UTC session timezone keeps timestamp semantics
    deterministic across engines (oracle parity).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cpus
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime Bloom-filter join pruning (Spark default, pinned as
        # intent): above the 10 GB fact-scan threshold — the 100 TB
        # regime — a selective dim predicate prunes the fact shuffle;
        # proof test: test_plans.py::test_runtime_bloom_filter_prunes_fact_scan
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # keep bucketed-table artifacts out of the repo working dir
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/bolson_spark_warehouse"),
        )
        .getOrCreate()
    )


def _ensure_confs(spark: SparkSession) -> None:
    """Runtime confs required for deterministic cross-engine results:

    - ``nanosAsLong``: Spark rejects INT64 TIMESTAMP(NANOS) parquet
      columns (events.ts) outright; read them as raw nanos and convert.
    - UTC session timezone: timestamp formatting must not depend on the
      host timezone (the DuckDB oracle formats naive timestamps).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Parquet scan => column pruning and
    predicate pushdown come free from the DataSource V2 reader."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    _ensure_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # nanos -> micros with integer division (a double division would
        # lose precision above 2^53 ns), then to timestamp (UTC session).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
