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


def session_scratch_dir(spark: SparkSession, label: str) -> str:
    """Session-scoped scratch directory for on-disk artifacts a query
    needs to materialize (saved ANN indexes, spill files).

    Contract: the root is ``spark.bolson.scratch.dir`` when set —
    REQUIRED on a real multi-node cluster, pointed at a shared
    filesystem (HDFS/NFS mount/object-store fuse), because artifacts
    written here are read back by executors on OTHER hosts; a
    driver-local path would leave the index scattered and unreadable.
    Unset, the root falls back to ``spark.local.dir`` — correct in
    local mode (this harness) and on single-node deployments, where
    driver and executors share one disk. The per-SESSION component is
    the Spark application id
    (unique per SparkSession, stable within it), so repeated calls with
    one label reuse one directory (statically overwritten artifacts,
    no per-call accumulation) while concurrent harnesses — each with
    its own session — never collide. The app-scoped parent is reaped
    at interpreter exit; labels within it are the caller's namespace.
    """
    import atexit
    import shutil
    import tempfile

    conf = spark.sparkContext.getConf()
    root = conf.get("spark.bolson.scratch.dir", None)
    if not root:
        root = conf.get("spark.local.dir", tempfile.gettempdir())
    # multi-dir roots ("d1,d2") — any one of them is fine
    root = root.split(",")[0]
    parent = os.path.join(
        root, f"bolson-scratch-{spark.sparkContext.applicationId}"
    )
    if not os.path.isdir(parent):  # register the reaper once per app
        os.makedirs(parent, exist_ok=True)
        atexit.register(shutil.rmtree, parent, ignore_errors=True)
    path = os.path.join(parent, label)
    os.makedirs(path, exist_ok=True)
    return path


def _ensure_confs(spark: SparkSession) -> None:
    """Runtime confs required for deterministic cross-engine results:

    - ``nanosAsLong``: Spark rejects INT64 TIMESTAMP(NANOS) parquet
      columns (events.ts) outright; read them as raw nanos and convert.
    - UTC session timezone: timestamp formatting must not depend on the
      host timezone (the DuckDB oracle formats naive timestamps).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# (application_id, sf_dir, name) -> analyzed DataFrame. A catalog, not
# a data cache: reading a parquet table costs a driver-side file
# listing + footer schema read (~0.1 s) EVERY call, and the registry /
# bench resolve the same ten static tables hundreds of times per
# session — a real deployment registers tables once. The DataFrame is
# an immutable lazy plan, so sharing it across queries is free; the
# testdata directories are static, so the captured file index cannot
# go stale. Entries from other (stopped) sessions are evicted on first
# touch by a new session — a plan bound to a stopped SparkContext must
# never be handed out.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (memoized per session — see
    _TABLE_CACHE). Parquet scan => column pruning and predicate
    pushdown come free from the DataSource V2 reader."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, name)
    # Re-pin determinism confs on EVERY call (two cheap conf sets), not
    # just on cache misses — a test or caller that resets the session
    # timezone mid-session must not leak into the next query (r8
    # ADVICE #3). Likewise evict stale-session entries on every call,
    # snapshotting keys first so the iteration never races a mutation.
    _ensure_confs(spark)
    for k in [k for k in list(_TABLE_CACHE) if k[0] != app_id]:
        _TABLE_CACHE.pop(k, None)
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # nanos -> micros with integer division (a double division would
        # lose precision above 2^53 ns), then to timestamp (UTC session).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
