"""Storage-layout tests: the resize envelope (R1) applied at the lake
layer — partitioned parquet writes with per-file row caps, the layout a
100 TB corpus materializes (partition pruning + bounded file sizes).
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from bolson_spark.queries import QUERIES
from bolson_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_respects_row_envelope(spark, tmp_path):
    """maxRecordsPerFile is the storage-layer analog of max_rows
    (resizer.cpp:21-50): no produced file may exceed the cap."""
    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "corpus")
    (
        docs.repartition("lang")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 64)
        .partitionBy("lang")
        .parquet(out)
    )
    # layout: one directory per partition value
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    dirs = {p.split("lang=")[1] for p in glob.glob(f"{out}/lang=*")}
    assert dirs == langs
    # envelope: every file obeys the cap; total rows preserved
    back = spark.read.parquet(out)
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .count()
        .collect()
    )
    assert all(r["count"] <= 64 for r in per_file)
    assert sum(r["count"] for r in per_file) == docs.count()


def test_partition_pruning_on_read(spark, tmp_path):
    """A lang-filtered read of the partitioned layout must scan only
    that partition (PartitionFilters, not a post-scan filter)."""
    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "corpus2")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    q = spark.read.parquet(out).where(F.col("lang") == "en")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert q.count() == docs.where(F.col("lang") == "en").count()


def test_clean_corpus_materializes_partitioned(spark, tmp_path):
    """End-to-end: the corpus-cleaning pipeline writes a pruned,
    partitioned, row-capped training corpus in one job."""
    df = QUERIES["clean_corpus"].fn(spark, SF)
    out = str(tmp_path / "clean")
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", 128)
        .partitionBy("lang")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
