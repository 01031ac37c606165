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


def test_write_shards_bounds_and_manifest(spark, tmp_path):
    """Every shard respects maxRecordsPerFile; the manifest's row
    counts reconstruct the corpus exactly; doc-id ranges are per-shard
    consistent."""
    from bolson_spark.functions.layout import write_shards

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n_docs = docs.count()
    manifest = write_shards(
        docs, str(tmp_path / "shards"), max_records_per_file=64
    ).collect()
    assert sum(r.n_rows for r in manifest) == n_docs
    assert all(r.n_rows <= 64 for r in manifest)
    assert all(r.min_doc_id <= r.max_doc_id for r in manifest)
    # the written data round-trips
    back = spark.read.parquet(str(tmp_path / "shards"))
    assert back.count() == n_docs


def test_range_cluster_write_yields_disjoint_file_ranges(spark, tmp_path):
    """Every output file must own a disjoint key range (that is what
    makes min/max pruning effective), and rows inside a file arrive
    sorted."""
    from pyspark.sql import functions as F

    from bolson_spark.functions.layout import range_cluster_write

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    out = str(tmp_path / "clustered")
    range_cluster_write(orders, out, "o_custkey", num_files=8)

    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    ranges = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("o_custkey").alias("lo"), F.max("o_custkey").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in ranges)
    assert len(spans) > 1
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint (boundary keys may touch)


def test_write_shards_manifest_with_partition_by(spark, tmp_path):
    """With partition_by, Spark's dynamic-partition writer resets the
    per-task file counter per partition value, so files in DIFFERENT
    partition dirs share identical basenames. The manifest must key on
    the root-relative path (keeping partition subdirs): one manifest
    row per physical file, every shard within the record cap, row
    counts reconstructing the corpus exactly."""
    import glob

    from bolson_spark.functions.layout import write_shards

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n_docs = docs.count()
    out = tmp_path / "shards_p"
    manifest = write_shards(
        docs, str(out), max_records_per_file=64, partition_by="lang"
    ).collect()
    files_on_disk = glob.glob(str(out / "**" / "*.parquet"), recursive=True)
    assert len(manifest) == len(files_on_disk)
    # shard keys are unique root-relative paths including lang=...
    shards = [r.shard for r in manifest]
    assert len(set(shards)) == len(shards)
    assert all("/" in s for s in shards), "partition dir must be kept"
    assert sum(r.n_rows for r in manifest) == n_docs
    assert all(r.n_rows <= 64 for r in manifest)
    assert all(r.min_doc_id <= r.max_doc_id for r in manifest)


def test_minhash_index_probe_matches_inline_and_is_bucketed(spark):
    """The persisted-index gate must (a) return exactly the inline
    incremental gate's output and (b) read the index through bucketed
    scans so the probe never shuffles the (huge) index side."""
    from pyspark.sql import functions as F

    from bolson_spark.functions.dedup import (
        incremental_minhash_dedup,
        probe_minhash_index,
        save_minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)

    save_minhash_index(corpus, "mh_idx_test")
    try:
        via_index = probe_minhash_index(spark, "mh_idx_test", delta)
        inline = incremental_minhash_dedup(corpus, delta)
        assert sorted(map(tuple, via_index.collect())) == sorted(
            map(tuple, inline.collect())
        )
        from bolson_spark.plans import formatted_plan

        plan = formatted_plan(via_index)
        assert "Bucketed: true" in plan
        # parameter mismatch is an error, never a silent all-accept
        import pytest

        with pytest.raises(ValueError, match="num_hashes"):
            probe_minhash_index(spark, "mh_idx_test", delta, num_hashes=32)
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_idx_test_bands")
        spark.sql("DROP TABLE IF EXISTS mh_idx_test_toks")
        spark.sql("DROP TABLE IF EXISTS mh_idx_test_meta")


def test_compact_shards_merges_small_files(spark, tmp_path):
    """Compaction rewrites a many-small-files shard dir into
    ceil(n/target) near-target files with nothing lost: row counts
    reconstruct exactly and every file respects the cap."""
    import glob
    import math

    from bolson_spark.functions.layout import compact_shards, write_shards

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n = docs.count()
    frag = tmp_path / "fragmented"
    write_shards(docs, str(frag), max_records_per_file=16)
    n_small = len(glob.glob(str(frag / "*.parquet")))
    assert n_small >= n // 16  # genuinely fragmented input

    out = tmp_path / "compacted"
    manifest = compact_shards(
        spark, str(frag), str(out), target_records_per_file=256
    ).collect()
    files = glob.glob(str(out / "*.parquet"))
    assert len(files) == math.ceil(n / 256)
    assert len(files) < n_small
    assert sum(r.n_rows for r in manifest) == n
    assert all(r.n_rows <= 256 for r in manifest)
    back = spark.read.parquet(str(out))
    assert back.count() == n and set(back.columns) == set(docs.columns)
