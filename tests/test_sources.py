"""Source reader tests — schema-explicit readers round-trip data
identically across formats (S1-analog surface)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bolson_spark.sources.readers import (
    read_csv_with_schema,
    read_json_lines,
    read_parquet_table,
)

SF = "/root/testdata/sf0.001"


def test_csv_reader_roundtrips_parquet_table(spark, tmp_path):
    """nation.parquet -> csv -> read_csv_with_schema == original."""
    nation = read_parquet_table(spark, SF, "nation")
    csv_dir = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", True).csv(csv_dir)
    back = read_csv_with_schema(
        spark, csv_dir, nation.schema, header=True
    )
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )


def test_json_lines_reader_explicit_schema(spark, tmp_path):
    """Line-framed JSON read with an explicit schema (never inferred,
    parse/arrow.cpp:31-58 semantics)."""
    p = tmp_path / "docs.jsonl"
    rows = [{"a": i, "b": f"x{i}"} for i in range(50)]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )
    df = read_json_lines(spark, str(p), schema)
    assert df.schema.simpleString() == "struct<a:bigint,b:string>"
    assert df.count() == 50
    assert df.agg(F.sum("a")).first()[0] == sum(range(50))


def test_kafka_source_option_mapping_and_env_missing(spark):
    """Source-side Kafka parity: option mapping (subscribe, offsets,
    rate cap) is unit-tested; with no connector in this environment
    read_kafka_stream fails fast with a clear env-missing error."""
    import pytest

    from bolson_spark.sources.readers import (
        kafka_source_options,
        read_kafka_stream,
    )

    opts = kafka_source_options(
        "b1:9092,b2:9092", "bolson", max_offsets_per_trigger=50_000
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "bolson",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "50000",
    }
    assert "maxOffsetsPerTrigger" not in kafka_source_options("b", "t")

    with pytest.raises(RuntimeError, match="kafka source unavailable"):
        read_kafka_stream(spark, "b1:9092", "bolson")


def test_load_tables_loads_every_registered_table(spark):
    """session.load_tables is the one-call fixture loader (every table
    name -> DataFrame, with the events nanos->timestamp normalization
    applied): each registered table must come back non-empty with the
    same normalized schema load_table gives."""
    from pyspark.sql import types as T

    from bolson_spark.session import TABLES, load_tables

    tables = load_tables(spark, SF)
    assert set(tables) == set(TABLES)
    for name, df in tables.items():
        assert df.limit(1).count() == 1, name
    # the nanos normalization applied through this path too: ts is a
    # timestamp type (NTZ when parquet carries TIMESTAMP directly,
    # TimestampType after the nanosAsLong long->timestamp rewrite),
    # never the raw int64
    assert isinstance(
        tables["events"].schema["ts"].dataType,
        (T.TimestampType, T.TimestampNTZType),
    )


def test_schema_save_load_roundtrip(tmp_path):
    """Arrow schema file roundtrip — the reference's generate-schema
    step (usage.md:14-26): a schema serialized with save_schema must
    read back equal via load_schema, for both reference schemas."""
    from bolson_spark.schemas import (
        BATTERY_SPARK,
        TRIP_SPARK,
        load_schema,
        save_schema,
        spark_to_arrow_schema,
    )

    for i, spark_schema in enumerate((BATTERY_SPARK, TRIP_SPARK)):
        path = str(tmp_path / f"schema_{i}.arrow")
        arrow = spark_to_arrow_schema(spark_schema)
        save_schema(arrow, path)
        assert load_schema(path).equals(arrow)


def test_load_table_memoizes_per_session(spark):
    """load_table is a catalog: the same (session, sf_dir, table)
    resolves to the SAME analyzed DataFrame object (no repeated driver
    file-listing/footer reads — the registry resolves the ten static
    tables hundreds of times per session), while different sf_dirs
    stay distinct plans."""
    from bolson_spark.session import load_table

    a = load_table(spark, "/root/testdata/sf0.001", "orders")
    b = load_table(spark, "/root/testdata/sf0.001", "orders")
    assert a is b
    c = load_table(spark, "/root/testdata/sf0.01", "orders")
    assert c is not a
    # memoized frames still answer queries (not stale handles)
    assert a.limit(1).count() == 1


def test_session_scratch_dir_contract(spark):
    """session_scratch_dir: app-scoped parent (unique per session,
    stable within it), label reuse returns the SAME directory (static
    overwrite, no per-call accumulation), distinct labels are distinct
    namespaces, and everything lives under one reapable parent."""
    import os

    from bolson_spark.session import session_scratch_dir

    p1 = session_scratch_dir(spark, "ivf_test")
    p2 = session_scratch_dir(spark, "ivf_test")
    assert p1 == p2 and os.path.isdir(p1)
    p3 = session_scratch_dir(spark, "other_label")
    assert p3 != p1
    assert os.path.dirname(p3) == os.path.dirname(p1)
    assert spark.sparkContext.applicationId in os.path.dirname(p1)
