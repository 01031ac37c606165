"""End-to-end streaming tests — the `bolson stream` analog: line-framed
JSON files stream in (multiple micro-batches), IPC messages land in the
sink, counts drain to equality (stream.cpp:168-178), seq numbers are
globally contiguous, and the schema handshake accepts/rejects."""

from __future__ import annotations

import json
import os
import random

import pyarrow as pa
import pytest
from pyspark.sql import types as T

from bolson_spark.operators.serialize import deserialize_ipc
from bolson_spark.schemas import BATTERY_SPARK, spark_to_arrow_schema
from bolson_spark.streaming import IpcFileSink, SchemaMismatchError, run_stream_convert


@pytest.fixture()
def jsonl_dir(tmp_path):
    """Three jsonl files -> three micro-batches (maxFilesPerTrigger=1)."""
    rng = random.Random(3)
    src = tmp_path / "src"
    src.mkdir()
    all_docs = []
    for i in range(3):
        docs = [
            {"voltage": [rng.randint(0, 2047) for _ in range(rng.randint(1, 16))]}
            for _ in range(700)
        ]
        (src / f"part-{i}.jsonl").write_text(
            "\n".join(json.dumps(d) for d in docs) + "\n"
        )
        all_docs.extend(docs)
    return src, all_docs


def test_stream_convert_end_to_end(spark, tmp_path, jsonl_dir):
    src, all_docs = jsonl_dir
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    sink = IpcFileSink(str(tmp_path / "topic"))
    query, metrics = run_stream_convert(
        raw,
        BATTERY_SPARK,
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_rows=256,
    )
    query.awaitTermination(120)
    # drain condition: received == published (stream.cpp:168-178)
    assert metrics.num_jsons == len(all_docs)
    msgs = sink.read(spark)
    stats = msgs.selectExpr(
        "sum(num_rows) AS rows", "count(*) AS n", "max(num_rows) AS mx"
    ).first()
    assert stats["rows"] == len(all_docs)
    assert stats["mx"] <= 256
    assert metrics.num_ipc == stats["n"]
    # payloads deserialize to the original docs + globally contiguous seq
    back = deserialize_ipc(
        msgs, "voltage array<bigint>, bolson_seq bigint"
    ).collect()
    seqs = sorted(r.bolson_seq for r in back)
    assert seqs == list(range(len(all_docs)))
    got = sorted((r.bolson_seq, tuple(r.voltage)) for r in back)
    # each batch preserves intra-file order, so seq maps 1:1 to doc order
    # within each micro-batch; verify multiset equality of documents
    assert sorted(t for _, t in got) == sorted(
        tuple(d["voltage"]) for d in all_docs
    )


def test_schema_handshake_rejects_mismatch(tmp_path):
    sink = IpcFileSink(str(tmp_path / "topic"))
    s1 = spark_to_arrow_schema(BATTERY_SPARK)
    sink.handshake(s1)  # topic empty -> publish schema
    sink.handshake(s1)  # same schema -> ok
    s2 = pa.schema([pa.field("other", pa.int64())])
    with pytest.raises(SchemaMismatchError):
        sink.handshake(s2)


def test_stream_strict_parse_fails_stream(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "bad.jsonl").write_text('{"voltage": [1], "intruder": 5}\n')
    raw = spark.readStream.format("text").load(str(src))
    sink = IpcFileSink(str(tmp_path / "topic"))
    query, _ = run_stream_convert(
        raw, BATTERY_SPARK, sink, checkpoint_dir=str(tmp_path / "ckpt")
    )
    with pytest.raises(Exception, match="unexpected JSON field|StreamingQuery"):
        query.awaitTermination(120)
        raise RuntimeError("StreamingQuery did not fail")
