"""Z1 — serialize to Arrow IPC.

Reference semantics (convert/serializer.cpp:19-44): each resized
RecordBatch is serialized to one Arrow IPC message; if the message
exceeds ``max_ipc_size`` (default 5 MiB - 10 KiB = 5232640, the Pulsar
broker limit, publish/publisher.h:39-41) it is a HARD ERROR — the
serializer does not split further (FNC10).

Spark-first mapping: ``mapInArrow`` hands each partition to Python as a
stream of Arrow RecordBatches with zero-copy off the JVM. Inside, we
slice each batch to ``max_rows`` (the zero-copy ``RecordBatch.slice``
the reference's Resizer uses, resizer.cpp:29-41) and write one IPC
message per slice. Output rows are ``(payload BINARY, seq_first,
seq_last, num_rows, ipc_bytes)`` — the SerializedBatch/IpcQueueItem
shape (convert/serializer.h:24-38) ready for a pub/sub sink.

At 100 TB scale this is embarrassingly parallel: no shuffle is
introduced here; upstream ``rebatch`` fixed the partitioning, and each
task streams batches through Python with Arrow (vectorized, not
row-at-a-time).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

from bolson_spark import MAX_IPC_SIZE, MAX_ROWS_DEFAULT, SEQ_COL

SERIALIZED_SCHEMA = (
    "payload binary, seq_first bigint, seq_last bigint, "
    "num_rows bigint, ipc_bytes bigint"
)


def _ipc_bytes(batch: pa.RecordBatch) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, batch.schema) as writer:
        writer.write_batch(batch)
    return sink.getvalue().to_pybytes()


def serialize_ipc(
    df: DataFrame,
    max_rows: int = MAX_ROWS_DEFAULT,
    max_ipc_size: int = MAX_IPC_SIZE,
    seq_col: str = SEQ_COL,
    seq_mode: str = "column",
) -> DataFrame:
    """DataFrame -> one row per IPC message (sliced to <= max_rows).

    ``seq_mode`` mirrors the reference's ``--*-seq-col`` switch:
    ``"column"`` keeps the physical bolson_seq column in the payload;
    ``"metadata"`` drops it and instead stamps ``bolson_seq_first`` /
    ``bolson_seq_last`` into the payload's Arrow schema metadata
    (parse/parser.cpp:34-47, AddSeqAsSchemaMeta).
    """
    if seq_mode not in ("column", "metadata"):
        raise ValueError(f"seq_mode must be column|metadata, got {seq_mode}")

    # validate EAGERLY on the driver: get_field_index returns -1 for a
    # missing column and pyarrow's column(-1) is Python negative
    # indexing (the LAST column), so an absent seq column would emit
    # garbage seq_first/seq_last from an unrelated column's min/max
    # with no error
    if seq_col not in df.columns:
        raise ValueError(
            f"serialize_ipc: seq column {seq_col!r} not in DataFrame "
            f"(columns: {df.columns}) — run add_seq/add_seq_scalable "
            "first or pass seq_col"
        )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        for batch in batches:
            seq_idx = batch.schema.get_field_index(seq_col)
            n = batch.num_rows
            if n == 0:
                continue
            # slice WITHIN contiguous seq runs: the envelope contract
            # (FNC02) is that every message covers a contiguous,
            # non-overlapping seq range. A partition can legitimately
            # hold several non-adjacent runs (the streaming pipeline's
            # hash-block repartition puts colliding blocks in one
            # partition, sorted by seq) — a blind [off, off+max_rows)
            # slice would span the gap and publish a message whose
            # [seq_first, seq_last] covers rows it does not contain.
            seqs_np = batch.column(seq_idx).to_numpy(
                zero_copy_only=False
            )
            jumps = (np.nonzero(np.diff(seqs_np) != 1)[0] + 1).tolist()
            cuts = [0] + jumps + [n]
            offsets = [
                (off, min(max_rows, b - off))
                for a, b in zip(cuts, cuts[1:])
                for off in range(a, b, max_rows)
            ]
            for off, length in offsets:
                sl = batch.slice(off, length)  # zero-copy
                seqs = sl.column(seq_idx)
                lo = pa.compute.min(seqs).as_py()
                hi = pa.compute.max(seqs).as_py()
                if seq_mode == "metadata":
                    meta = dict(sl.schema.metadata or {})
                    meta[b"bolson_seq_first"] = str(lo).encode()
                    meta[b"bolson_seq_last"] = str(hi).encode()
                    sl = sl.drop_columns([seq_col]).replace_schema_metadata(
                        meta
                    )
                payload = _ipc_bytes(sl)
                if len(payload) > max_ipc_size:
                    # FNC10: error, never auto-split (serializer.cpp:33-37)
                    raise ValueError(
                        f"bolson_spark: IPC message size {len(payload)} "
                        f"exceeds maximum {max_ipc_size}"
                    )
                yield pa.RecordBatch.from_pydict(
                    {
                        "payload": [payload],
                        "seq_first": [lo],
                        "seq_last": [hi],
                        "num_rows": [sl.num_rows],
                        "ipc_bytes": [len(payload)],
                    }
                )

    return df.mapInArrow(fn, SERIALIZED_SCHEMA)


def deserialize_ipc(
    df: DataFrame, out_schema: str, payload_col: str = "payload"
) -> DataFrame:
    """Inverse of ``serialize_ipc`` for round-trip verification: payload
    BINARY -> the original rows (schema supplied as a DDL string, since
    a streaming plan needs its schema up front). Tests use it to assert
    FNC03 information equality (test_convert.h:172-174)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            idx = batch.schema.get_field_index(payload_col)
            for payload in batch.column(idx):
                with pa.ipc.open_stream(payload.as_py()) as reader:
                    yield from reader

    return df.mapInArrow(fn, out_schema)
