"""K1/K2 — publish sink with schema handshake.

The reference publishes serialized batches to Pulsar (publisher.cpp:
185-250) and, on startup, performs a schema handshake with the topic:
if the topic is empty it publishes the serialized Arrow schema as
message #1; otherwise it reads message #1 and errors if the schema
differs from the expected one (publisher.cpp:81-143).

No Pulsar broker exists in this environment, so the sink abstraction
writes IPC-message rows to a directory (parquet) — the pub/sub
boundary is ``foreachBatch`` + this sink, exactly where a Kafka/Pulsar
producer would sit (``df.write.format("kafka")`` / client-per-partition
``foreachPartition``). The handshake is implemented against the file
backend and unit-tested; swapping the backend swaps one class.
"""

from __future__ import annotations

import os

import pyarrow as pa
from pyspark.sql import DataFrame


class SchemaMismatchError(RuntimeError):
    """Topic's registered schema differs from the producer's schema
    (publisher.cpp:132-140 analog)."""


class IpcFileSink:
    """Directory-backed stand-in for a Pulsar topic: `_schema.arrow`
    plays the role of message #1; message rows append as parquet."""

    def __init__(self, path: str):
        self.path = path
        self.data_path = os.path.join(path, "messages")
        self.schema_path = os.path.join(path, "_schema.arrow")
        os.makedirs(self.path, exist_ok=True)

    def handshake(self, expected: pa.Schema) -> None:
        """Publish-or-verify the topic schema (K2)."""
        if not os.path.exists(self.schema_path):
            with open(self.schema_path, "wb") as f:
                f.write(expected.serialize())
            return
        with pa.memory_map(self.schema_path) as f:
            existing = pa.ipc.read_schema(f)
        if not existing.equals(expected):
            raise SchemaMismatchError(
                f"topic schema {existing} != producer schema {expected}"
            )

    def write(self, serialized: DataFrame) -> None:
        """Append one micro-batch of IPC-message rows (payload,
        seq_first, seq_last, num_rows, ipc_bytes)."""
        serialized.write.mode("append").parquet(self.data_path)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.data_path)
