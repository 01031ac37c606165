"""The composed convert pipeline — parse -> seq -> rebatch [-> serialize].

This is the reference's converter thread loop (convert/converter.cpp:
96-171: Parse -> Resize -> Serialize) as a declarative DataFrame
composition; Spark tasks replace converter threads, Catalyst fuses the
parse/seq/rebatch projections into one whole-stage-codegen span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from bolson_spark import MAX_IPC_SIZE, MAX_ROWS_DEFAULT
from bolson_spark.operators.parse import parse_json
from bolson_spark.operators.rebatch import rebatch
from bolson_spark.operators.seq import add_seq
from bolson_spark.operators.serialize import serialize_ipc


def convert(
    df: DataFrame,
    schema: T.StructType,
    json_col: str,
    order_by: str,
    *,
    max_rows: int = MAX_ROWS_DEFAULT,
    max_ipc_size: int = MAX_IPC_SIZE,
    strict: bool = True,
    serialize: bool = False,
) -> DataFrame:
    """Raw JSON rows -> parsed + sequenced + rebatched [+ serialized]."""
    parsed = parse_json(df, schema, json_col, strict=strict, keep=[order_by])
    seqd = add_seq(parsed, order_by)
    batched = rebatch(seqd, max_rows=max_rows)
    if serialize:
        return serialize_ipc(batched, max_rows=max_rows, max_ipc_size=max_ipc_size)
    return batched
