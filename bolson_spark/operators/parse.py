"""P1 — schema-driven JSON parse.

Reference semantics (parse/arrow.cpp:72-93,107-168):
- explicit schema, never inferred;
- malformed JSON is a hard error (Arrow TableReader fails the buffer);
- a document containing a field NOT in the schema is a hard error
  (``UnexpectedFieldBehavior::Error``, parse/arrow.cpp:87-88);
- output is columnar (one RecordBatch per input buffer).

Spark-first mapping: ``from_json(col, schema, mode=FAILFAST)`` gives
schema-driven parse + error-on-malformed, JVM-side inside whole-stage
codegen (no Python in the hot path). ``from_json`` silently *ignores*
unexpected fields, so strictness is restored with a JSON-key check
compiled to built-in expressions (``json_object_keys`` +
``array_except`` + ``raise_error``) — still zero Python, fully
vectorized, and Catalyst prunes it when ``strict=False``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _unexpected_keys(col: Column, schema: T.StructType) -> Column:
    """Top-level JSON keys of `col` that are not in `schema`."""
    expected = F.array(*[F.lit(f.name) for f in schema.fields])
    return F.array_except(F.json_object_keys(col), expected)


def validate_no_unexpected_fields(
    df: DataFrame, column: str, schema: T.StructType
) -> DataFrame:
    """Rows whose JSON payload has top-level keys outside `schema`.

    Empty result == every document conforms (parse/arrow.cpp:87-88).
    Exposed separately so the check is also usable as a query/audit.
    """
    bad = _unexpected_keys(F.col(column), schema)
    return df.where(F.size(bad) > 0)


def parse_json(
    df: DataFrame,
    schema: T.StructType,
    column: str = "value",
    *,
    strict: bool = True,
    keep: list[str] | None = None,
) -> DataFrame:
    """Parse a string column of JSON documents against an explicit schema.

    strict=True reproduces the reference's UnexpectedFieldBehavior::Error:
    any row with an out-of-schema top-level key raises at execution time
    via the built-in ``raise_error`` expression (no Python, no collect).
    ``keep`` lists pass-through columns to retain next to the parsed
    fields (e.g. the arrival key used for sequence numbers).
    """
    src = F.col(column)
    parsed = F.from_json(src, schema, {"mode": "FAILFAST"})
    if strict:
        bad = _unexpected_keys(src, schema)
        guard = F.when(
            F.size(bad) > 0,
            F.raise_error(
                F.concat(
                    F.lit("bolson_spark: unexpected JSON field(s) "),
                    F.to_json(bad),
                    F.lit(" in document: "),
                    src,
                )
            ),
        ).otherwise(parsed)
        parsed = guard
    keep_cols = [F.col(c) for c in (keep or [])]
    out = df.select(*keep_cols, parsed.alias("_parsed")).select(
        *[c for c in (keep or [])], "_parsed.*"
    )
    return out
