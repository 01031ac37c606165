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


def parse_json_arrow(
    df: DataFrame,
    schema: T.StructType,
    column: str = "value",
    *,
    strict: bool = True,
    keep: list[str] | None = None,
) -> DataFrame:
    """Second physical implementation of P1: the Arrow C++ JSON
    TableReader via ``mapInArrow`` — the very parser the reference's CPU
    path wraps (parse/arrow.cpp:72-93: ``arrow::json::TableReader`` with
    ``UnexpectedFieldBehavior::Error``). The reference ships two physical
    parsers behind one logical operator (CPU Arrow vs FPGA battery/trip)
    and differential-tests them (test/convert/test_opae_battery.cpp:73-88);
    ``parse_json`` (Catalyst ``from_json``) vs this function is the same
    pattern, tested equal in tests/test_operators.py.

    Scale shape: narrow map, zero shuffle; Arrow batches stream through
    the Python worker without a pandas detour. Per-batch the documents
    are newline-joined (the source is line-framed JSON — stream.cpp) and
    handed to the C++ reader in one call.
    """
    import pyarrow as pa
    import pyarrow.json as pajson

    from bolson_spark.schemas import spark_to_arrow_schema

    keep = list(keep or [])
    target = spark_to_arrow_schema(schema)
    behavior = "error" if strict else "ignore"
    out_schema = T.StructType(
        [df.schema[k] for k in keep] + list(schema.fields)
    )

    def fn(batches):
        popts = pajson.ParseOptions(
            explicit_schema=target, unexpected_field_behavior=behavior
        )
        for batch in batches:
            if batch.num_rows == 0:
                continue
            docs = batch.column(column).cast(pa.string())
            if docs.null_count:
                raise ValueError("bolson_spark: null JSON document")
            # newline-join the documents entirely in C (one list -> one
            # string), then hand the raw utf-8 data buffer to the reader
            # zero-copy; no per-document Python objects
            joined = pa.compute.binary_join(
                pa.ListArray.from_arrays([0, len(docs)], docs), pa.scalar("\n")
            )
            blob = joined.buffers()[2]
            ropts = pajson.ReadOptions(block_size=max(len(blob) + 1, 1 << 20))
            tbl = pajson.read_json(
                pa.BufferReader(blob), read_options=ropts, parse_options=popts
            )
            # Arrow's reader SKIPS blank lines, so an empty/whitespace
            # document silently shrinks the output: with keep columns
            # that surfaces as an opaque length-mismatch error below;
            # with keep=[] it would silently DROP the row — where the
            # catalyst twin's FAILFAST raises. Enforce the strict
            # contract with a clear error either way.
            if tbl.num_rows != batch.num_rows:
                raise ValueError(
                    "bolson_spark: "
                    f"{batch.num_rows - tbl.num_rows} empty/blank JSON "
                    "document(s) in batch — the strict parse contract "
                    "(FAILFAST twin) rejects documents that are not a "
                    "JSON object"
                )
            cols = [batch.column(k) for k in keep]
            cols += [
                tbl.column(f.name).combine_chunks() for f in target
            ]
            yield pa.RecordBatch.from_arrays(
                cols, names=keep + [f.name for f in target]
            )

    return df.mapInArrow(fn, out_schema)


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
    keep_cols = [F.col(c) for c in (keep or [])]
    if strict:
        # STAGE the parse result under an alias, then guard on the
        # aliased COLUMN: referencing the from_json expression in both
        # the when-condition and the otherwise branch would parse
        # every document twice (measured ~1.8x on the battery parse —
        # CollapseProject keeps the stage boundary precisely because
        # the alias is consumed more than once).
        staged = df.select(
            *keep_cols, src.alias("_src"), parsed.alias("_p")
        )
        p = F.col("_p")
        guard = F.when(
            # from_json's FAILFAST quirk: an empty/whitespace (or
            # JSON-literal-null) document is not "malformed" to it —
            # it silently yields a NULL struct instead of raising. The
            # reference's reader errors on such documents (Arrow
            # "Empty JSON file"), and the Arrow twin enforces the same
            # via its batch row-count check, so the catalyst path must
            # raise too or the two "tested equal" parsers diverge.
            # Detected via the parse RESULT being null on a non-null
            # input — not a trim() scan, which would re-walk every
            # document string just to find the rare blank one.
            p.isNull() & F.col("_src").isNotNull(),
            F.raise_error(
                F.lit(
                    "bolson_spark: empty/blank JSON document — the "
                    "strict parse contract rejects documents that are "
                    "not a JSON object"
                )
            ),
        ).when(
            F.size(_unexpected_keys(F.col("_src"), schema)) > 0,
            F.raise_error(
                F.concat(
                    F.lit("bolson_spark: unexpected JSON field(s) "),
                    F.to_json(_unexpected_keys(F.col("_src"), schema)),
                    F.lit(" in document: "),
                    F.col("_src"),
                )
            ),
        ).otherwise(p)
        return staged.select(
            *[c for c in (keep or [])], guard.alias("_parsed")
        ).select(*[c for c in (keep or [])], "_parsed.*")
    out = df.select(*keep_cols, parsed.alias("_parsed")).select(
        *[c for c in (keep or [])], "_parsed.*"
    )
    return out


def parse_json_quarantine(
    df: DataFrame,
    schema: T.StructType,
    column: str = "value",
    *,
    keep: list[str] | None = None,
) -> DataFrame:
    """Dead-letter variant of P1: instead of failing the job on the
    first bad document (the reference's semantics, parse/arrow.cpp:87),
    classify each row and let the caller route it. Production ingest
    pipelines at 100 TB need this — one malformed crawl record must
    not kill a 10-hour job; the reference can afford hard errors only
    because its unit of work is a single TCP stream.

    Adds two columns next to the parsed fields:

    - ``quarantine_reason``: null for clean rows, ``'malformed'`` for
      documents the parser rejects (invalid JSON or schema-type
      mismatch), ``'unexpected_field'`` for valid documents carrying
      out-of-schema top-level keys (UnexpectedFieldBehavior::Error
      re-expressed as routing instead of raising);
    - ``raw`` — the original document for quarantined rows (null
      otherwise), so the dead-letter sink keeps the evidence.

    Parsed fields are NULL on quarantined rows. Single pass, all
    built-in expressions (PERMISSIVE ``from_json`` with a corrupt
    record column + ``json_object_keys``), zero Python.
    """
    src = F.col(column)
    ext = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    parsed = F.from_json(
        src,
        ext,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    keep_cols = [F.col(c) for c in (keep or [])]
    step = df.select(
        *keep_cols,
        src.alias("_src"),
        parsed.alias("_parsed"),
        _unexpected_keys(src, schema).alias("_extra"),
    )
    reason = (
        F.when(
            F.col("_parsed._corrupt_record").isNotNull(), F.lit("malformed")
        )
        .when(F.col("_extra").isNull(), F.lit("malformed"))
        .when(F.size("_extra") > 0, F.lit("unexpected_field"))
        .otherwise(F.lit(None).cast("string"))
    )
    out = step.select(
        *[c for c in (keep or [])],
        *[
            F.when(reason.isNull(), F.col(f"_parsed.{f.name}")).alias(f.name)
            for f in schema.fields
        ],
        reason.alias("quarantine_reason"),
        F.when(reason.isNotNull(), F.col("_src")).alias("raw"),
    )
    return out
