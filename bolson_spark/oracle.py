"""Local differential harness — mirrors the driver's t2 correctness
gate: run each registry query on Spark AND its DuckDB oracle over the
same parquet tables, compare row count, column names, dtype kinds, and
values (order-insensitive). Both sides are fetched THROUGH PANDAS on
purpose: the driver canonicalizes results via pandas before hashing, so
e.g. a DuckDB ``SUM(BIGINT)`` returning HUGEINT silently becomes
float64 there ("123.0" != "123" in the hash) even though the raw SQL
values are identical. Fetching via ``fetchall()`` hid exactly that bug
class in round 1 (convert_pipeline / events_monthly / quality_by_source
hash-fails). Running this locally at sf0.001/sf0.01 before every commit
is what keeps CORRECTNESS_r{N}.json green.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from bolson_spark.queries import QUERIES
from bolson_spark.session import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int = -1
    oracle_rows: int = -1


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Bound the oracle's footprint: DuckDB defaults to 80% of host RAM
    # and all cores, which contends with the live Spark JVM and can OOM
    # the oracle side under peak pressure (observed transiently). The
    # oracle workloads are sf<=0.01 — 8 GB / 8 threads is generous.
    con.execute("SET memory_limit='8GB'")
    con.execute("SET threads=8")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    # numpy scalar -> python scalar first, so int64/float64 normalize
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of the double: bit-identical values -> identical strings
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(str(_norm_cell(x)) for x in v) + "]"
    # pandas represents SQL NULL in object columns as float nan too
    if v != v:  # noqa: PLR0124 — NaN check for odd types
        return "NaN"
    return str(v)


def _dtype_kind(dt) -> str:
    """Collapse dtypes to comparison classes: ints (i/u), floats (f),
    datetimes (M, any unit), booleans (b), everything else object (O).
    int64-vs-float64 is the mismatch class that breaks the driver hash."""
    k = getattr(dt, "kind", "O")
    if k in ("i", "u"):
        return "int"
    return {"f": "float", "M": "datetime", "b": "bool"}.get(k, "object")


def _norm_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare_query(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, name: str, sf_dir: str
) -> CompareResult:
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    s_pdf = sdf.toPandas()
    if spec.oracle is None:
        return CompareResult(
            name, True, f"rows-only ({len(s_pdf)} rows)", len(s_pdf), -1
        )
    o_pdf = con.execute(spec.oracle).df()
    if sorted(s_pdf.columns) != sorted(o_pdf.columns):
        return CompareResult(
            name,
            False,
            "column mismatch: spark=%s oracle=%s"
            % (sorted(s_pdf.columns), sorted(o_pdf.columns)),
            len(s_pdf),
            len(o_pdf),
        )
    if len(s_pdf) != len(o_pdf):
        return CompareResult(
            name, False, "row count mismatch", len(s_pdf), len(o_pdf)
        )
    kind_mism = [
        (c, _dtype_kind(s_pdf[c].dtype), _dtype_kind(o_pdf[c].dtype))
        for c in s_pdf.columns
        if _dtype_kind(s_pdf[c].dtype) != _dtype_kind(o_pdf[c].dtype)
    ]
    if kind_mism:
        return CompareResult(
            name,
            False,
            f"dtype-kind mismatch (driver hash would differ): {kind_mism}",
            len(s_pdf),
            len(o_pdf),
        )
    sn = _norm_rows(s_pdf)
    on = _norm_rows(o_pdf)
    if sn != on:
        diff = next(
            (i for i, (a, b) in enumerate(zip(sn, on)) if a != b), None
        )
        detail = f"value mismatch at sorted row {diff}: spark={sn[diff]} oracle={on[diff]}"
        return CompareResult(name, False, detail, len(s_pdf), len(o_pdf))
    return CompareResult(name, True, "match", len(s_pdf), len(o_pdf))


def compare_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[CompareResult]:
    con = duckdb_connection(sf_dir)
    out = []
    for name in names or list(QUERIES):
        try:
            out.append(compare_query(spark, con, name, sf_dir))
        except Exception as e:  # noqa: BLE001 — harness reports, not raises
            out.append(CompareResult(name, False, f"EXCEPTION: {e!r:.500}"))
    return out
