"""Local differential harness — mirrors the driver's t2 correctness
gate: run each registry query on Spark AND its DuckDB oracle over the
same parquet tables, compare row count, column names, and values
(order-insensitive). Running this locally at sf0.001/sf0.01 before
every commit is what keeps CORRECTNESS_r{N}.json green.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
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
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of the double: bit-identical values -> identical strings
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(str(_norm_cell(x)) for x in v) + "]"
    return str(v)


def _norm_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare_query(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, name: str, sf_dir: str
) -> CompareResult:
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        return CompareResult(
            name, True, f"rows-only ({len(s_rows)} rows)", len(s_rows), -1
        )
    res = con.execute(spec.oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    if sorted(s_cols) != sorted(o_cols):
        return CompareResult(
            name,
            False,
            f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}",
            len(s_rows),
            len(o_rows),
        )
    if len(s_rows) != len(o_rows):
        return CompareResult(
            name, False, "row count mismatch", len(s_rows), len(o_rows)
        )
    sn = _norm_rows(s_cols, s_rows)
    on = _norm_rows(o_cols, o_rows)
    if sn != on:
        diff = next(
            (i for i, (a, b) in enumerate(zip(sn, on)) if a != b), None
        )
        detail = f"value mismatch at sorted row {diff}: spark={sn[diff]} oracle={on[diff]}"
        return CompareResult(name, False, detail, len(s_rows), len(o_rows))
    return CompareResult(name, True, "match", len(s_rows), len(o_rows))


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
