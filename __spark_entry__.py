"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship convert pipeline (parse -> seq ->
rebatch -> per-batch aggregates) at sf0.001. ``queries()``/``oracle_sql()``
expose the full registry in ``bolson_spark.queries`` — one entry per
implemented operator from SURVEY.md §2 plus the extended analytics
surface (relational, text, dedup, similarity, multimodal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bolson_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["convert_pipeline"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops -> driver records a rows-only check)."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
