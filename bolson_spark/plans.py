"""Physical-plan inspection helpers — used by tests and bench to assert
the plans we want at scale (filter/column pushdown into the parquet
scan, broadcast joins for small dims, whole-stage codegen coverage)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}


def assert_pushdown(df: DataFrame, column: str) -> None:
    """Assert a filter on `column` reached the parquet scan."""
    plan = formatted_plan(df)
    scans = [
        seg for seg in plan.split("\n\n") if "Scan parquet" in seg
    ]
    ok = any(("PushedFilters" in s and column in s) for s in scans)
    if not ok:
        raise AssertionError(
            f"no pushed filter on {column}; plan:\n{plan[:4000]}"
        )
