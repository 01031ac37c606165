"""The local mirror of the driver's t2 gate: every registry query must
match its DuckDB oracle at sf0.001 (fast). Run sf0.01 before release:
SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 pytest tests/test_correctness.py
"""

from __future__ import annotations

import os

import pytest

from bolson_spark.oracle import compare_query, duckdb_connection
from bolson_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_matches_oracle(spark, con, name):
    r = compare_query(spark, con, name, SF_DIR)
    assert r.ok, r.detail


def test_registry_rotation_invariants():
    """The driver-coverage rotation must be a pure reordering: every
    spec present exactly once, never-driver-checked names first (the
    driver samples only the first ~50 entries), and the checked set
    self-derived from committed CORRECTNESS artifacts."""
    from bolson_spark.queries import QUERIES, _CHECKED, _NEW_R3_FIRST

    names = list(QUERIES)
    assert len(names) == len(set(names))
    n_unchecked = sum(1 for n in names if n not in _CHECKED)
    # all unchecked names come before all checked names
    assert all(n not in _CHECKED for n in names[:n_unchecked])
    assert all(n in _CHECKED for n in names[n_unchecked:])
    # fresh queries lead while they are unchecked
    lead = [n for n in _NEW_R3_FIRST if n not in _CHECKED]
    assert names[: len(lead)] == lead


def test_compare_all_harness_smoke(spark):
    """compare_all is the verify harness the driver-gate mirror runs
    over the whole registry: it must return one result per requested
    name IN ORDER, report oracle matches as ok, and convert a query
    exception (here: an unknown name) into a failed CompareResult
    instead of aborting the sweep — the later names still run."""
    from bolson_spark.oracle import compare_all

    rs = compare_all(
        spark, SF_DIR, names=["pricing_summary", "no_such_query", "topk_orders"]
    )
    assert [r.name for r in rs] == [
        "pricing_summary", "no_such_query", "topk_orders"
    ]
    assert rs[0].ok and rs[2].ok, [(r.name, r.detail) for r in rs]
    assert not rs[1].ok and "EXCEPTION" in rs[1].detail
