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
