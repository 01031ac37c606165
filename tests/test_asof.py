"""Unit tests for the as-of / range join operators (operators/asof.py).

The reference has no joins at all (SURVEY.md §2.3); as-of is part of
the extension surface. Semantics under test: backward inclusive match,
left vs inner, tolerance window, deterministic tiebreak.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bolson_spark.operators.asof import asof_join, range_join_count


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts(2), 100.0),
            ("A", _ts(5), 101.0),
            ("B", _ts(3), 50.0),
            ("C", _ts(4), 7.0),  # key with no quotes at all
        ],
        "sym string, t_ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(1), 99.0),
            ("A", _ts(2), 100.5),  # same-instant quote: backward INCLUSIVE
            ("A", _ts(4), 100.9),
            ("B", _ts(4), 51.0),  # after B's only trade -> no match
        ],
        "sym string, q_ts timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward_inclusive(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_ts="t_ts", right_ts="q_ts",
        right_cols=["bid"], how="left",
    )
    rows = {(r.sym, r.t_ts.day): r.bid for r in out.collect()}
    assert rows[("A", 2)] == 100.5  # same-timestamp quote matches
    assert rows[("A", 5)] == 100.9  # latest prior quote
    assert rows[("B", 3)] is None   # only later quotes exist
    assert rows[("C", 4)] is None   # no quotes for key
    assert out.count() == trades.count()  # left join keeps all rows


def test_asof_inner_drops_unmatched(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_ts="t_ts", right_ts="q_ts",
        right_cols=["bid"], how="inner",
    )
    assert {(r.sym, r.t_ts.day) for r in out.collect()} == {("A", 2), ("A", 5)}


def test_asof_tolerance_window(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_ts="t_ts", right_ts="q_ts",
        right_cols=["bid"], how="left",
        tolerance=F.expr("INTERVAL 1 DAY"),
    )
    rows = {(r.sym, r.t_ts.day): r.bid for r in out.collect()}
    assert rows[("A", 2)] == 100.5  # within 1 day
    assert rows[("A", 5)] == 100.9  # day-4 quote within 1 day of day-5
    assert rows[("B", 3)] is None


def test_asof_tiebreak_is_deterministic(spark):
    left = spark.createDataFrame(
        [(1, _ts(5))], "k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(3), 10), (1, _ts(3), 30), (1, _ts(3), 20)],
        "k int, rts timestamp, rid int",
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_cols=["rid"], tiebreak="rid",
    )
    assert out.collect()[0].rid == 30  # largest tiebreak wins


def test_asof_rejects_column_collision(spark, trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="collides"):
        asof_join(
            trades, quotes.withColumnRenamed("bid", "price"),
            on="sym", left_ts="t_ts", right_ts="q_ts", right_cols=["price"],
        )


def test_range_join_count(spark):
    left = spark.createDataFrame(
        [(1, _ts(1), "s1"), (2, _ts(10), "s2")],
        "u int, lts timestamp, sid string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(1), 100),   # not counted: strictly-after required
            (1, _ts(2), 101),
            (1, _ts(8), 102),   # exactly at +7d boundary -> counted
            (1, _ts(9), 103),   # beyond window
            (2, _ts(11), 104),
        ],
        "u int, rts timestamp, rid int",
    )
    out = range_join_count(
        left, right, on="u", left_ts="lts", right_ts="rts",
        interval=F.expr("INTERVAL 7 DAYS"), count_col="rid",
    )
    rows = {r.sid: r.n_in_range for r in out.collect()}
    assert rows == {"s1": 2, "s2": 1}


def test_asof_plan_has_single_shuffle(spark, trades_quotes):
    """Scale property: the union+window as-of join shuffles ONCE (by
    key) — no join exchange + re-aggregation pair."""
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_ts="t_ts", right_ts="q_ts",
        right_cols=["bid"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1


def test_asof_carries_latest_right_row_atomically(spark):
    """A legitimately-NULL field in the newest right row must NOT be
    back-filled from an older right row: the as-of result is the
    latest right ROW, not a per-column mosaic of last non-null values
    (per-column last(ignorenulls) produced rows that never existed on
    the right side)."""
    left = spark.createDataFrame(
        [(1, _ts(3), "L")], "k int, lts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts(1), 5, 1), (1, _ts(2), None, 2)],
        "k int, rts timestamp, a int, b int",
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_cols=["a", "b"],
    ).collect()
    assert len(out) == 1
    # the ts=2 row is the match: a is NULL there, b is 2 — a=5 from
    # the ts=1 row must not leak in
    assert out[0].a is None and out[0].b == 2


def test_range_join_count_preserves_duplicate_left_rows(spark):
    """Two identical left rows each get their own output row and their
    own count — grouping by left VALUES would collapse them into one
    row with the merged total."""
    left = spark.createDataFrame(
        [(1, _ts(1)), (1, _ts(1))], "u int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 10), (1, _ts(3), 11)], "u int, rts timestamp, rid int"
    )
    out = range_join_count(
        left, right, on="u", left_ts="lts", right_ts="rts",
        interval=F.expr("INTERVAL 7 DAYS"), count_col="rid",
    ).collect()
    assert sorted(r.n_in_range for r in out) == [2, 2]
    assert len(out) == 2


def test_asof_tiebreak_must_name_a_right_col(spark, trades_quotes):
    """tiebreak resolves as a field of the carried right-row struct, so
    a name outside right_cols must fail LOUDLY up front (not as an
    unresolved-field AnalysisError deep in Catalyst) — except the
    right timestamp itself, which is already the primary order key and
    quietly folds away."""
    import pytest

    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="right_cols"):
        asof_join(
            trades, quotes, on="sym", left_ts="t_ts", right_ts="q_ts",
            right_cols=["bid"], tiebreak="no_such_col",
        )
    # tiebreak == right_ts: allowed, equivalent to no tiebreak
    a = asof_join(
        trades, quotes, on="sym", left_ts="t_ts", right_ts="q_ts",
        right_cols=["bid"], tiebreak="q_ts",
    )
    b = asof_join(
        trades, quotes, on="sym", left_ts="t_ts", right_ts="q_ts",
        right_cols=["bid"],
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
