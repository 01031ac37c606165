"""As-of (backward) join — a time-series operator the reference lacks
(it has no joins at all, SURVEY.md §2.3) but that a streaming/ordering
engine's users need constantly: for each left row, the most recent
right row at-or-before the left timestamp, per key.

Spark has no built-in as-of join, so this is implemented as a
composition of existing DataFrame ops (the preferred path per the
design rules): a tagged UNION of both sides followed by a single
``last(..., ignorenulls=True)`` running window per key. Compared with
the naive "join on key + range, then pick max right ts" plan, this:

- does ONE shuffle (by key) instead of a join shuffle followed by a
  re-aggregation shuffle;
- never materializes the quadratic (left x candidate-rights) blow-up —
  each row is touched once by the window, so a key with 1M left rows
  and 1M right rows costs O(n log n) sort, not O(n^2) pairs;
- scales to 100 TB exactly like any window: partition by key, sort
  within partition (sort-merge machinery, spillable).

Skewed keys behave like any window partition (a single key's rows
must sort within one task); for pathological single-key streams,
pre-split by coarse time bucket and as-of join the bucket boundaries.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_RTS = "__asof_right_ts"
_RVAL = "__asof_right_row"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    how: str = "left",
    tolerance: Optional[Column] = None,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """For each left row, attach `right_cols` from the latest right row
    with ``right[right_ts] <= left[left_ts]`` and equal key(s) `on`.

    how='left' keeps unmatched left rows (right cols null);
    how='inner' drops them. `tolerance` (a Column interval, e.g.
    ``F.expr("INTERVAL 7 DAYS")``) additionally requires
    ``left_ts - tolerance <= right_ts``. `tiebreak`: a right column
    ordered ascending so the largest value wins among equal
    timestamps (deterministic results).
    """
    from pyspark.sql import types as T

    keys = [on] if isinstance(on, str) else list(on)
    for c in right_cols:
        if c in left.columns:
            raise ValueError(f"right column {c!r} collides with left side")
    # tiebreak resolves as a FIELD of the right-payload struct (the
    # atomic-row-carry representation), so it must name one of
    # right_cols — the right timestamp itself already orders via
    # "__ts", so tiebreak == right_ts is redundant and folds away.
    # Validate up front: the struct-field resolution otherwise fails
    # deep in Catalyst with an unresolved-field error that never
    # mentions this constraint.
    if tiebreak is not None and tiebreak not in right_cols:
        if tiebreak == right_ts:
            tiebreak = None  # already the primary "__ts" order key
        else:
            raise ValueError(
                f"tiebreak {tiebreak!r} must be one of right_cols "
                f"{list(right_cols)!r} (it orders equal-timestamp right "
                "rows by a carried payload field; the right timestamp "
                f"column {right_ts!r} needs no tiebreak — it is the "
                "primary order key)"
            )

    # the right-side payload rides as ONE struct so the fill carries
    # the latest right ROW atomically: per-column last(ignorenulls)
    # would back-fill a legitimately-NULL field of the newest right
    # row with a stale value from an OLDER row, producing a mixed row
    # that never existed on the right side
    rval_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(_TAG),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(rval_type).alias(_RVAL),
        F.lit(None).cast(right.schema[right_ts].dataType).alias(_RTS),
    )
    null_left = [c for c in left.columns if c not in keys]
    rhs = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in null_left],
        F.lit(0).alias(_TAG),
        F.col(right_ts).alias("__ts"),
        F.struct(*[F.col(c) for c in right_cols]).alias(_RVAL),
        F.col(right_ts).alias(_RTS),
    ).select(lhs.columns)  # align column order for unionByName safety

    order = [F.col("__ts").asc(), F.col(_TAG).asc()]
    if tiebreak is not None:
        # left rows carry a NULL struct, so the field is NULL there —
        # same nulls-first placement the materialized column had
        order.append(F.col(_RVAL)[tiebreak].asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    # _RVAL (the whole row) and _RTS are both non-null on every right
    # row, so their two last(ignorenulls) windows select the SAME row
    rv = F.last(_RVAL, ignorenulls=True).over(w)
    filled = lhs.unionByName(rhs).select(
        *[c for c in left.columns],
        F.col(_TAG).alias(_TAG),
        *[rv[c].alias(c) for c in right_cols],
        F.last(_RTS, ignorenulls=True).over(w).alias(_RTS),
    )
    out = filled.where(F.col(_TAG) == 1)
    if tolerance is not None:
        in_tol = F.col(_RTS) >= F.col(left_ts) - tolerance
        out = out.select(
            *[c for c in left.columns],
            *[F.when(in_tol, F.col(c)).alias(c) for c in right_cols],
            F.when(in_tol, F.col(_RTS)).alias(_RTS),
        )
    if how == "inner":
        out = out.where(F.col(_RTS).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    return out.drop(_TAG, _RTS)


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    interval: Column,
    count_col: str,
    alias: str = "n_in_range",
) -> DataFrame:
    """Per left row: count right rows with the same key and
    ``left_ts < right_ts <= left_ts + interval``.

    The equi-key `on` makes this a plain shuffled hash/sort-merge join
    with a residual range predicate — Catalyst keeps the equi part as
    the join key, so there is no cross product. For a range join with
    NO equi key, bucket both sides by coarse time bucket first
    (bucket equality becomes the equi key) and union the
    boundary-straddling bucket pair.
    """
    # group by a per-row id, not the left columns alone: duplicate
    # left rows (e.g. retransmitted events without a unique key) must
    # each keep their own output row and count — grouping by values
    # would collapse them into one row with the merged total. The id
    # never reaches the output; the result multiset is deterministic.
    lid = "__rjc_row_id"
    l_ = left.withColumn(lid, F.monotonically_increasing_id()).alias("l")
    r_ = right.alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + interval)
    )
    joined = l_.join(r_, cond, "left")
    return (
        joined.groupBy(
            F.col(f"l.{lid}"), *[F.col(f"l.{c}") for c in left.columns]
        )
        .agg(F.count(F.col(f"r.{count_col}")).alias(alias))
        .drop(lid)
    )
