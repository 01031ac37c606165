"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only cross-batch state is the running sequence counter
(src/bolson/parse/parser.cpp:49-60, maintained per TCP session); the
convert pipeline carries that in ``foreachBatch`` (restart-safe batch
arithmetic, streaming/pipeline.py). This module provides the GENERAL
mechanism a training-data pipeline needs beyond that: arbitrary
per-key state folded across micro-batches with explicit timeout
semantics — Spark's ``applyInPandasWithState`` is the
``mapGroupsWithState``-class primitive exposed to Python/Arrow.

Scale posture: state lives in the state store, partitioned by the
grouping key (one shuffle on key per micro-batch); each key's state is
O(1) here (count/sum/min/max), so state size grows with distinct keys,
not with events — the shape that survives unbounded streams. Skewed
hot keys are the caveat; salt the key and merge downstream if one key
dominates.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_OUTPUT = (
    "key string, n_events bigint, sum_value double, min_value double, "
    "max_value double"
)
RUNNING_STATS_STATE = (
    "n_events bigint, sum_value double, min_value double, max_value double"
)


_STATS_INIT = (0, 0.0, float("inf"), float("-inf"))


def _fold_stats(totals, pdfs):
    """The ONE running-stats fold shared by the applyInPandasWithState
    and transformWithState twins — duplicating it would let a fix land
    in one twin and silently miss the other, exactly the drift the
    differential-twin pattern exists to prevent.

    Guards on v.count() (non-null values), not len(v): an all-NULL
    frame has len > 0 but v.min() is NaN, and Python's
    min(inf, nan) keeps inf — the sentinel would leak into state and
    output as Infinity."""
    n, s, mn, mx = totals
    for pdf in pdfs:
        v = pdf["value"]
        c = int(v.count())
        if c:
            n += c
            s += float(v.sum())
            mn = min(mn, float(v.min()))
            mx = max(mx, float(v.max()))
    return n, s, mn, mx


def _stats_row(key, totals):
    n, s, mn, mx = totals
    return pd.DataFrame(
        {
            "key": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "min_value": [mn],
            "max_value": [mx],
        }
    )


def _running_stats_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for `key` into the running
    (count, sum, min, max) state and emit the updated totals. A key
    that has seen no non-null value yet emits nothing (there is no
    measurement to report — emitting would surface the inf/-inf
    fold sentinels)."""
    totals = _fold_stats(
        state.get if state.exists else _STATS_INIT, pdfs
    )
    state.update(totals)
    if totals[0]:
        yield _stats_row(key, totals)


def running_stats(
    stream_df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum, min, max) across micro-batches.

    Input: a STREAMING DataFrame with `key_col` and a numeric
    `value_col`. Output: one updated row per key per micro-batch in
    which the key appeared (output mode "update"). State never times
    out (NoTimeout) — totals are for the stream's lifetime, like the
    reference's jsons_received/publish_count counters
    (stream.cpp:168-178) generalized per key.
    """
    from pyspark.sql import functions as F

    keyed = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _running_stats_fn,
        outputStructType=RUNNING_STATS_OUTPUT,
        stateStructType=RUNNING_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState twin (Spark 4.x stateful API)
# ---------------------------------------------------------------------------
#
# Spark 4 introduces transformWithStateInPandas — the successor API to
# applyInPandasWithState with typed state variables, timers, and state
# schema evolution. `running_stats_tws` is the SAME logical operator on
# the new primitive, kept as a differential twin the way the parse/seq/
# minhash operators carry two physical implementations. Same scale
# posture: state-store partitioned by key, O(1) state per key.
#
# Env gate: the transformWithState Python state client requires the
# google.protobuf package (it speaks protobuf to the JVM state server);
# in containers without it the driver worker fails at import. The
# equality test (tests/test_streaming.py::test_stateful_tws_twin_matches)
# importorskips on that — the operator code itself has no extra deps.


def running_stats_tws(
    stream_df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum, min, max) via
    ``transformWithStateInPandas`` — identical semantics to
    :func:`running_stats` (tested equal)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", RUNNING_STATS_STATE
            )

        def handleInputRows(self, key, rows, timerValues):
            # the fold itself is _fold_stats — shared with the
            # applyInPandasWithState twin so the two cannot drift
            totals = _fold_stats(
                tuple(self._state.get())
                if self._state.exists()
                else _STATS_INIT,
                rows,
            )
            self._state.update(totals)
            if totals[0]:
                yield _stats_row(key, totals)

        def close(self) -> None:
            pass

    keyed = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        statefulProcessor=_RunningStats(),
        outputStructType=RUNNING_STATS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Streaming gap sessionization (the stateful twin of the batch
# `sessionize_events` registry query)
# ---------------------------------------------------------------------------

from bolson_spark import SESSION_GAP_MIN as SESSIONIZE_GAP_MIN  # noqa: E402
# (one definition — the batch query, oracle, and this twin share it)

SESSIONIZE_OUTPUT = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint, sum_value double"
)
# State = ALL non-final sessions for the key as parallel arrays
# (disjoint, sorted by start, adjacent sessions separated by > gap).
# A session is held here until the WATERMARK passes its end + gap —
# emitting earlier would be premature: a late-but-within-watermark
# event may still belong to it (extend it, or bridge it with the next
# session). Spark's own session_window append mode finalizes on the
# same condition for the same reason.
SESSIONIZE_STATE = (
    "starts array<bigint>, ends array<bigint>, ns array<bigint>, "
    "sums array<double>"
)


def _sessionize_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge this batch's events into the key's pending-session set,
    then emit (finalize) exactly the sessions the watermark has passed.

    Merge step: pending sessions and new events are swept together as
    intervals sorted by start; an item within `gap` of the running
    interval folds in (end = max, counts/sums add), otherwise it opens
    a new interval. Because pending sessions are separated by > gap,
    two sessions only ever merge when a new (late) event bridges them
    — so out-of-order arrival within the watermark converges to the
    exact batch sessionization, including events that arrive after a
    later session has already opened.

    Finalize step: a session is emitted iff session_end + gap <
    watermark. Events behind the watermark are DROPPED here first —
    unlike windowed aggregations, arbitrary stateful ops do NOT get
    automatic late-row filtering from Spark, and an accepted
    behind-watermark event could belong to an already-emitted session.
    With the drop, no accepted event can be within `gap` of a
    finalized session (merge requires ts <= end + gap < watermark) —
    emitted sessions are immutable-final, never revised. This is the
    same drop rule Spark applies to its own session_window
    aggregation."""
    gap_us = SESSIONIZE_GAP_MIN * 60 * 1_000_000
    wm_ms = state.getCurrentWatermarkMs()
    wm_us = wm_ms * 1000
    if state.exists:
        starts, ends, ns, sums = state.get
        sessions = [
            [int(s), int(e), int(n), float(v)]
            for s, e, n, v in zip(starts, ends, ns, sums)
        ]
    else:
        sessions = []
    frames = [] if state.hasTimedOut else list(pdfs)
    ev = pd.concat(frames) if frames else None
    if ev is not None and len(ev):
        ev = ev[ev["us"] >= wm_us]  # late beyond watermark: dropped
    if ev is not None and len(ev):
        items = sessions + [
            [int(us), int(us), 1, float(v)]
            for us, v in zip(ev["us"], ev["value"])
        ]
        items.sort(key=lambda it: (it[0], it[1]))
        merged: list[list] = []
        for it in items:
            if merged and it[0] - merged[-1][1] <= gap_us:
                last = merged[-1]
                last[1] = max(last[1], it[1])
                last[2] += it[2]
                last[3] += it[3]
            else:
                merged.append(it)
        sessions = merged
    final = [s for s in sessions if s[1] + gap_us < wm_us]
    pending = [s for s in sessions if s[1] + gap_us >= wm_us]
    if pending:
        state.update(
            (
                [s[0] for s in pending],
                [s[1] for s in pending],
                [s[2] for s in pending],
                [s[3] for s in pending],
            )
        )
        # Fire when the watermark passes the EARLIEST pending close
        # point (end + gap); ms floor is safe — the timer fires when
        # wm_ms > timer_ms, i.e. wm_us > end + gap. Clamp to wm + 1:
        # Spark rejects timers behind the watermark, and the clamped
        # timer fires at the very next trigger, the earliest legal
        # close for an already-expired session (finalization re-checks
        # against the actual watermark either way).
        desired_ms = min(s[1] for s in pending) // 1000 + gap_us // 1000
        state.setTimeoutTimestamp(max(desired_ms, wm_ms + 1))
    else:
        state.remove()
    yield pd.DataFrame(
        [(key[0], s[0], s[1], s[2], s[3]) for s in final],
        columns=[
            "user_id",
            "session_start_us",
            "session_end_us",
            "n_events",
            "sum_value",
        ],
    )


def sessionize_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming gap-based sessionization: emits each user session
    exactly once, when the event-time WATERMARK passes its end + gap —
    the earliest moment the session is provably final (no event that
    could still extend or bridge it can arrive afterwards, since rows
    behind the watermark are dropped). Gap-crossing arrivals alone do
    NOT emit: a late-but-within-watermark event may still belong to
    the earlier session, so it is held in state and merged on arrival
    — identical session boundaries to the batch `sessionize_events`
    query under ANY within-watermark arrival order (parity-tested,
    including cross-gap late arrivals). Idle sessions close via
    event-time timers, so state cannot grow unboundedly on an
    unbounded stream.

    Scale posture: state is one O(1) tuple per NON-FINAL session —
    bounded by (active users) x (sessions per watermark delay), not by
    events; the per-micro-batch shuffle keys by user_id — the same
    single-shuffle shape as the batch twin, amortized over the stream.
    """
    from pyspark.sql import functions as F

    keyed = stream_df.withWatermark(ts_col, watermark).select(
        F.col(user_col).cast("bigint").alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSIONIZE_OUTPUT,
        stateStructType=SESSIONIZE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
