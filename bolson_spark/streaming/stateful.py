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


def _running_stats_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for `key` into the running
    (count, sum, min, max) state and emit the updated totals."""
    n, s, mn, mx = (
        state.get if state.exists else (0, 0.0, float("inf"), float("-inf"))
    )
    for pdf in pdfs:
        v = pdf["value"]
        n += int(v.count())
        s += float(v.sum())
        if len(v):
            mn = min(mn, float(v.min()))
            mx = max(mx, float(v.max()))
    state.update((n, s, mn, mx))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "min_value": [mn],
            "max_value": [mx],
        }
    )


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
            if self._state.exists():
                n, s, mn, mx = self._state.get()
            else:
                n, s, mn, mx = 0, 0.0, float("inf"), float("-inf")
            for pdf in rows:
                v = pdf["value"]
                n += int(v.count())
                s += float(v.sum())
                if len(v):
                    mn = min(mn, float(v.min()))
                    mx = max(mx, float(v.max()))
            self._state.update((n, s, mn, mx))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n_events": [n],
                    "sum_value": [s],
                    "min_value": [mn],
                    "max_value": [mx],
                }
            )

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

SESSIONIZE_GAP_MIN = 60  # same gap as queries_ext.SESSION_GAP_MIN

SESSIONIZE_OUTPUT = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint, sum_value double"
)
SESSIONIZE_STATE = (
    "session_start_us bigint, last_us bigint, n_events bigint, "
    "sum_value double"
)


def _sessionize_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events (sorted by event time) into the open
    session for `key`; emit every session CLOSED by a gap, keep the
    trailing open session in state, and close it via event-time
    timeout when the watermark passes last_us + gap."""
    gap_us = SESSIONIZE_GAP_MIN * 60 * 1_000_000
    closed: list[tuple[int, int, int, int, float]] = []
    cur = list(state.get) if state.exists else None
    if state.hasTimedOut:
        # watermark passed last_us + gap: the open session is final
        if cur is not None:
            closed.append((key[0], cur[0], cur[1], cur[2], cur[3]))
        state.remove()
    else:
        frames = list(pdfs)
        ev = pd.concat(frames) if frames else pd.DataFrame()
        if len(ev):
            ev = ev.sort_values("us", kind="stable")
            for us, value in zip(ev["us"], ev["value"]):
                us = int(us)
                if cur is None:
                    cur = [us, us, 0, 0.0]
                elif us - cur[1] > gap_us:
                    closed.append((key[0], cur[0], cur[1], cur[2], cur[3]))
                    cur = [us, us, 0, 0.0]
                # a late-but-within-watermark event can arrive BELOW
                # the open session's bounds (cross-batch disorder) —
                # fold it in without regressing either boundary or the
                # timeout timer (min/max, never overwrite)
                cur[0] = min(cur[0], us)
                cur[1] = max(cur[1], us)
                cur[2] += 1
                cur[3] += float(value)
        if cur is not None:
            state.update(tuple(cur))
            # timeout fires once the WATERMARK (not wall clock) passes
            # this instant — late events inside the watermark can still
            # extend the session first. If other keys already advanced
            # the watermark past last+gap (this session is ALREADY
            # gap-expired), clamp forward: Spark rejects timestamps
            # behind the watermark, and the clamped timer fires at the
            # very next trigger, which is the earliest legal close.
            desired_ms = cur[1] // 1000 + gap_us // 1000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(desired_ms, wm_ms + 1))
    yield pd.DataFrame(
        closed,
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
    once, when it CLOSES — either a later event arrives past the gap,
    or the event-time watermark passes last-event + gap (idle
    sessions cannot pin state forever, the unbounded-stream
    requirement). Identical session boundaries to the batch
    `sessionize_events` query (parity-tested on the closed set).

    Scale posture: state is one O(1) tuple per OPEN session (active
    users, not events); the per-micro-batch shuffle keys by user_id —
    the same single-shuffle shape as the batch twin, amortized over
    the stream.
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
