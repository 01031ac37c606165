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
