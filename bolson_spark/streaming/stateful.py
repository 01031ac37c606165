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
