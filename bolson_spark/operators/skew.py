"""Skew-handling join/aggregation utilities.

AQE's runtime skew-join handling (enabled in session.py) splits
oversized post-shuffle partitions automatically, but it only engages
for sort-merge/shuffled-hash joins in batch mode. These helpers are
the EXPLICIT salting pattern for the cases AQE can't rewrite:
stream-stream or stream-static joins, aggregations whose single hot
key swamps one reducer, and plans where the skew is known up front
(a head vocabulary token, a null-heavy foreign key).

Semantics are exactly the unsalted equivalents — tests assert result
equality — only the shuffle key distribution changes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__bolson_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Equi-join where `left` is the skewed fact side: each left row
    gets a uniform salt in [0, salt); `right` is replicated `salt`
    times; the join key becomes (key..., salt). A hot key's rows now
    spread over `salt` reducers instead of one. Cost: `salt`× the
    build side — use for a SMALL-but-not-broadcastable right side, and
    keep `salt` near the executor-count / skew factor, not higher.

    Supported `how`: inner / left / left_outer (the fact side must be
    the salted one for outer semantics to hold).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    lsalted = left.withColumn(
        _SALT, (F.rand(seed) * salt).cast("int")
    )
    rrepl = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lsalted.join(rrepl, keys + [_SALT], how)
    return out.drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate
    by (keys..., salt), then final aggregate by keys. Supports the
    re-aggregatable functions sum / count / min / max (count re-folds
    as sum). Spark's map-side partial aggregation already mitigates
    most skew; reach for this when the hot key's PARTIAL results are
    still too large for one reducer (e.g. very wide partial state).

    `aggs`: {column: fn} with fn in {"sum","count","min","max"}.
    Output column names are `{fn}_{column}` (e.g. sum_value).
    """
    refold = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for col, fn in aggs.items():
        if fn not in refold:
            raise ValueError(f"{fn!r} is not re-aggregatable")
    ks = list(keys)
    salted = df.withColumn(_SALT, (F.rand(seed) * salt).cast("int"))
    partial = salted.groupBy(*ks, _SALT).agg(
        *[
            getattr(F, fn)(col).alias(f"{fn}_{col}")
            for col, fn in aggs.items()
        ]
    )
    final = partial.groupBy(*ks).agg(
        *[
            getattr(F, refold[fn])(f"{fn}_{col}").alias(f"{fn}_{col}")
            for col, fn in aggs.items()
        ]
    )
    return final
