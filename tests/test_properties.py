"""Property-based tests (hypothesis) for the convert pipeline —
the Spark analog of the reference's seeded randomized generation
(SURVEY.md §5.3: GenerateJSONs with schema min/max metadata, seed 0).

Invariants asserted for ARBITRARY inputs, not just the fixture corpus:
- FNC02: one output row per input JSON, across parse → seq → rebatch →
  serialize → deserialize.
- FNC03: information equality after the full IPC roundtrip.
- Envelope: every IPC message holds <= max_rows rows; per-message seq
  ranges are contiguous, non-overlapping, and cover exactly [0, n).
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bolson_spark.operators import (
    add_seq,
    deserialize_ipc,
    parse_json,
    serialize_ipc,
)
from bolson_spark.schemas import BATTERY_SPARK

# battery docs per the reference's generator metadata:
# voltage: list<uint64>, 1..16 items, values 0..2047
# (test/bolson/convert/test_opae_battery.cpp:32-41)
battery_doc = st.lists(
    st.integers(min_value=0, max_value=2047), min_size=1, max_size=16
)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(battery_doc, min_size=1, max_size=200),
    max_rows=st.integers(min_value=1, max_value=64),
)
def test_convert_roundtrip_property(spark, docs, max_rows):
    df = spark.createDataFrame(
        [(i, json.dumps({"voltage": v})) for i, v in enumerate(docs)],
        ["arrival", "value"],
    )
    parsed = parse_json(df, BATTERY_SPARK, "value", keep=["arrival"])
    seqd = (
        add_seq(parsed, "arrival")
        .drop("arrival")
        .repartitionByRange(2, F.col("bolson_seq"))
        .sortWithinPartitions("bolson_seq")
    )
    ser = serialize_ipc(seqd, max_rows=max_rows).cache()
    msgs = ser.collect()
    n = len(docs)
    # envelope invariants
    assert all(m.num_rows <= max_rows for m in msgs)
    assert sum(m.num_rows for m in msgs) == n  # FNC02
    assert all(m.seq_last - m.seq_first + 1 == m.num_rows for m in msgs)
    spans = sorted((m.seq_first, m.seq_last) for m in msgs)
    assert spans[0][0] == 0 and spans[-1][1] == n - 1
    for (_, a1), (b0, _) in zip(spans, spans[1:]):
        assert b0 == a1 + 1
    # FNC03 information equality through the full roundtrip
    back = deserialize_ipc(
        ser, "bolson_seq bigint, voltage array<bigint>"
    ).collect()
    ser.unpersist()
    got = {r.bolson_seq: list(r.voltage) for r in back}
    assert got == {i: v for i, v in enumerate(docs)}


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1, max_size=40,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 999)),
        min_size=0, max_size=40,
    ),
)
def test_asof_join_matches_naive_reference(spark, left, right):
    """Differential property test: the one-shuffle union+window as-of
    join must equal the obvious quadratic definition (max-ts right row
    per left row, largest tiebreak id among ties) on arbitrary data."""
    from bolson_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k int, lts int, lid int"
    )
    rdf = spark.createDataFrame(right, "k int, rts int, rid int")
    got = {
        r.lid: r.rid
        for r in asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts",
            right_cols=["rid"], tiebreak="rid",
        ).collect()
    }
    expect = {}
    for lid, (k, t) in enumerate(left):
        cands = [(rt, rid) for (rk, rt, rid) in right if rk == k and rt <= t]
        expect[lid] = max(cands)[1] if cands else None
    assert got == expect
