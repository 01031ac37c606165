"""Core conversion operator tests, mirroring the reference's FNC
requirements (test/bolson/convert/test_convert.h tags cited inline)."""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F

from bolson_spark import MAX_ROWS_DEFAULT
from bolson_spark.operators import (
    add_seq,
    add_seq_scalable,
    batch_stats,
    deserialize_ipc,
    parse_json,
    parse_json_arrow,
    serialize_ipc,
    validate_no_unexpected_fields,
)
from bolson_spark.schemas import (
    BATTERY_SPARK,
    EVENT_PROPS_SPARK,
    TRIP_FIXED_LIST_SIZES,
    TRIP_SPARK,
)


# --- P1 parse -------------------------------------------------------------


def test_parse_battery_schema(spark):
    """FNC02: one row per JSON; battery list field parsed losslessly."""
    rng = random.Random(0)
    docs = [
        {"voltage": [rng.randint(0, 2047) for _ in range(rng.randint(1, 16))]}
        for _ in range(100)
    ]
    df = spark.createDataFrame([(json.dumps(d),) for d in docs], ["value"])
    out = parse_json(df, BATTERY_SPARK, "value").collect()
    assert len(out) == len(docs)  # FNC02
    got = sorted(tuple(r.voltage) for r in out)
    want = sorted(tuple(d["voltage"]) for d in docs)
    assert got == want  # FNC03 information equality


def test_parse_trip_schema_and_fixed_list_sizes(spark):
    """FNC04/05/07: trip types; fixed_size_list lengths enforced in test."""
    rng = random.Random(1)

    def trip():
        d = {}
        for f in TRIP_SPARK.fields:
            n = TRIP_FIXED_LIST_SIZES.get(f.name)
            if n is not None:
                d[f.name] = [rng.randint(1, 99) for _ in range(n)]
            elif f.dataType.typeName() == "boolean":
                d[f.name] = rng.random() < 0.5
            elif f.name == "timestamp":
                d[f.name] = "2005-09-09 11:59:06"
            else:
                d[f.name] = rng.randint(1, 99)
        return d

    docs = [trip() for _ in range(20)]
    df = spark.createDataFrame([(json.dumps(d),) for d in docs], ["value"])
    out = parse_json(df, TRIP_SPARK, "value")
    # timestamp stays a string (FNC05)
    assert dict(out.dtypes)["timestamp"] == "string"
    rows = out.collect()
    assert len(rows) == 20
    for name, size in TRIP_FIXED_LIST_SIZES.items():
        lens = out.select(F.size(name).alias("n")).distinct().collect()
        assert [r.n for r in lens] == [size], name


def test_parse_strict_rejects_unexpected_field(spark):
    """parse/arrow.cpp:87-88 — out-of-schema key is a hard error."""
    df = spark.createDataFrame([('{"k": 1}',), ('{"k": 2, "zz": 3}',)], ["value"])
    with pytest.raises(Exception, match="unexpected JSON field"):
        parse_json(df, EVENT_PROPS_SPARK, "value", strict=True).collect()
    # lenient mode ignores it
    assert sorted(
        r.k for r in parse_json(df, EVENT_PROPS_SPARK, "value", strict=False).collect()
    ) == [1, 2]
    # and the audit query pinpoints the offender
    bad = validate_no_unexpected_fields(df, "value", EVENT_PROPS_SPARK).collect()
    assert len(bad) == 1


def test_parse_failfast_on_malformed(spark):
    df = spark.createDataFrame([('{"k": 1}',), ("{broken",)], ["value"])
    with pytest.raises(Exception):
        parse_json(df, EVENT_PROPS_SPARK, "value", strict=False).collect()


def test_parse_dual_execution_equal(spark):
    """P1 dual execution: the Catalyst from_json impl and the Arrow C++
    JSON TableReader impl (parse/arrow.cpp:72-93) produce identical
    results — the reference's CPU-vs-FPGA differential pattern
    (test/bolson/convert/test_opae_battery.cpp:73-88)."""
    rng = random.Random(7)
    docs = [
        {"voltage": [rng.randint(0, 2047) for _ in range(rng.randint(1, 16))]}
        for _ in range(500)
    ]
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(docs)], ["doc_id", "value"]
    ).repartition(4)
    a = parse_json(df, BATTERY_SPARK, "value", strict=True, keep=["doc_id"])
    b = parse_json_arrow(df, BATTERY_SPARK, "value", strict=True, keep=["doc_id"])
    ra = sorted((r.doc_id, tuple(r.voltage)) for r in a.collect())
    rb = sorted((r.doc_id, tuple(r.voltage)) for r in b.collect())
    assert ra == rb


def test_parse_arrow_strict_and_malformed(spark):
    """The Arrow twin enforces the same hard-error semantics: unexpected
    top-level field (UnexpectedFieldBehavior::Error) and malformed JSON
    both fail the batch."""
    bad = spark.createDataFrame([('{"k": 2, "zz": 3}',)], ["value"])
    with pytest.raises(Exception, match="JSON parse error|unexpected"):
        parse_json_arrow(bad, EVENT_PROPS_SPARK, "value", strict=True).collect()
    # lenient mode ignores the extra field
    assert [
        r.k
        for r in parse_json_arrow(
            bad, EVENT_PROPS_SPARK, "value", strict=False
        ).collect()
    ] == [2]
    broken = spark.createDataFrame([("{broken",)], ["value"])
    with pytest.raises(Exception):
        parse_json_arrow(broken, EVENT_PROPS_SPARK, "value").collect()


def test_parse_arrow_rejects_blank_documents(spark):
    """Arrow's JSON reader silently SKIPS blank lines, shrinking the
    batch: with keep columns that used to surface as an opaque
    from_arrays length mismatch, with keep=[] it silently DROPPED the
    row — where the catalyst FAILFAST twin raises. Both parsers must
    reject empty/whitespace documents loudly."""
    from bolson_spark.operators import parse_json

    for doc in ("", "   "):
        # coalesce(1): the mixed batch exercises the row-count check
        # (an all-blank batch trips Arrow's own "Empty JSON file")
        blank = spark.createDataFrame(
            [('{"k": 1}',), (doc,)], ["value"]
        ).coalesce(1)
        with pytest.raises(
            Exception, match="empty/blank|JSON parse|Empty JSON"
        ):
            parse_json_arrow(blank, EVENT_PROPS_SPARK, "value").collect()
        with pytest.raises(Exception):
            parse_json(blank, EVENT_PROPS_SPARK, "value").collect()


# --- P4 seq ---------------------------------------------------------------


def test_add_seq_contiguous(spark):
    df = spark.range(0, 5000).select((F.col("id") * 7 % 4999).alias("key"))
    out = add_seq(df, "key").select("bolson_seq").collect()
    seqs = sorted(r.bolson_seq for r in out)
    assert seqs == list(range(len(seqs)))


def test_add_seq_scalable_matches_global(spark):
    df = spark.range(0, 20000).select(F.col("id").alias("key")).repartition(16)
    a = add_seq(df, "key").select("key", "bolson_seq").collect()
    b = add_seq_scalable(df, "key").select("key", "bolson_seq").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_add_seq_scalable_deterministic_without_aqe(spark):
    """Regression: the bucket ids MUST be identical across the counts
    pass and the numbering pass. A repartitionByRange-based scheme
    breaks here — runtime range-sampling reseeds per action, so two
    actions can partition rows differently (masked at toy scale by AQE
    coalescing every shuffle to one partition). Literal boundaries make
    the passes agree by construction, so this holds with AQE off and
    skewed, shuffled input."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = spark.range(0, 50000).select(
            ((F.col("id") * F.col("id")) % 999983).alias("key")
        ).distinct().repartition(16)
        for _ in range(2):
            out = add_seq_scalable(df, "key").select("key", "bolson_seq")
            rows = out.collect()
            seqs = sorted(r.bolson_seq for r in rows)
            assert seqs == list(range(len(rows)))  # contiguous, 0-based
            # seq order == key order
            by_seq = sorted(rows, key=lambda r: r.bolson_seq)
            keys = [r.key for r in by_seq]
            assert keys == sorted(keys)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_seq_column_prepended_at_index_zero(spark):
    """parse/arrow.cpp:155 — bolson_seq is ADDED AT COLUMN INDEX 0, not
    appended, in both physical implementations."""
    df = spark.range(0, 100).select(
        F.col("id").alias("key"), F.lit("x").alias("payload")
    )
    assert add_seq(df, "key").columns == ["bolson_seq", "key", "payload"]
    assert add_seq_scalable(df, "key").columns == [
        "bolson_seq",
        "key",
        "payload",
    ]


def test_seq_metadata_mode(spark):
    """parse/parser.cpp:34-47 (AddSeqAsSchemaMeta) — with seq_column
    off, each outgoing IPC message carries bolson_seq_first/last as
    Arrow schema metadata instead of a physical column."""
    import pyarrow as pa

    df = (
        add_seq(spark.range(1000).select(F.col("id").alias("key")), "key")
        .repartitionByRange(2, "bolson_seq")
        .sortWithinPartitions("bolson_seq")
    )
    msgs = serialize_ipc(df, max_rows=256, seq_mode="metadata").collect()
    assert sum(m.num_rows for m in msgs) == 1000
    spans = []
    for m in msgs:
        with pa.ipc.open_stream(m.payload) as reader:
            batches = list(reader)
            meta = reader.schema.metadata
        assert reader.schema.names == ["key"]  # seq column dropped
        lo = int(meta[b"bolson_seq_first"])
        hi = int(meta[b"bolson_seq_last"])
        assert (lo, hi) == (m.seq_first, m.seq_last)
        assert sum(b.num_rows for b in batches) == hi - lo + 1
        spans.append((lo, hi))
    spans.sort()
    assert spans[0][0] == 0 and spans[-1][1] == 999
    for (_, a1), (b0, _) in zip(spans, spans[1:]):
        assert b0 == a1 + 1


# --- R1 rebatch -----------------------------------------------------------


def test_rebatch_invariants(spark):
    """resizer.cpp:21-50: slices <= max_rows, contiguous, partition the
    input seq range."""
    n = 10_000
    df = add_seq(spark.range(n).select(F.col("id").alias("key")), "key")
    stats = batch_stats(df, max_rows=MAX_ROWS_DEFAULT).collect()
    assert all(r.rows <= MAX_ROWS_DEFAULT for r in stats)
    assert all(r.seq_last - r.seq_first + 1 == r.rows for r in stats)
    ordered = sorted(stats, key=lambda r: r.seq_first)
    assert ordered[0].seq_first == 0
    for prev, cur in zip(ordered, ordered[1:]):
        assert cur.seq_first == prev.seq_last + 1
    assert sum(r.rows for r in stats) == n


# --- Z1 serialize ---------------------------------------------------------


def test_ipc_roundtrip_and_size_cap(spark):
    n = 5000
    df = (
        add_seq(spark.range(n).select(F.col("id").alias("key")), "key")
        .repartitionByRange(4, "bolson_seq")
        .sortWithinPartitions("bolson_seq")
    )
    ser = serialize_ipc(df).cache()
    msgs = ser.collect()
    # FNC02/slicing: every message <= max_rows; rows conserved
    assert all(m.num_rows <= MAX_ROWS_DEFAULT for m in msgs)
    assert sum(m.num_rows for m in msgs) == n
    # seq ranges contiguous within a message and non-overlapping overall
    assert all(m.seq_last - m.seq_first + 1 == m.num_rows for m in msgs)
    spans = sorted((m.seq_first, m.seq_last) for m in msgs)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert b0 == a1 + 1
    # FNC03: deserialize restores the exact rows
    back = deserialize_ipc(ser, "bolson_seq bigint, key bigint").collect()
    assert sorted((r.key, r.bolson_seq) for r in back) == [(i, i) for i in range(n)]
    ser.unpersist()


def test_ipc_size_cap_errors_not_splits(spark):
    """serializer.cpp:33-37 — FNC10: exceeding max_ipc is an error."""
    df = (
        add_seq(
            spark.range(2000).selectExpr("id", "repeat('x', 4000) AS pad"), "id"
        )
    )
    with pytest.raises(Exception, match="IPC message size"):
        serialize_ipc(df, max_rows=2000, max_ipc_size=1000).collect()


# --- skew utilities -------------------------------------------------------


def test_salted_join_equals_plain_join(spark):
    """Salting changes only the shuffle key distribution, never the
    result — verified on a pathologically skewed fact table."""
    from bolson_spark.operators import salted_join

    rng = random.Random(5)
    # 90% of fact rows share one hot key
    fact = spark.createDataFrame(
        [(0 if rng.random() < 0.9 else rng.randint(1, 50), i) for i in range(20_000)],
        ["k", "v"],
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(40)], ["k", "name"])
    for how in ("inner", "left"):
        plain = {tuple(r) for r in fact.join(dim, "k", how).collect()}
        salted = {tuple(r) for r in salted_join(fact, dim, "k", how, salt=8).collect()}
        assert salted == plain, how


def test_salted_agg_equals_plain_agg(spark):
    from bolson_spark.operators import salted_agg
    from pyspark.sql import functions as F

    rng = random.Random(6)
    df = spark.createDataFrame(
        [(0 if rng.random() < 0.8 else rng.randint(1, 5), rng.randint(0, 1000))
         for _ in range(20_000)],
        ["k", "v"],
    )
    plain = {
        (r.k, r.s, r.n, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    out = salted_agg(df, ["k"], {"v": "sum"}, salt=8)
    # count via a second call (distinct agg fns per column in one call)
    cnt = salted_agg(df.withColumn("one", F.lit(1)), ["k"], {"one": "count"}, salt=8)
    mnx = salted_agg(df, ["k"], {"v": "min"}, salt=4).join(
        salted_agg(df, ["k"], {"v": "max"}, salt=4), "k"
    )
    merged = {
        (r.k, r.sum_v, c.count_one, m.min_v, m.max_v)
        for r in out.collect()
        for c in cnt.collect()
        if c.k == r.k
        for m in mnx.collect()
        if m.k == r.k
    }
    assert merged == plain


def test_parse_json_quarantine_routes_instead_of_failing(spark):
    """Dead-letter parse: malformed docs and out-of-schema docs are
    CLASSIFIED (reason + raw evidence) while clean docs parse, in one
    pass — no job failure, parsed fields null on quarantined rows."""
    from bolson_spark.operators.parse import parse_json_quarantine
    from bolson_spark.schemas import EVENT_PROPS_SPARK

    df = spark.createDataFrame(
        [
            (1, '{"k": 7}'),
            (2, '{"k": 7'),  # truncated -> malformed
            (3, '{"k": 1, "intruder": 2}'),  # out-of-schema key
            (4, "not json at all"),
            (5, '{"k": "not-a-long"}'),  # schema-type mismatch
        ],
        ["event_id", "value"],
    )
    out = {
        r.event_id: r
        for r in parse_json_quarantine(
            df, EVENT_PROPS_SPARK, "value", keep=["event_id"]
        ).collect()
    }
    assert out[1].quarantine_reason is None
    assert out[1].k == 7 and out[1].raw is None
    assert out[2].quarantine_reason == "malformed"
    assert out[2].k is None and out[2].raw == '{"k": 7'
    assert out[3].quarantine_reason == "unexpected_field"
    assert out[3].k is None and out[3].raw == '{"k": 1, "intruder": 2}'
    assert out[4].quarantine_reason == "malformed"
    assert out[5].quarantine_reason == "malformed"


def test_seq_scalable_bounds_modes_identical(spark):
    """Bucket boundary placement (equal-width minmax vs approx
    quantiles) must not change the seq assignment — boundaries affect
    balance only; bases come from exact counts either way."""
    from bolson_spark.operators.seq import add_seq_scalable

    df = spark.createDataFrame(
        [(k,) for k in [5, 5, 5, 17, 17, 2, 40, 40, 40, 40, 1]], ["k"]
    ).repartition(3)
    a = sorted(
        (r.bolson_seq, r.k)
        for r in add_seq_scalable(df, "k", bounds_mode="minmax").collect()
    )
    b = sorted(
        (r.bolson_seq, r.k)
        for r in add_seq_scalable(df, "k", bounds_mode="quantile").collect()
    )
    assert a == b
    assert [s for s, _ in a] == list(range(11))


def test_add_seq_scalable_two_key_tiebreak(spark):
    """Multi-key scalable path: buckets derive from the numeric FIRST
    key; the second key breaks ties so the assignment is a collision-
    free total order — must equal the exact global window on the same
    two keys, including heavy first-key ties landing in one bucket."""
    import random

    from pyspark.sql import functions as F

    from bolson_spark.operators.seq import add_seq, add_seq_scalable

    rng = random.Random(11)
    rows = [(rng.randint(0, 9), i) for i in range(500)]  # many _k ties
    df = spark.createDataFrame(rows, "k bigint, doc_id bigint")
    got = add_seq_scalable(df, ["k", "doc_id"], name="seq", num_buckets=8)
    want = add_seq(df, ["k", "doc_id"], name="seq")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # contiguity + determinism across re-execution
    seqs = sorted(r.seq for r in got.collect())
    assert seqs == list(range(500))
    # non-numeric first key still falls back to the exact window
    sdf = df.select(F.col("k").cast("string").alias("ks"), "doc_id")
    fb = add_seq_scalable(sdf, ["ks", "doc_id"], name="seq")
    assert sorted(r.seq for r in fb.collect()) == list(range(500))


def test_add_seq_scalable_null_keys_number_first(spark):
    """NULL order keys must not crash the driver-side prefix-sum pass
    ((NULL > bound) poisons the bucket id into None) and must number
    FIRST — the exact path's ASC NULLS FIRST placement, so the two
    implementations stay semantically equal on nullable keys."""
    from bolson_spark.operators import add_seq, add_seq_scalable

    rows = [(None,), (5,), (1,), (None,), (9,), (3,)]
    df = spark.createDataFrame(rows, "key int").repartition(3)
    a = sorted(
        (r.key, r.bolson_seq)
        for r in add_seq(df, "key", start=0).collect()
        if r.key is not None
    )
    b = sorted(
        (r.key, r.bolson_seq)
        for r in add_seq_scalable(df, "key", num_buckets=4).collect()
        if r.key is not None
    )
    assert a == b
    # the two NULL rows take seq 0 and 1 on both paths
    for fn in (add_seq, add_seq_scalable):
        null_seqs = sorted(
            r.bolson_seq for r in fn(df, "key").collect() if r.key is None
        )
        assert null_seqs == [0, 1], fn.__name__


def test_add_seq_scalable_timestamp_key_stays_scalable(spark):
    """A timestamp arrival key — the docstring's own normal case —
    must bucket through the epoch-seconds image instead of silently
    degrading to the single-reducer global window: same numbering as
    add_seq, and the plan partitions by the bucket id."""
    import datetime as dt

    from bolson_spark.operators import add_seq, add_seq_scalable

    base = dt.datetime(2026, 1, 1)
    rows = [(base + dt.timedelta(seconds=s),) for s in (30, 5, 90, 60, 0)]
    df = spark.createDataFrame(rows, "ts timestamp").repartition(3)
    a = {
        (r.ts, r.bolson_seq) for r in add_seq(df, "ts").collect()
    }
    out = add_seq_scalable(df, "ts", num_buckets=3)
    assert {(r.ts, r.bolson_seq) for r in out.collect()} == a
    # scale-path evidence: the one full-width pass shuffles on the
    # literal bucket id, not a global single-partition sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_pid" in plan


def test_serialize_ipc_rejects_missing_seq_column(spark):
    """serialize_ipc on a frame WITHOUT the seq column must raise at
    call time: pyarrow's get_field_index returns -1 for a missing
    column and column(-1) is Python negative indexing, so the old
    behavior emitted garbage seq_first/seq_last from whatever column
    happened to be last — silently."""
    import pytest as _pytest

    from bolson_spark.operators import serialize_ipc

    df = spark.createDataFrame([(1, "a")], "x bigint, y string")
    with _pytest.raises(ValueError, match="seq column 'bolson_seq'"):
        serialize_ipc(df)
