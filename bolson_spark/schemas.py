"""Explicit schemas — the reference's schema system is fixed, explicit,
user-supplied, never inferred (parse/arrow.cpp:31-58, usage.md:14-26).

Two canonical record schemas (battery, trip-report) mirror
parse/opae/battery.cpp:37-40 and parse/opae/trip.cpp:48-100; `uint64`
maps to LongType (values bounded small — SURVEY.md §1.2), fixed_size_list
maps to ArrayType + an exact-length constraint (Spark has no fixed-size
list). All fields non-nullable, matching the reference.

Schema file I/O mirrors the reference's workflow of serializing an Arrow
schema with pyarrow and loading it at startup (usage.md:14-26,63).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

# --- battery status: {"voltage": [uint64...]} , 1..16 items, 0..2047 ---
BATTERY_SPARK = T.StructType(
    [
        T.StructField(
            "voltage", T.ArrayType(T.LongType(), containsNull=False), nullable=False
        )
    ]
)
BATTERY_ARROW = pa.schema(
    [pa.field("voltage", pa.list_(pa.field("item", pa.uint64(), nullable=False)), nullable=False)]
)
BATTERY_CONSTRAINTS = {"voltage": {"min_len": 1, "max_len": 16, "min": 0, "max": 2047}}

# --- trip report: 20 fields, trip.cpp:48-100; fixed-list sizes below ---
_TRIP_FIELDS: list[tuple[str, object, int | None]] = [
    ("timestamp", T.StringType(), None),  # stays utf8, NOT a date (FNC05)
    ("timezone", T.LongType(), None),
    ("vin", T.LongType(), None),
    ("odometer", T.LongType(), None),
    ("hypermiling", T.BooleanType(), None),
    ("avgspeed", T.LongType(), None),
    ("sec_in_band", T.ArrayType(T.LongType(), False), 12),
    ("miles_in_time_range", T.ArrayType(T.LongType(), False), 24),
    ("const_speed_miles_in_band", T.ArrayType(T.LongType(), False), 12),
    ("vary_speed_miles_in_band", T.ArrayType(T.LongType(), False), 12),
    ("sec_decel", T.ArrayType(T.LongType(), False), 10),
    ("sec_accel", T.ArrayType(T.LongType(), False), 10),
    ("braking", T.ArrayType(T.LongType(), False), 6),
    ("accel", T.ArrayType(T.LongType(), False), 6),
    ("orientation", T.BooleanType(), None),
    ("small_speed_var", T.ArrayType(T.LongType(), False), 13),
    ("large_speed_var", T.ArrayType(T.LongType(), False), 13),
    ("accel_decel", T.LongType(), None),
    ("speed_changes", T.LongType(), None),
]
TRIP_SPARK = T.StructType(
    [T.StructField(n, t, nullable=False) for n, t, _ in _TRIP_FIELDS]
)
TRIP_FIXED_LIST_SIZES = {n: s for n, _, s in _TRIP_FIELDS if s is not None}

# --- events.props payload schema for the flagship pipeline ---
EVENT_PROPS_SPARK = T.StructType([T.StructField("k", T.LongType(), nullable=False)])


def spark_to_arrow_schema(schema: T.StructType) -> pa.Schema:
    """Best-effort Spark->Arrow schema mapping for IPC serialization."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def save_schema(schema: pa.Schema, path: str) -> None:
    """Serialize an Arrow schema to a file (pyarrow), mirroring the
    reference's generate-schema step (usage.md:14-26)."""
    with pa.OSFile(path, "wb") as f:
        f.write(schema.serialize())


def load_schema(path: str) -> pa.Schema:
    """Read an Arrow schema from a file (parse/arrow.cpp:31-58)."""
    with pa.memory_map(path) as f:
        return pa.ipc.read_schema(f)
