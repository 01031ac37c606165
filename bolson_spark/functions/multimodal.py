"""Multimodal (image/audio/video) column handling.

Design: media are opaque BINARY columns + typed metadata, processed by
Arrow-batched Pandas functions via ``mapInPandas`` — the Spark-side
plumbing (schema, batching, partitioning) is real and tested; the codec
step itself is stubbed because no image/audio libraries exist in this
container. ``decode_image`` raises NotImplementedError unless
``fake=True``, which substitutes a deterministic fake decoder so the
pipeline shape (bytes -> features) is testable end-to-end.

At scale: mapInPandas streams Arrow batches, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; binary payloads never
pass through Python row-at-a-time.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, media_type string, byte_len bigint, "
    "sha256 string"
)
FEATURE_SCHEMA = "media_id bigint, width int, height int, feature array<double>"


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns over an opaque binary column — built-in
    expressions only (length, sha2)."""
    p = F.col(payload_col)
    return df.withColumn("byte_len", F.octet_length(p).cast("bigint")).withColumn(
        "sha256", F.sha2(p, 256)
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decoder: derives a fake
    (width, height) and an 8-dim feature vector from the payload hash."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    feature = [b / 255.0 for b in h[2:10]]
    return width, height, feature


def decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Real decoder entry point — unavailable in this container."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "use extract_features(df, fake=True) for the deterministic stub"
    )


def extract_features(
    df: DataFrame, payload_col: str = "payload", *, fake: bool = False
) -> DataFrame:
    """binary payload -> (width, height, feature vector) via mapInPandas.

    The Arrow batch shape and output schema are production-real; only
    the per-payload decode is stubbed (fake=True) or raises.
    """
    decoder = _fake_decode if fake else decode_image

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decoder(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)
