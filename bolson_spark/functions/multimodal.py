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


RESIZED_SCHEMA = "media_id bigint, width int, height int, payload binary"
FRAME_SCHEMA = "media_id bigint, frame_idx int, frame binary"


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real resize entry point — unavailable in this container."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "use resize_images(df, ..., fake=True) for the deterministic stub"
    )


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: 'resized' pixels are the sha256 stream
    of the payload, truncated to width*height bytes (1 fake byte/px)."""
    out = b""
    h = hashlib.sha256(payload).digest()
    while len(out) < width * height:
        out += h
        h = hashlib.sha256(h).digest()
    return out[: width * height]


def resize_images(
    df: DataFrame,
    width: int = 32,
    height: int = 32,
    payload_col: str = "payload",
    *,
    fake: bool = False,
) -> DataFrame:
    """binary payload -> fixed-size resized payload via mapInPandas.
    Narrow map, Arrow-batched; output size is width*height bytes per
    row, so sink partition sizing is exact at any scale."""
    resizer = _fake_resize if fake else resize_image

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": [
                        resizer(p, width, height) for p in pdf[payload_col]
                    ],
                }
            )

    return df.mapInPandas(fn, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 4,
    frame_bytes: int = 256,
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame sampling: one input row -> one output row per
    sampled frame (1→N expansion inside mapInPandas, the shape a real
    demuxer has). The container has no video codecs, so a 'frame' is
    deterministically modeled as a fixed-size chunk of the payload and
    sampling takes every `every_n`-th chunk — the Spark-side contract
    (schema, batching, row expansion, memory bounded per Arrow batch)
    is production-real.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                n_frames = max(len(payload) // frame_bytes, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(
                        bytes(payload[fi * frame_bytes : (fi + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(fn, FRAME_SCHEMA)


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
