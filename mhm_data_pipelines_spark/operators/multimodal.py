"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

North-star extension (BASELINE.json). The decode path is REAL for two
cases — any pillow-supported format when pillow is installed (soft
import), and binary PPM (P6) via a built-in pure-numpy parser that needs
no media library at all — and raises ``NotImplementedError`` for
anything else (compressed formats without pillow). The deterministic
byte-histogram extractor remains as the lib-free plumbing validator.

Scale notes: binary payloads ride in parquet; ``maxPartitionBytes`` keeps
per-task batches bounded; metadata-only predicates (mime, width, bytes)
push down without touching payloads because they are separate columns.
Decode/resize/feature code runs inside Arrow-batched ``mapInPandas``
workers — per-asset numpy work, never driver-side.
"""

from __future__ import annotations

import io
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Contract for a multimodal asset table.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("mime_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W, 3) uint8 RGB array.

    Decoder ladder: pillow when importable (every format it supports),
    else the built-in binary-PPM (P6) parser (pure numpy — works in
    media-lib-free containers like this one), else
    ``NotImplementedError`` so callers can route undecodable assets to a
    quarantine column instead of failing the job."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty image payload")
    try:
        from PIL import Image  # soft dependency
    except ImportError:
        Image = None
    if Image is not None:
        try:
            with Image.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("RGB"))
        except Exception:
            pass  # fall through to the built-in parser
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise NotImplementedError(
        "undecodable image format: pillow not installed and payload is "
        "not binary PPM (P6) — install pillow or inject a decoder"
    )


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6): ASCII header `P6 <w> <h> <maxval>` (with
    ``#``-comments) followed by one whitespace byte and raw RGB."""
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    raster = payload[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    """Inverse of :func:`_decode_ppm` — deterministic test/fixture
    payloads without any media library."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps — pure numpy (the
    standard pre-embed normalization step; no interpolation library)."""
    h, w = arr.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows][:, cols]


def image_feature_extractor(
    payload: bytes, grid: int = 2, resize_to: int = 16
) -> list[float]:
    """Real image features from a decoded payload: per-channel mean/std
    plus a ``grid``×``grid`` downsampled luminance map, all in [0, 1].
    Feature length = 6 + grid². Undecodable/empty payloads yield a zero
    vector (quarantine-friendly, mirrors fake_feature_extractor)."""
    dim = 6 + grid * grid
    try:
        img = decode_image(payload).astype(np.float64) / 255.0
    except (NotImplementedError, ValueError):
        return [0.0] * dim
    feats = list(img.mean(axis=(0, 1))) + list(img.std(axis=(0, 1)))
    lum = resize_nearest(img.mean(axis=2), resize_to, resize_to)
    cell = resize_to // grid
    for gy in range(grid):
        for gx in range(grid):
            feats.append(
                float(
                    lum[gy * cell : (gy + 1) * cell,
                        gx * cell : (gx + 1) * cell].mean()
                )
            )
    return [float(f) for f in feats]


def fake_feature_extractor(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decode+embed step: byte-histogram
    moments. Lets the full Spark pipeline (schema, batching, joins
    downstream) be exercised without media libs."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    buckets = [0] * dim
    for i, b in enumerate(payload):
        buckets[b % dim] += 1
    total = float(len(payload))
    return [b / total for b in buckets]


def extract_features(
    assets: DataFrame,
    extractor: Callable[[bytes], list[float]] = fake_feature_extractor,
    batch_size_hint: int = 256,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the Arrow
    batch shape a real image/audio model UDF would use (payloads arrive
    as one pandas column per batch; output is a typed feature array)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime_type": pdf["mime_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "feature": pdf["payload"].map(extractor),
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    assets: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame
    timestamp (decode stubbed). Demonstrates the explode-by-metadata
    pattern — the expensive decode fans out AFTER partition-local
    planning, so parallelism follows frames, not files."""
    return assets.filter(F.col("duration_ms").isNotNull()).select(
        "asset_id",
        "mime_type",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
