"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

North-star extension (BASELINE.json). The decode step is STUBBED — the
image/audio libraries are not in this container — but everything Spark-
side is real and tested: schema contract, batch iteration shape,
partition sizing, and the deterministic fake feature extractor used to
validate the plumbing end-to-end.

Scale notes: binary payloads ride in parquet; ``maxPartitionBytes`` keeps
per-task batches bounded; metadata-only predicates (mime, width, bytes)
push down without touching payloads because they are separate columns.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

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


def decode_image(payload: bytes) -> "object":
    """Real decoder hook — requires an image library not present here."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not available in this "
        "environment — inject a decoder or use fake_feature_extractor"
    )


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
