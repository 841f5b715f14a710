"""Tiered time-series rollups (hypertable-style continuous aggregates).

The reference computes every period aggregate from raw rows each run
(``mhm-data-pipelines/extract_patient_summary.py:379-428`` re-scans the
accumulator; ``process-overview.py:276-332`` rewrites global stats per
directory). The scale-correct design is tiered **mergeable partials**:
raw → fine tier (e.g. hourly) → coarser tiers derived from the previous
tier, never from raw. At 100 TB the daily tier reads |hours| rows, not
|events| — and an incremental refresh only recomputes the tiers of
changed partitions (pair with streaming.incremental_overview).

Only algebraic aggregates tier correctly (count/sum/min/max; avg as
sum/count at read time). The tests prove tier-derived == direct-from-raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Mergeable partial columns produced at every tier.
PARTIALS = ("n", "sum_value", "min_value", "max_value")


def rollup_tier(
    df: DataFrame,
    resolution: str,
    keys: list[str],
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Finest tier: raw rows → per-(keys, window) mergeable partials."""
    return (
        df.groupBy(*keys, F.window(ts, resolution).alias("win"))
        .agg(
            F.count(value).alias("n"),
            F.sum(value).alias("sum_value"),
            F.min(value).alias("min_value"),
            F.max(value).alias("max_value"),
        )
        .select(
            *keys,
            F.col("win.start").alias("bucket_start"),
            *PARTIALS,
        )
    )


def reaggregate_tier(
    tier: DataFrame,
    resolution: str,
    keys: list[str],
) -> DataFrame:
    """Coarser tier from a finer tier's partials — the merge is pure
    partial-combination (sum of counts/sums, min of mins, max of maxes);
    no raw data touched. The finer bucket_start re-buckets into the
    coarser window."""
    return (
        tier.groupBy(*keys, F.window("bucket_start", resolution).alias("win"))
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .select(
            *keys,
            F.col("win.start").alias("bucket_start"),
            *PARTIALS,
        )
    )


def rollup_tiers(
    df: DataFrame,
    resolutions: list[str],
    keys: list[str],
    ts: str = "ts",
    value: str = "value",
) -> dict[str, DataFrame]:
    """Build the full tier chain (finest → coarsest), each derived from
    the previous. ``resolutions`` must be ordered fine → coarse and each
    coarser window a multiple of the finer (calendar-aligned)."""
    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for res in resolutions:
        prev = (
            rollup_tier(df, res, keys, ts, value)
            if prev is None
            else reaggregate_tier(prev, res, keys)
        )
        out[res] = prev
    return out
