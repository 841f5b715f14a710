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

from pyspark.sql import DataFrame, Window
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


def ohlc_rollup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """OHLC (open/high/low/close) candlestick rollup per key and time
    bucket — the financial-style continuous aggregate every metrics
    store grows eventually. Open/close are the values at the earliest/
    latest timestamp in the bucket; timestamp ties break
    deterministically by the lexicographic struct ordering — open
    takes the SMALLER value, close the LARGER (a bare ``min_by``/
    ``max_by`` is tie-arbitrary in any engine). ONE hash aggregation with map-side partials; no
    window, no sort.

    Returns ``(*key_cols, bucket_ts, open, high, low, close, n)``.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    pair = F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v"))
    return (
        df.groupBy(*key_cols, b)
        .agg(
            F.min(pair)["v"].alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max(pair)["v"].alias("close"),
            F.count("*").alias("n"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Duration-weighted mean per key (TimescaleDB ``time_weight``
    semantics, last-observation-carried-forward): each observation's
    value holds until the NEXT observation of the same key, so a
    sensor that reports rarely does not get equal vote with one that
    chatters. The final observation of a key carries no interval and
    contributes no weight (a key with one event has no defined TWA →
    NULL, never a division blow-up).

    NULL-valued observations are NOT observations under LOCF: they are
    dropped BEFORE the lead window, so the prior value's interval
    extends across the gap (true carry-forward). Including them would
    add their interval to the denominator while contributing nothing
    to the numerator — a silently deflated average (ADVICE r5).
    ``n_obs`` therefore counts non-NULL observations.

    Scale shape: one ``lead`` window per key (the same shuffle a
    groupBy would pay) + one hash aggregation.

    Returns ``(*key_cols, twa, n_obs, span_seconds)``.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    nxt = F.lead(ts_col).over(w)
    dur = F.unix_micros(nxt) - F.unix_micros(F.col(ts_col))
    staged = df.filter(F.col(value_col).isNotNull()).withColumn(
        "_dur_us", dur
    )
    return (
        staged.groupBy(*key_cols)
        .agg(
            (
                F.sum(F.col(value_col) * F.col("_dur_us"))
                / F.sum("_dur_us")
            ).alias("twa"),
            F.count("*").alias("n_obs"),
            (F.sum("_dur_us") / 1_000_000.0).alias("span_seconds"),
        )
    )
