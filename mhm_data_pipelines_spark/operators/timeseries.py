"""Time-series regularization: calendar gap-fill with forward-fill, and
rolling-window anomaly scores.

Domain completion of the reference's availability reporting: where
``overview.missing_data_report`` only FLAGS absent (participant, day)
cells (process-overview.py's missing-data table), these operators
repair and score the series — the step a downstream model-training or
alerting pipeline actually needs.

Scale design:
* ``gap_fill_daily`` builds the per-key calendar grid from a per-key
  min/max aggregate (150 users → 150 rows → explode; never a cross
  join against a global calendar), joins observations back on the
  (key, day) hash, and forward-fills with ``last(ignorenulls)`` over
  an unbounded-preceding window — two keyed shuffles total, no
  driver-side date arithmetic.
* ``rolling_zscore`` is one window pass (rows-framed, so ties and
  late data behave identically across engines when the order key is
  made unique with the row id).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    df: DataFrame,
    ts: str = "ts",
    keys: Sequence[str] = ("user_id",),
    value: str = "value",
    agg: str = "avg",
) -> DataFrame:
    """Regularize to a dense daily series per key: aggregate to one row
    per (key, day), insert every missing calendar day between the key's
    first and last observation, and forward-fill the value.

    Returns (keys..., day, value <filled>, was_gap). Leading values are
    never null (the grid starts at each key's first observed day).
    """
    keys = list(keys)
    day = F.to_date(F.col(ts)).alias("day")
    daily = df.groupBy(*keys, day).agg(
        getattr(F, agg)(F.col(value)).alias("_v")
    )
    grid = (
        daily.groupBy(*keys)
        .agg(F.min("day").alias("_d0"), F.max("day").alias("_d1"))
        .select(
            *keys,
            F.explode(F.sequence("_d0", "_d1")).alias("day"),
        )
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(daily, [*keys, "day"], "left")
        .select(
            *keys,
            "day",
            F.last("_v", ignorenulls=True).over(w).alias(value),
            F.col("_v").isNull().alias("was_gap"),
        )
    )


def rolling_zscore(
    df: DataFrame,
    ts: str = "ts",
    key: str = "user_id",
    value: str = "value",
    order_id: str | None = None,
    window: int = 7,
) -> DataFrame:
    """Score each observation against the trailing ``window`` rows of
    its key (mean/stddev_pop of the PRECEDING rows only — the current
    row never normalizes itself). Rows without a full trailing window
    get null z (cold start). ``order_id`` breaks timestamp ties so the
    frame is deterministic under any partitioning."""
    order_cols = [F.col(ts)] + ([F.col(order_id)] if order_id else [])
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(-window, -1)
    )
    mean = F.avg(value).over(w)
    std = F.stddev_pop(value).over(w)
    n = F.count(value).over(w)
    z = F.when(
        (n == window) & (std > 0), (F.col(value) - mean) / std
    )
    return df.withColumn("z", z)
