"""Gap-fill and rolling z-score: crafted series with known gaps,
forward-fill values, cold-start nulls, tie determinism."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.timeseries import (
    gap_fill_daily,
    rolling_zscore,
)


def _ts(day, hour=12):
    return dt.datetime(2024, 1, day, hour)


def test_gap_fill_inserts_and_forward_fills(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(1), 10.0),
            (1, _ts(1, 18), 20.0),   # same day → avg 15
            (1, _ts(4), 40.0),       # days 2,3 missing
            (2, _ts(2), 5.0),        # single-day key: no gaps
        ],
        "user_id bigint, ts timestamp, value double",
    )
    out = {
        (r.user_id, str(r.day)): (r.value, r.was_gap)
        for r in gap_fill_daily(df).collect()
    }
    assert out == {
        (1, "2024-01-01"): (15.0, False),
        (1, "2024-01-02"): (15.0, True),
        (1, "2024-01-03"): (15.0, True),
        (1, "2024-01-04"): (40.0, False),
        (2, "2024-01-02"): (5.0, False),
    }


def test_rolling_zscore_cold_start_and_spike(spark):
    # 7 identical readings then a spike: rows 0-6 have no full window
    # (null z); the 8th is scored against a zero-std window → null; add
    # jitter so std>0 and the spike is flagged.
    rows = [(1, _ts(1, h), float(v)) for h, v in enumerate([10, 12, 10, 12, 10, 12, 10])]
    rows.append((1, _ts(1, 7), 100.0))
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    got = rolling_zscore(df, window=7).orderBy("ts").collect()
    assert all(r.z is None for r in got[:7])  # cold start
    spike = got[7]
    # mean≈10.857, std_pop≈0.99 → z ≈ 90
    assert spike.z is not None and spike.z > 50


def test_rolling_zscore_zero_std_null(spark):
    rows = [(1, _ts(1, h), 5.0) for h in range(8)]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    got = rolling_zscore(df, window=7).collect()
    assert all(r.z is None for r in got)
