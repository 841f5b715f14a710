"""Gap-fill and rolling z-score: crafted series with known gaps,
forward-fill values, cold-start nulls, tie determinism."""

from __future__ import annotations

import datetime as dt

import pytest

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


def _iso(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_funnel_progress_requires_order(spark):
    from mhm_data_pipelines_spark.operators.timeseries import (
        funnel_progress,
    )

    rows = [
        # user 1: clean view -> click -> buy
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 11:00:00"),
        (1, "buy", "2024-01-01 12:00:00"),
        # user 2: click BEFORE view -> chain stops after view
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 10:00:00"),
        # user 3: view only
        (3, "view", "2024-01-01 10:00:00"),
        # user 4: never viewed -> absent
        (4, "click", "2024-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(
        [(u, t, _iso(s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )
    got = {r.user_id: r for r in funnel_progress(
        df, ["view", "click", "buy"]
    ).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].t_2 is not None and got[1].t_3 is not None
    assert got[2].t_2 is None and got[2].t_3 is None
    assert got[3].t_2 is None


def test_funnel_progress_within_horizon(spark):
    from mhm_data_pipelines_spark.operators.timeseries import (
        funnel_progress,
    )

    rows = [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-09 10:00:00"),  # 8 days later
    ]
    df = spark.createDataFrame(
        [(u, t, _iso(s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )
    loose = funnel_progress(df, ["view", "click"]).collect()[0]
    tight = funnel_progress(
        df, ["view", "click"], within="7 days"
    ).collect()[0]
    assert loose.t_2 is not None and tight.t_2 is None


def test_retention_cohorts_triangle(spark):
    from mhm_data_pipelines_spark.operators.timeseries import (
        retention_cohorts,
    )

    rows = [
        # cohort week of 2024-01-01: users 1, 2
        (1, "2024-01-02 10:00:00"),
        (2, "2024-01-03 10:00:00"),
        # user 1 returns in week +1 and +2; user 2 only +2
        (1, "2024-01-09 10:00:00"),
        (1, "2024-01-16 10:00:00"),
        (2, "2024-01-17 10:00:00"),
        # cohort of 2024-01-08: user 3
        (3, "2024-01-10 10:00:00"),
    ]
    df = spark.createDataFrame(
        [(u, _iso(s)) for u, s in rows], "user_id long, ts timestamp"
    )
    got = {
        (str(r.cohort)[:10], r.offset): r.n_active
        for r in retention_cohorts(df, period="week").collect()
    }
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 1)] == 1
    assert got[("2024-01-01", 2)] == 2
    assert got[("2024-01-08", 0)] == 1


def test_ols_trend_hand_case_and_degenerates(spark):
    from mhm_data_pipelines_spark.operators.timeseries import ols_trend

    rows = [
        # g=a: y = 2x + 1 exactly -> slope 2, intercept 1, r2 1
        ("a", 0.0, 1.0), ("a", 1.0, 3.0), ("a", 2.0, 5.0),
        # g=b: known least squares: x=[0,1,2], y=[0,0,3]
        ("b", 0.0, 0.0), ("b", 1.0, 0.0), ("b", 2.0, 3.0),
        # g=c: zero x-variance
        ("c", 1.0, 0.0), ("c", 1.0, 5.0),
        # g=d: zero y-variance (flat line) -> slope 0, r2 NULL
        ("d", 0.0, 7.0), ("d", 1.0, 7.0),
        # g=e: null x / null y rows are excluded together
        ("e", 0.0, 1.0), ("e", 1.0, 2.0), ("e", None, 9.0),
        ("e", 5.0, None),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in ols_trend(df, ["g"], "x", "y").collect()}
    import numpy as np

    assert got["a"]["slope"] == pytest.approx(2.0)
    assert got["a"]["intercept"] == pytest.approx(1.0)
    assert got["a"]["r2"] == pytest.approx(1.0)
    bs, bi = np.polyfit([0, 1, 2], [0, 0, 3], 1)
    assert got["b"]["slope"] == pytest.approx(bs)
    assert got["b"]["intercept"] == pytest.approx(bi)
    assert got["c"]["slope"] is None and got["c"]["r2"] is None
    assert got["d"]["slope"] == pytest.approx(0.0)
    assert got["d"]["r2"] is None
    assert got["e"]["n"] == 2 and got["e"]["slope"] == pytest.approx(1.0)
