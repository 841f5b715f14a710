"""Tiered rollups: every tier derived from partials must equal the same
aggregate computed directly from raw rows (mergeability property)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.rollup_ts import rollup_tiers


@pytest.fixture(scope="module")
def raw(spark):
    return spark.range(2000).select(
        (F.col("id") % 3).alias("k"),
        F.timestamp_seconds(F.col("id") * 337 % 864000).alias("ts"),
        (F.col("id") % 53).cast("double").alias("value"),
    )


def test_tiers_equal_direct(spark, raw):
    tiers = rollup_tiers(
        raw, ["1 hour", "1 day"], keys=["k"], ts="ts", value="value"
    )
    for res in ["1 hour", "1 day"]:
        direct = (
            raw.groupBy("k", F.window("ts", res).alias("win"))
            .agg(
                F.count("value").alias("n"),
                F.sum("value").alias("sum_value"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
            .select("k", F.col("win.start").alias("bucket_start"),
                    "n", "sum_value", "min_value", "max_value")
        )
        got = {
            (r.k, r.bucket_start): (r.n, r.sum_value, r.min_value, r.max_value)
            for r in tiers[res].collect()
        }
        want = {
            (r.k, r.bucket_start): (r.n, r.sum_value, r.min_value, r.max_value)
            for r in direct.collect()
        }
        assert set(got) == set(want), res
        for key in want:
            g, w = got[key], want[key]
            assert g[0] == w[0] and g[2] == w[2] and g[3] == w[3]
            assert g[1] == pytest.approx(w[1])


def test_ohlc_rollup_open_close_tie_rule(spark):
    import datetime

    from mhm_data_pipelines_spark.operators.rollup_ts import ohlc_rollup

    t = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    rows = [
        (1, t("2024-01-01 10:05:00"), 5.0),
        (1, t("2024-01-01 10:01:00"), 3.0),   # open
        (1, t("2024-01-01 10:59:00"), 2.0),   # close (and low)
        (1, t("2024-01-01 10:30:00"), 9.0),   # high
        # ties at the same ts: open takes the smaller value, close
        # the larger (lexicographic struct ordering)
        (2, t("2024-01-01 10:00:00"), 7.0),
        (2, t("2024-01-01 10:00:00"), 4.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, value double")
    got = {r.k: r for r in ohlc_rollup(df, ["k"]).collect()}
    assert (got[1].open, got[1].high, got[1].low, got[1].close) == (
        3.0, 9.0, 2.0, 2.0
    )
    assert got[1].n == 4
    assert got[2].open == 4.0 and got[2].close == 7.0


def test_time_weighted_avg_locf(spark):
    import datetime

    from mhm_data_pipelines_spark.operators.rollup_ts import (
        time_weighted_avg,
    )

    t = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    rows = [
        # value 10 holds 60s, value 20 holds 180s -> twa = (600+3600)/240
        (1, t("2024-01-01 10:00:00"), 10.0),
        (1, t("2024-01-01 10:01:00"), 20.0),
        (1, t("2024-01-01 10:04:00"), 99.0),  # final: no interval
        # single-event key -> NULL twa
        (2, t("2024-01-01 10:00:00"), 5.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, value double")
    got = {r.k: r for r in time_weighted_avg(df, ["k"]).collect()}
    assert got[1].twa == (10.0 * 60 + 20.0 * 180) / 240
    assert got[1].span_seconds == 240.0
    assert got[2].twa is None and got[2].n_obs == 1


def test_time_weighted_avg_null_values_carry_forward(spark):
    """A NULL value is not an observation: the prior value's interval
    extends across the gap (true LOCF), instead of the NULL interval
    deflating the average by padding only the denominator (ADVICE r5)."""
    import datetime

    from mhm_data_pipelines_spark.operators.rollup_ts import (
        time_weighted_avg,
    )

    t = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    rows = [
        # 10 holds 10:00->10:03 (NULL at 10:01 ignored; carry across),
        # 20 holds 10:03->10:04 -> twa = (10*180 + 20*60) / 240
        (1, t("2024-01-01 10:00:00"), 10.0),
        (1, t("2024-01-01 10:01:00"), None),
        (1, t("2024-01-01 10:03:00"), 20.0),
        (1, t("2024-01-01 10:04:00"), 99.0),  # final: no interval
        # a key whose only rows are NULL-valued vanishes entirely
        (2, t("2024-01-01 10:00:00"), None),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, value double")
    got = {r.k: r for r in time_weighted_avg(df, ["k"]).collect()}
    assert got[1].twa == (10.0 * 180 + 20.0 * 60) / 240
    assert got[1].n_obs == 3  # non-NULL observations only
    assert got[1].span_seconds == 240.0
    assert 2 not in got
