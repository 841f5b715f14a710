"""Unit tests: time parsing, calendar keys, filename grammar (SURVEY §5.2)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.functions.timeutils import (
    coalesce_event_time,
    epoch_to_timestamp,
    filename_shard_index,
    filename_timestamp,
    iso_week_key,
    time_key,
    try_double,
)


def test_epoch_fractional_seconds(spark):
    df = spark.createDataFrame([Row(t="1729146600.70951"), Row(t="garbage"), Row(t=None)])
    out = df.select(epoch_to_timestamp("t").alias("ts")).collect()
    assert out[0].ts == datetime.datetime(2024, 10, 17, 6, 30, 0, 709510)
    assert out[1].ts is None and out[2].ts is None


def test_try_double_coerce(spark):
    df = spark.createDataFrame([Row(v="1.5"), Row(v="x"), Row(v="")])
    got = [r.d for r in df.select(try_double("v").alias("d")).collect()]
    assert got == [1.5, None, None]


def test_iso_week_across_year_boundary(spark):
    # 2024-12-30 is ISO 2025-W01; 2025-01-01 also 2025-W01 (watch-list #1).
    df = spark.createDataFrame(
        [Row(d="2024-12-30"), Row(d="2025-01-01"), Row(d="2024-07-31")]
    ).select(F.to_timestamp("d").alias("ts"))
    got = [r.k for r in df.select(iso_week_key("ts").alias("k")).collect()]
    assert got == ["2025-W01", "2025-W01", "2024-W31"]
    expected = [
        "{}-W{:02d}".format(*datetime.date.fromisoformat(d).isocalendar()[:2])
        for d in ("2024-12-30", "2025-01-01", "2024-07-31")
    ]
    assert got == expected


def test_time_key_resolutions(spark):
    df = spark.createDataFrame([Row(d="2024-07-31 10:00:00")]).select(
        F.to_timestamp("d").alias("ts")
    )
    row = df.select(
        time_key("ts", "monthly").alias("m"),
        time_key("ts", "weekly").alias("w"),
        time_key("ts", "yearly").alias("y"),
        time_key("ts", "daily").alias("d"),
    ).first()
    assert (row.m, row.w, row.y, row.d) == ("2024-07", "2024-W31", "2024", "2024-07-31")


def test_filename_grammar(spark):
    df = spark.createDataFrame(
        [
            Row(f="20241228_1200.csv.gz"),
            Row(f="20250102_1200_3.csv.gz"),
            Row(f="notadate.csv.gz"),
            Row(f="20241399_9999.csv.gz"),  # out-of-range date → null
        ]
    )
    rows = df.select(
        filename_timestamp("f").alias("ts"), filename_shard_index("f").alias("i")
    ).collect()
    assert rows[0].ts == datetime.datetime(2024, 12, 28, 12, 0) and rows[0].i is None
    assert rows[1].ts == datetime.datetime(2025, 1, 2, 12, 0) and rows[1].i == 3
    assert rows[2].ts is None and rows[3].ts is None


def test_coalesce_event_time_order(spark):
    df = spark.createDataFrame(
        [(None, "100.5", "999")],
        "`timestamp` string, `value.time` string, `time` string",
    )
    ts = df.select(
        coalesce_event_time(df.columns).alias("ts")
    ).first().ts
    # value.time (100.5) wins over time (999): candidate order respected.
    assert ts == datetime.datetime(1970, 1, 1, 0, 1, 40, 500000)
