"""Overview pipelines: stats table, device split, availability, missing
report, partial≡single-pass aggregation property (SURVEY §5.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mhm_data_pipelines_spark.functions.timeutils import coalesce_event_time
from mhm_data_pipelines_spark.operators.overview import (
    availability_long,
    availability_matrix,
    missing_data_report,
    overview_stats,
)
from mhm_data_pipelines_spark.sources.lake import read_lake_unified


def _lake_with_ts(spark, lake_root):
    lake = read_lake_unified(spark, lake_root, layout="raw")
    return lake.withColumn("ts", coalesce_event_time(lake.columns))


def test_overview_stats(spark, lake_root):
    stats = overview_stats(_lake_with_ts(spark, lake_root)).collect()
    by_key = {(r.site, r.participant_id, r.metric): r for r in stats}
    hc = by_key[("LON", "ABC-123-XYZ", "android_health_connect_typed_data")]
    assert hc.row_count == 10  # 9 + 1 sharded
    assert hc.day_count == 4  # 3 Dec days + 1 Jan day
    assert str(hc.start_date) == "2024-12-28"
    assert str(hc.end_date) == "2025-01-06"
    # Output ordered by group key (process-overview.py:226).
    keys = [(r.site, r.participant_id, r.metric) for r in stats]
    assert keys == sorted(keys)


def test_overview_device_split(spark, lake_root):
    df = _lake_with_ts(spark, lake_root)
    stats = overview_stats(df, split_by_device=True).collect()
    metrics = {r.metric for r in stats}
    assert "android_health_connect_typed_data/pixel-7" in metrics
    assert "android_health_connect_typed_data/galaxy-watch" in metrics
    # Metrics without a device column keep their plain name.
    assert "device_app_log" in metrics


def test_availability_matrix(spark, lake_root):
    df = _lake_with_ts(spark, lake_root)
    long = availability_long(df)
    assert long.filter(F.col("n") == 0).count() == 0
    mat = availability_matrix(df)
    pdf = mat.toPandas().set_index("participant_id")
    assert "2024-12-28" in pdf.columns
    # fill_value=0 parity (data_collection.py:65).
    assert pdf.loc["DEF-456-UVW", "2024-12-28"] == 0


def test_missing_data_report(spark, lake_root):
    df = _lake_with_ts(spark, lake_root)
    present = df.select("participant_id", "metric").distinct()
    participants = df.select("participant_id").distinct()
    metrics = df.select("metric").distinct()
    expected = participants.crossJoin(metrics)
    missing = missing_data_report(present, expected).collect()
    got = {(r.participant_id, r.metric) for r in missing}
    # MAN participant has no app logs / questionnaires.
    assert ("DEF-456-UVW", "device_app_log") in got
    assert ("DEF-456-UVW", "questionnaire_response") in got
    assert ("ABC-123-XYZ", "device_app_log") not in got


def test_partial_equals_single_pass(spark):
    """Per-directory partials merged must equal single-pass aggregation
    (process-overview.py:168-194 merge semantics ≡ Spark partial+final)."""
    import random

    random.seed(42)
    rows = [
        (f"p{i % 3}", "m", float(1700000000 + random.randint(0, 5) * 86400))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "participant_id string, metric string, epoch double")
    df = df.withColumn("ts", F.timestamp_seconds("epoch"))
    whole = overview_stats(df, group_cols=["participant_id", "metric"]).collect()
    a, b = df.randomSplit([0.5, 0.5], seed=7)
    merged = (
        overview_stats(a, group_cols=["participant_id", "metric"])
        .unionByName(overview_stats(b, group_cols=["participant_id", "metric"]))
        .groupBy("participant_id", "metric")
        .agg(
            F.sum("row_count").alias("row_count"),
            F.min("start_date").alias("start_date"),
            F.max("end_date").alias("end_date"),
        )
        .collect()
    )
    w = {(r.participant_id, r.metric): (r.row_count, r.start_date, r.end_date) for r in whole}
    m = {(r.participant_id, r.metric): (r.row_count, r.start_date, r.end_date) for r in merged}
    assert w == m
