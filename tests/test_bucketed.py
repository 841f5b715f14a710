"""Bucketed tables: co-located joins plan with zero shuffle Exchange,
results equal the unbucketed join, and point filters prune buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.benchmarks.registry import load_table
from mhm_data_pipelines_spark.sources.bucketed import (
    assert_no_shuffle,
    bucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucket_wh")
    # Scan metadata (SelectedBucketsCount, PushedFilters) is truncated at
    # 100 chars by default — widen so plan assertions can see it.
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{wh}'")
    write_bucketed(
        load_table(spark, SF, "orders"), "bdb.orders_b", ["o_orderkey"], 8
    )
    write_bucketed(
        load_table(spark, SF, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
        "bdb.lineitem_b",
        ["o_orderkey"],
        8,
    )
    yield "bdb.orders_b", "bdb.lineitem_b"
    spark.sql("DROP DATABASE bdb CASCADE")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, ["o_orderkey"])
    agg_input = joined.select("o_orderkey", "l_quantity")
    # The join itself must not shuffle either side.
    plan = assert_no_shuffle(agg_input)
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    left, right = bucketed_tables
    got = (
        bucketed_join(spark, left, right, ["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )
    want = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bucket_pruning_on_point_filter(spark, bucketed_tables):
    left, _ = bucketed_tables
    some_key = spark.table(left).select("o_orderkey").first()[0]
    # The auto-bucketed-scan rule turns bucketed reading OFF for plans
    # with no distribution-interested operator (plain filter), which
    # also forfeits bucket pruning — pin it on for the point lookup.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = (
            spark.table(left)
            .filter(F.col("o_orderkey") == some_key)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
    assert "SelectedBucketsCount: 1 out of 8" in plan


def test_one_file_per_bucket(spark, bucketed_tables):
    left, _ = bucketed_tables
    loc = [
        r.data_type
        for r in spark.sql(f"DESCRIBE FORMATTED {left}").collect()
        if r.col_name == "Location"
    ][0]
    import glob

    # 8 buckets, repartitioned before write → exactly 8 data files.
    n = len(glob.glob(loc.replace("file:", "") + "/*.parquet"))
    assert n == 8
