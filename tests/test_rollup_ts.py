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
