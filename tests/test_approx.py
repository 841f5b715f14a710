"""Approximate-aggregate scale paths: HLL distinct and quantile
sketches must land within their advertised error of the exact answers
on real data — these are the drop-in replacements the engine swaps in
when exact distinct/median no longer fit (A5/A6 at 100 TB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.benchmarks.registry import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    df = load_table(spark, SF, "events")
    rows = df.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= max(3, 0.06 * r.exact), (
            f"{r.event_type}: approx {r.approx} vs exact {r.exact}"
        )


def test_percentile_approx_close_to_exact(spark):
    df = load_table(spark, SF, "events")
    row = df.agg(
        F.expr("percentile(value, array(0.5, 0.9))").alias("exact"),
        F.percentile_approx(
            "value", F.array(F.lit(0.5), F.lit(0.9)), 10_000
        ).alias("approx"),
    ).first()
    for e, a in zip(row.exact, row.approx):
        # value spans ~[0, 490]; a 10k-bucket sketch should be tight.
        assert a == pytest.approx(e, abs=1.0), (e, a)
