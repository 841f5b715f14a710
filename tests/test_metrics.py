"""Observation metrics: counts ride the real action, no extra pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.metrics import funnel_counts, observed


def test_observed_counts_with_single_action(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("k")
    )
    inst, obs = observed(
        df.filter(F.col("k") < 3), "kept", F.sum("id").alias("id_sum")
    )
    rows = inst.count()  # the one action
    assert rows == 30
    m = obs.get
    assert m["rows"] == 30
    assert m["id_sum"] == sum(i for i in range(100) if i % 10 < 3)


def test_funnel_counts(spark):
    df = spark.range(50).select(F.col("id"))
    stages = funnel_counts(
        {
            "all": df,
            "even": df.filter(F.col("id") % 2 == 0),
        }
    )
    for name, sdf in stages.items():
        sdf.count()
        got = sdf._observation.get["rows"]
        assert got == {"all": 50, "even": 25}[name]
