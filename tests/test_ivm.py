"""Incremental view maintenance: maintained-equals-recomputed, bucket
scoping (touched partitions only), partition pruning, contracts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.ivm import (
    BUCKET_COL,
    apply_increment,
    init_rollup_table,
    read_rollup,
)


def _rows(lo, hi):
    # (g, v, u): group cycles 0..3, value is deterministic, user id
    # repeats every 7 so distinct-per-group is known-by-recompute.
    return [(i % 4, float(i % 10) + i * 0.5, f"u{i % 7}") for i in range(lo, hi)]


def _direct(spark, lo, hi):
    df = spark.createDataFrame(_rows(lo, hi), ["g", "v", "u"])
    return {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s1"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.avg("v").alias("mean"),
            F.stddev_pop("v").alias("sd"),
            F.count_distinct("u").alias("du"),
        )
        .collect()
    }


def test_maintained_equals_recomputed(spark, tmp_path):
    path = str(tmp_path / "roll")
    b0 = spark.createDataFrame(_rows(0, 40), ["g", "v", "u"])
    b1 = spark.createDataFrame(_rows(40, 90), ["g", "v", "u"])
    b2 = spark.createDataFrame(_rows(90, 130), ["g", "v", "u"])
    init_rollup_table(
        spark, path, b0, ["g"], "v", distinct_col="u", n_buckets=8
    )
    apply_increment(spark, path, b1, ["g"], "v", distinct_col="u")
    apply_increment(spark, path, b2, ["g"], "v", distinct_col="u")
    got = {r["g"]: r for r in read_rollup(spark, path).collect()}
    want = _direct(spark, 0, 130)
    assert set(got) == set(want)
    for g, w in want.items():
        r = got[g]
        assert r["n"] == w["n"]
        assert r["s1"] == pytest.approx(w["s1"], rel=1e-12)
        assert r["mn"] == w["mn"] and r["mx"] == w["mx"]
        assert r["mean"] == pytest.approx(w["mean"], rel=1e-12)
        assert r["stddev_pop"] == pytest.approx(w["sd"], rel=1e-9)
        # HLL union of partials has the SAME registers as sketching
        # the whole — tiny cardinalities are exact.
        assert r["distinct_estimate"] == pytest.approx(w["du"], abs=0.5)


def test_only_touched_buckets_rewritten(spark, tmp_path):
    path = str(tmp_path / "roll")
    full = spark.createDataFrame(_rows(0, 80), ["g", "v", "u"])
    init_rollup_table(spark, path, full, ["g"], "v", n_buckets=16)
    # Which bucket holds each group?
    buckets = {
        r["g"]: r["b"]
        for r in full.select(
            "g", F.pmod(F.xxhash64("g"), F.lit(16)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    }
    assert len(set(buckets.values())) > 1, "fixture must span buckets"
    target_g = 2
    untouched = [b for g, b in buckets.items() if g != target_g]
    mtimes_before = {}
    for b in set(buckets.values()):
        d = os.path.join(path, f"{BUCKET_COL}={b}")
        mtimes_before[b] = {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }
    batch = spark.createDataFrame(
        [(target_g, 99.0, "zz")], ["g", "v", "u"]
    )
    touched = apply_increment(spark, path, batch, ["g"], "v")
    assert touched == [buckets[target_g]]
    for b in set(untouched) - {buckets[target_g]}:
        d = os.path.join(path, f"{BUCKET_COL}={b}")
        now = {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }
        assert now == mtimes_before[b], f"bucket {b} was rewritten"


def test_increment_read_is_partition_pruned(spark, tmp_path):
    path = str(tmp_path / "roll")
    full = spark.createDataFrame(_rows(0, 80), ["g", "v", "u"])
    init_rollup_table(spark, path, full, ["g"], "v", n_buckets=16)
    pruned = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin([1, 2]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and BUCKET_COL in plan


def test_spec_mismatch_rejected_and_empty_batch_noop(spark, tmp_path):
    path = str(tmp_path / "roll")
    b0 = spark.createDataFrame(_rows(0, 20), ["g", "v", "u"])
    init_rollup_table(spark, path, b0, ["g"], "v", n_buckets=4)
    with pytest.raises(ValueError, match="does not match"):
        apply_increment(spark, path, b0, ["g"], "u")
    with pytest.raises(ValueError, match="does not match"):
        apply_increment(spark, path, b0, ["v"], "v")
    empty = b0.filter(F.lit(False))
    assert apply_increment(spark, path, empty, ["g"], "v") == []
    got = {r["g"]: r["n"] for r in read_rollup(spark, path).collect()}
    want = {g: w["n"] for g, w in _direct(spark, 0, 20).items()}
    assert got == want


def test_unfinalized_partials_roll_up_further(spark, tmp_path):
    # The partials themselves stay mergeable: collapsing the per-(g)
    # table to a single global row via merge_partials must equal a
    # direct global aggregate.
    from mhm_data_pipelines_spark.operators.ivm import merge_partials

    path = str(tmp_path / "roll")
    b0 = spark.createDataFrame(_rows(0, 60), ["g", "v", "u"])
    init_rollup_table(spark, path, b0, ["g"], "v", n_buckets=4)
    partials = read_rollup(spark, path, finalize=False).withColumn(
        "all", F.lit(1)
    )
    one = merge_partials(partials, ["all"]).collect()[0]
    direct = b0.agg(
        F.count("*").alias("n"), F.sum("v").alias("s1")
    ).collect()[0]
    assert one["n"] == direct["n"]
    assert one["s1"] == pytest.approx(direct["s1"], rel=1e-12)
