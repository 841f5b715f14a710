"""HLL sketch rollups: merge-consistency and accuracy invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.sketches import (
    estimate,
    rollup_sketches,
    sketch_distinct,
)


def _frame(spark):
    # 3 groups x overlapping members; user u{i} appears in group i%5
    # and (i+1)%5 -> known per-group and global distincts.
    rows = []
    for i in range(200):
        rows.append((i % 5, f"u{i}"))
        rows.append(((i + 1) % 5, f"u{i}"))
    return spark.createDataFrame(rows, ["g", "user"])


def test_sketch_rollup_accuracy_and_merge(spark):
    df = _frame(spark)
    per_g = sketch_distinct(df, ["g"], key="user")
    est_g = {
        r["g"]: r["sketch_estimate"]
        for r in estimate(per_g).collect()
    }
    exact_g = {
        r["g"]: r["n"]
        for r in df.groupBy("g")
        .agg(F.count_distinct("user").alias("n"))
        .collect()
    }
    for g, n in exact_g.items():
        assert abs(est_g[g] - n) <= 0.1 * n, (g, est_g[g], n)
    # Merge path: union the 5 per-group sketches into one global
    # sketch WITHOUT touching raw rows; overlapping members must not
    # double-count (200 distinct users, not sum(per-group)=400).
    merged = rollup_sketches(
        per_g.withColumn("all", F.lit(1)), ["all"]
    )
    (row,) = estimate(merged).collect()
    assert abs(row["sketch_estimate"] - 200) <= 20
    assert sum(exact_g.values()) == 400  # the naive sum IS wrong


def test_sketch_is_small_and_mergeable_across_frames(spark):
    df = _frame(spark)
    sk = sketch_distinct(df, ["g"], key="user")
    (r,) = sk.limit(1).collect()
    assert isinstance(r["sketch"], (bytes, bytearray))
    assert len(r["sketch"]) < 64 * 1024  # KBs regardless of cardinality
