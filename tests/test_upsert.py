"""Latest-wins merge: version resolution, tie determinism, pass-through
of untouched rows, and partition-scoped rewrite on disk."""

from __future__ import annotations

from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.upsert import (
    latest_wins,
    merge_upsert,
    write_upsert_partitioned,
)

SCHEMA = "k bigint, v bigint, payload string, pt string"


def test_latest_wins_and_ties(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "old", "a"),
            (1, 3, "new", "a"),
            (1, 2, "mid", "a"),
            (2, 5, "zz", "b"),
            (2, 5, "aa", "b"),  # duplicate version: struct order breaks tie
        ],
        SCHEMA,
    )
    got = {r.k: (r.v, r.payload) for r in latest_wins(df, ["k"], "v").collect()}
    assert got[1] == (3, "new")
    assert got[2] == (5, "zz")  # max struct: (5,'zz') > (5,'aa')


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, 1, "one", "a"), (2, 1, "two", "a"), (3, 1, "three", "b")], SCHEMA
    )
    updates = spark.createDataFrame(
        [
            (2, 2, "two-v2", "a"),   # overwrite
            (2, 0, "stale", "a"),    # stale update loses to base? no — loses to v2
            (4, 1, "four", "b"),     # insert
        ],
        SCHEMA,
    )
    got = {r.k: (r.v, r.payload) for r in merge_upsert(base, updates, ["k"], "v").collect()}
    assert got == {
        1: (1, "one"),
        2: (2, "two-v2"),
        3: (1, "three"),
        4: (1, "four"),
    }


def test_partitioned_rewrite_touches_only_updated_partitions(spark, tmp_path):
    base_path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, 1, "one", "a"), (2, 1, "two", "a"), (3, 1, "three", "b"), (5, 1, "five", "c")],
        SCHEMA,
    ).write.partitionBy("pt").parquet(base_path)
    import os

    mtime_b = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(base_path) for f in fs if "pt=b" in r
    )
    updates = spark.createDataFrame([(2, 9, "two-v9", "a")], SCHEMA)
    write_upsert_partitioned(base_path, updates, ["k"], "v", "pt")

    after = spark.read.parquet(base_path)
    got = {r.k: (r.v, r.payload) for r in after.collect()}
    assert got == {
        1: (1, "one"), 2: (9, "two-v9"), 3: (1, "three"), 5: (1, "five")
    }
    # untouched partition files not rewritten
    mtime_b_after = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(base_path) for f in fs if "pt=b" in r
    )
    assert mtime_b_after == mtime_b


def test_crash_between_write_and_swap_leaves_base_intact(
    spark, tmp_path, monkeypatch
):
    """Commit-protocol crash injection: die after the temp-dir write but
    before any partition swap — the base table must be byte-identical,
    with only an orphaned temp dir left, and a retry must converge."""
    import os

    import pytest

    import mhm_data_pipelines_spark.operators.upsert as up

    base_path = str(tmp_path / "tbl3")
    spark.createDataFrame(
        [(1, 1, "one", "a"), (2, 1, "two", "a"), (3, 1, "three", "b")],
        SCHEMA,
    ).write.partitionBy("pt").parquet(base_path)
    before = {
        r.k: (r.v, r.payload) for r in spark.read.parquet(base_path).collect()
    }
    updates = spark.createDataFrame([(2, 9, "two-v9", "a")], SCHEMA)

    def boom(*a, **k):
        raise RuntimeError("injected crash before swap")

    monkeypatch.setattr(up, "_swap_partitions", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        up.write_upsert_partitioned(base_path, updates, ["k"], "v", "pt")
    after_crash = {
        r.k: (r.v, r.payload) for r in spark.read.parquet(base_path).collect()
    }
    assert after_crash == before  # base untouched
    orphans = [
        d for d in os.listdir(tmp_path) if "__upsert_tmp_" in d
    ]
    assert orphans  # written-but-unpublished merge survives for cleanup

    monkeypatch.undo()
    up.write_upsert_partitioned(base_path, updates, ["k"], "v", "pt")
    got = {
        r.k: (r.v, r.payload) for r in spark.read.parquet(base_path).collect()
    }
    assert got == {1: (1, "one"), 2: (9, "two-v9"), 3: (1, "three")}


def test_partitioned_rewrite_restores_overwrite_mode(spark, tmp_path):
    """The session-global partitionOverwriteMode must come back to its
    prior value (upsert sets 'dynamic' only for its own write)."""
    base_path = str(tmp_path / "tbl2")
    spark.createDataFrame([(1, 1, "one", "a")], SCHEMA).write.partitionBy(
        "pt"
    ).parquet(base_path)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        updates = spark.createDataFrame([(1, 2, "one-v2", "a")], SCHEMA)
        write_upsert_partitioned(base_path, updates, ["k"], "v", "pt")
        assert (
            spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            == "static"
        )
        got = {r.k: (r.v, r.payload) for r in spark.read.parquet(base_path).collect()}
        assert got == {1: (2, "one-v2")}
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
