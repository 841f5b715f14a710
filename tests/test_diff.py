"""snapshot_diff: add/remove/change classification, changed-column
lists, null handling, and upsert round-trip consistency."""

from __future__ import annotations

import pytest

from mhm_data_pipelines_spark.operators.diff import snapshot_diff


def _rows(df):
    return {
        tuple(r[k] for k in ("id", "change", "changed_cols"))
        for r in df.collect()
    }


def test_basic_diff(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        ["id", "name", "v"],
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "C", 30), (4, "d", 41), (5, "e", 50)],
        ["id", "name", "v"],
    )
    got = _rows(snapshot_diff(old, new, keys=["id"]))
    assert got == {
        (1, "removed", ""),
        (3, "changed", "name"),
        (4, "changed", "v"),
        (5, "added", ""),
    }


def test_multi_column_change_sorted(spark):
    old = spark.createDataFrame([(1, "a", 1, "x")], ["id", "b", "a", "c"])
    new = spark.createDataFrame([(1, "z", 2, "x")], ["id", "b", "a", "c"])
    got = _rows(snapshot_diff(old, new, keys=["id"]))
    assert got == {(1, "changed", "a,b")}


def test_null_safe_compare(spark):
    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "id int, v string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (3, "y")], "id int, v string"
    )
    got = _rows(snapshot_diff(old, new, keys=["id"]))
    # NULL == NULL is "unchanged"; NULL vs value is "changed".
    assert got == {(2, "changed", "v"), (3, "changed", "v")}


def test_schema_drift_columns_ignored(spark):
    old = spark.createDataFrame([(1, "a", 9)], ["id", "v", "old_only"])
    new = spark.createDataFrame([(1, "a", 7)], ["id", "v", "new_only"])
    assert snapshot_diff(old, new, keys=["id"]).count() == 0


def test_compare_cols_subset(spark):
    old = spark.createDataFrame([(1, "a", 1)], ["id", "v", "w"])
    new = spark.createDataFrame([(1, "b", 2)], ["id", "v", "w"])
    got = _rows(snapshot_diff(old, new, keys=["id"], compare_cols=["w"]))
    assert got == {(1, "changed", "w")}


def test_empty_keys_rejected(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError):
        snapshot_diff(df, df, keys=[])


def test_identical_snapshots_empty_diff(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    assert snapshot_diff(df, df, keys=["id"]).count() == 0
