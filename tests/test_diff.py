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


def test_content_manifest_layout_invariant(spark):
    from mhm_data_pipelines_spark.operators.diff import content_manifest

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "id long, v string"
    )
    a = content_manifest(df, n_buckets=8).orderBy("bucket").collect()
    b = (
        content_manifest(df.repartition(7, "v"), n_buckets=8)
        .orderBy("bucket")
        .collect()
    )
    assert a == b
    assert sum(r.n_rows for r in a) == 200


def test_content_manifest_detects_content_change(spark):
    from mhm_data_pipelines_spark.operators.diff import content_manifest

    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(1, "a"), (2, "c")], "id long, v string")
    m1 = {r.bucket: r for r in content_manifest(df1, n_buckets=4).collect()}
    m2 = {r.bucket: r for r in content_manifest(df2, n_buckets=4).collect()}
    assert m1 != m2


def test_content_manifest_null_vs_empty_string(spark):
    from mhm_data_pipelines_spark.operators.diff import content_manifest

    df1 = spark.createDataFrame([(1, None)], "id long, v string")
    df2 = spark.createDataFrame([(1, "")], "id long, v string")
    m1 = content_manifest(df1, n_buckets=1).collect()
    m2 = content_manifest(df2, n_buckets=1).collect()
    assert m1[0].xor_sig != m2[0].xor_sig


def test_content_manifest_duplicate_rows_caught_by_count(spark):
    from mhm_data_pipelines_spark.operators.diff import content_manifest

    one = spark.createDataFrame([(1, "a")], "id long, v string")
    three = spark.createDataFrame([(1, "a")] * 3, "id long, v string")
    m1 = content_manifest(one, n_buckets=1).collect()[0]
    m3 = content_manifest(three, n_buckets=1).collect()[0]
    # xor of an odd count equals the single hash; n_rows disambiguates
    assert m1.xor_sig == m3.xor_sig
    assert (m1.n_rows, m3.n_rows) == (1, 3)


def test_content_manifest_empty_columns_rejected(spark):
    from mhm_data_pipelines_spark.operators.diff import content_manifest

    df = spark.createDataFrame([(1,)], "id long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one column"):
        content_manifest(df, columns=[])


def test_merge_manifests_equals_batch_manifest(spark):
    from mhm_data_pipelines_spark.operators.diff import (
        content_manifest,
        merge_manifests,
    )

    df = spark.createDataFrame(
        [(i, f"v{i % 7}") for i in range(300)], "id long, v string"
    )
    whole = content_manifest(df, n_buckets=8).orderBy("bucket").collect()
    parts = [
        content_manifest(df.filter(f"id % 3 = {k}"), n_buckets=8)
        for k in range(3)
    ]
    merged = (
        merge_manifests(parts[0].unionByName(parts[1]).unionByName(parts[2]))
        .orderBy("bucket")
        .collect()
    )
    assert merged == whole
