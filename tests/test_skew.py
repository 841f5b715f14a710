"""Salted aggregation/join must be result-identical to the unsalted
forms (on a deliberately skewed distribution), per SURVEY §4.2's
participant-skew watch item."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50)).alias("k"),
        (F.col("id") % 31).cast("double").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_agg_equals_plain(spark, skewed):
    got = salted_agg(
        skewed,
        ["k"],
        {
            "n": ("count", "*"),
            "total": ("sum", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
            "mean": ("avg", "v"),
        },
        buckets=8,
    )
    want = skewed.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("total"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.avg("v").alias("mean"),
    )
    g = {r.k: r for r in got.collect()}
    w = {r.k: r for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert g[k].n == w[k].n
        assert g[k].total == pytest.approx(w[k].total)
        assert g[k].lo == w[k].lo and g[k].hi == w[k].hi
        assert g[k].mean == pytest.approx(w[k].mean)


def test_salted_agg_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError, match="not salt-decomposable"):
        salted_agg(skewed, ["k"], {"d": ("count_distinct", "v")})


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(50)],
        "k string, label string",
    )
    got = salted_join(skewed, dim, on=["k"], buckets=4)
    want = skewed.join(dim, "k")
    assert got.count() == want.count()
    gc = got.groupBy("k", "label").count().collect()
    wc = want.groupBy("k", "label").count().collect()
    assert sorted(map(tuple, gc)) == sorted(map(tuple, wc))


def test_skew_report_hand_computed(spark):
    from mhm_data_pipelines_spark.operators.skew import skew_report

    # key 'a' x4, 'b' x2, 'c' x1, 'd' x1 -> mean 2, total 8
    rows = [(i, k) for i, k in enumerate("aaaabbcd")]
    df = spark.createDataFrame(rows, "id long, k string")
    got = skew_report(df, ["k"], top_k=3).collect()
    assert [(r.col_name, r.key, r.n_rows, r.rank) for r in got] == [
        ("k", "a", 4, 1),
        ("k", "b", 2, 2),
        ("k", "c", 1, 3),  # tie with 'd' broken by key asc
    ]
    by_key = {r.key: r for r in got}
    assert by_key["a"].share == 0.5
    assert by_key["a"].mean_ratio == 2.0
    assert by_key["b"].rank == 2


def test_skew_report_multi_column_and_validation(spark):
    import pytest as _pytest

    from mhm_data_pipelines_spark.operators.skew import skew_report

    df = spark.createDataFrame(
        [(1, "x", 10), (2, "x", 10), (3, "y", 20)],
        "id long, a string, b int",
    )
    got = skew_report(df, ["a", "b"], top_k=5).collect()
    # int keys cast to string; per-column report sections
    assert {(r.col_name, r.key) for r in got} == {
        ("a", "x"), ("a", "y"), ("b", "10"), ("b", "20"),
    }
    assert [r.col_name for r in got] == sorted(r.col_name for r in got)
    with _pytest.raises(ValueError):
        skew_report(df, [])


def test_join_size_preflight_exact(spark):
    from mhm_data_pipelines_spark.operators.skew import (
        join_size_preflight,
    )

    left = spark.createDataFrame(
        [(1, "a")] * 3 + [(2, "b")] * 2 + [(3, "c")],
        "k long, v string",
    )
    right = spark.createDataFrame(
        [(1, "x")] * 4 + [(2, "y")] + [(9, "z")],
        "k long, w string",
    )
    got = join_size_preflight(left, right, ["k"]).collect()[0]
    # key 1: 3*4=12, key 2: 2*1=2; key 3/9 unmatched
    assert got.n_out_rows == 14
    assert got.n_matched_keys == 2
    assert (got.n_left_rows, got.n_right_rows) == (6, 6)
    assert got.max_key_fanout == 12
    assert got.top_fanout_share == 1.0
    # ground truth: the real join
    assert left.join(right, "k").count() == 14


def test_join_size_preflight_disjoint_keys(spark):
    from mhm_data_pipelines_spark.operators.skew import (
        join_size_preflight,
    )

    a = spark.createDataFrame([(1, "a")], "k long, v string")
    b = spark.createDataFrame([(2, "b")], "k long, w string")
    got = join_size_preflight(a, b, ["k"]).collect()[0]
    assert got.n_out_rows == 0 and got.n_matched_keys == 0
    assert got.max_key_fanout == 0
