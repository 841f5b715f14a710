"""Spearman rho + RBO — hand-computed values and invariants."""

import math

import pytest

from mhm_data_pipelines_spark.operators.correlation import rbo, spearman_rho


def _rho(spark, pairs):
    df = spark.createDataFrame(pairs, "x double, y double")
    row = spearman_rho(df, "x", "y").collect()[0]
    return row["n"], row["rho"]


def test_rho_perfect_monotone(spark):
    n, rho = _rho(spark, [(1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 99.0)])
    assert (n, rho) == (4, 1.0)
    n, rho = _rho(spark, [(1.0, 9.0), (2.0, 7.0), (3.0, 3.0)])
    assert (n, rho) == (3, -1.0)


def test_rho_hand_computed_with_ties(spark):
    # x: 1,2,2,4 -> ranks 1, 2.5, 2.5, 4 ; y: 10,30,20,40 -> 1,3,2,4.
    # Pearson on those ranks: by scipy, rho = 0.9486832980505138.
    pairs = [(1.0, 10.0), (2.0, 30.0), (2.0, 20.0), (4.0, 40.0)]
    n, rho = _rho(spark, pairs)
    assert n == 4
    assert rho == pytest.approx(0.948683, abs=1e-6)


def test_rho_constant_column_null(spark):
    n, rho = _rho(spark, [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)])
    assert n == 3 and rho is None


def test_rho_null_rows_dropped(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (None, 3.0), (4.0, None)],
        "x double, y double",
    )
    row = spearman_rho(df, "x", "y").collect()[0]
    assert row["n"] == 2 and row["rho"] == 1.0


def _rbo(spark, a, b, **kw):
    da = spark.createDataFrame(a, "query_id long, item_id string, rank int")
    db = spark.createDataFrame(b, "query_id long, item_id string, rank int")
    return {r["query_id"]: r["rbo"] for r in rbo(da, db, **kw).collect()}


def test_rbo_identical_and_disjoint(spark):
    a = [(1, f"i{k}", k) for k in range(1, 6)]
    b_same = list(a)
    b_disj = [(1, f"j{k}", k) for k in range(1, 6)]
    p, d = 0.9, 5
    # identical rankings at full depth-d lists: overlap at k is k ->
    # rbo = (1-p) * sum p^{k-1} = 1 - p^d
    got = _rbo(spark, a, b_same, p=p, depth=d)
    assert got[1] == pytest.approx(round(1 - p**d, 6), abs=1e-6)
    assert _rbo(spark, a, b_disj, p=p, depth=d)[1] == 0.0


def test_rbo_hand_computed(spark):
    # A = [x, y], B = [y, x], d=2, p=0.5:
    # k=1: |∩|=0; k=2: |∩|=2 -> rbo = 0.5 * (0.5^1 * 2/2) = 0.25
    a = [(1, "x", 1), (1, "y", 2)]
    b = [(1, "y", 1), (1, "x", 2)]
    got = _rbo(spark, a, b, p=0.5, depth=2)
    assert got[1] == pytest.approx(0.25, abs=1e-9)


def test_rbo_depth_prunes_and_top_weighted(spark):
    # agreement at the TOP scores higher than the same agreement lower
    a = [(1, "x", 1), (1, "q", 2), (2, "u", 1), (2, "x", 2)]
    b = [(1, "x", 1), (1, "r", 2), (2, "v", 1), (2, "x", 2)]
    got = _rbo(spark, a, b, p=0.9, depth=2)
    assert got[1] > got[2] > 0.0


def test_rbo_validates_params(spark):
    df = spark.createDataFrame([(1, "x", 1)], "query_id long, item_id string, rank int")
    with pytest.raises(ValueError):
        rbo(df, df, p=1.0)
    with pytest.raises(ValueError):
        rbo(df, df, depth=0)
