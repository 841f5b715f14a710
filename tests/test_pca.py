"""Distributed PCA: moment partials merge to exact numpy covariance,
fit recovers planted principal directions, projection matches the
closed-form (x - mean) @ comps.T, and the moment pass never shuffles
the corpus (one mapInPandas over the scan)."""

from __future__ import annotations

import numpy as np
import pytest

from mhm_data_pipelines_spark.operators.pca import (
    covariance_long,
    embedding_moments,
    fit_pca,
    project,
)

DIM = 6
N = 200


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    # planted structure: big variance on axis 0, medium on axis 1
    x = rng.normal(size=(N, DIM)) * np.array([5.0, 2.0, 1, 1, 1, 1])
    x = x + np.array([10.0, -3.0, 0, 0, 0, 0])  # nonzero mean
    rows = [(i, x[i].tolist()) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(7), x


def test_moments_merge_to_exact_sums(spark, vecs):
    df, x = vecs
    parts = embedding_moments(df).toPandas()
    assert parts["n"].sum() == N
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    np.testing.assert_allclose(s, x.sum(axis=0), rtol=1e-12)
    g = np.sum(np.stack(parts["g"].to_numpy()), axis=0)
    iu = np.triu_indices(DIM)
    np.testing.assert_allclose(g, (x.T @ x)[iu], rtol=1e-12)


def test_covariance_long_matches_numpy(spark, vecs):
    df, x = vecs
    out = covariance_long(df, dim=DIM).toPandas()
    assert len(out) == DIM * (DIM + 1) // 2
    want = np.cov(x.T, bias=True)
    for r in out.itertuples():
        assert r.cov == pytest.approx(want[r.i, r.j], rel=1e-9, abs=1e-9)


def test_fit_pca_recovers_planted_axes(spark, vecs):
    df, x = vecs
    mean, comps, ev = fit_pca(df, dim=DIM, n_components=2)
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-9)
    # top component aligned with axis 0, second with axis 1
    assert abs(comps[0][0]) > 0.99
    assert abs(comps[1][1]) > 0.99
    assert ev[0] > ev[1] > 0
    # rows orthonormal
    np.testing.assert_allclose(comps @ comps.T, np.eye(2), atol=1e-9)
    # sign rule: largest-|loading| entry positive
    for c in comps:
        assert c[np.abs(c).argmax()] > 0


def test_project_matches_closed_form(spark, vecs):
    df, x = vecs
    mean, comps, _ = fit_pca(df, dim=DIM, n_components=2)
    out = project(df, mean, comps).orderBy("vec_id").toPandas()
    got = np.stack(out["pca"].to_numpy())
    want = (x - mean) @ comps.T
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
    # schema: passthrough columns retained
    assert list(out.columns) == ["vec_id", "embedding", "pca"]


def test_moments_plan_has_no_shuffle(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    plan = (
        embedding_moments(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_moments_dim_mismatch_raises(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="dim"):
        embedding_moments(df, dim=3).collect()


# ------------------------------------------------------------- whitening
import numpy as np

from mhm_data_pipelines_spark.operators.pca import fit_whitening, whiten


def test_whitening_decorrelates(spark):
    rng = np.random.default_rng(7)
    # strongly correlated 4-D gaussian
    a = rng.normal(size=(400, 2))
    x = np.hstack([a, a @ np.array([[2.0, 1.0], [0.5, -1.0]])])
    x += rng.normal(scale=0.1, size=x.shape)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    mean, w = fit_whitening(df, dim=4, eps=1e-9)
    assert w.shape == (4, 4)
    assert np.allclose(w, w.T)  # ZCA whitener is symmetric
    out = whiten(df, mean, w, out_col="white").collect()
    y = np.stack([np.array(r["white"]) for r in out])
    cov = np.cov(y, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(4), atol=0.05)


def test_whitening_eps_shrinks_null_directions(spark):
    # a constant dimension (zero variance) must NOT blow up
    rows = [(i, [float(i % 7), 3.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mean, w = fit_whitening(df, dim=2, eps=1e-4)
    assert np.all(np.isfinite(w))
    y = np.stack(
        [np.array(r["white"]) for r in whiten(df, mean, w).collect()]
    )
    # the constant dimension stays ~0 after centering+whitening
    assert np.allclose(y[:, 1], 0.0, atol=1e-6)
