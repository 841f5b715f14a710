"""NULL imputation (operators.repair)."""

import pytest

from mhm_data_pipelines_spark.operators.repair import (
    impute_nulls,
    impute_stats,
)

ROWS = [
    # group a: values 1, 2, 3, NULL -> median 2.0, mean 2.0
    (1, "a", 1.0, "x"),
    (2, "a", 2.0, "x"),
    (3, "a", 3.0, "y"),
    (4, "a", None, None),
    # group b: single value + null; mode tie in cat ("p" vs "q" 1x each)
    (5, "b", 10.0, "q"),
    (6, "b", None, "p"),
    # group c: ALL null -> stays null
    (7, "c", None, None),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        ROWS, "id long, grp string, v double, cat string"
    )


def test_impute_median_and_mode_per_group(spark, frame):
    out = impute_nulls(
        frame,
        {"v": "median", "cat": "mode"},
        group_col="grp",
        flag=True,
    )
    got = {r.id: r for r in out.collect()}
    assert got[4].v == 2.0 and got[4].v_imputed
    assert not got[1].v_imputed
    # mode of group a cats: x (2) beats y
    assert got[4].cat == "x"
    # group b: median of single value
    assert got[6].v == 10.0
    # mode tie in group b ("p", "q" once each) -> smallest value "p"
    assert got[4].cat_imputed and got[6].cat == "p"
    # all-null group stays null, flag false
    assert got[7].v is None and not got[7].v_imputed


def test_impute_global_mean_preserves_type(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 20)], "id long, n int"
    )
    out = {r.id: r for r in impute_nulls(df, {"n": "mean"}).collect()}
    assert out[2].n == 15  # cast back to int
    assert dict(impute_nulls(df, {"n": "mean"}).dtypes)["n"] == "int"


def test_impute_stats_shape_and_validation(spark, frame):
    st = {r._grp: r for r in impute_stats(
        frame, {"v": "median", "cat": "mode"}, group_col="grp"
    ).collect()}
    assert st["a"]._fill_v == 2.0 and st["a"]._fill_cat == "x"
    assert st["c"]._fill_v is None
    with pytest.raises(ValueError, match="strategies"):
        impute_stats(frame, {"v": "nope"})
    with pytest.raises(ValueError, match="strategies"):
        impute_stats(frame, {})


# --------------------------------------------------------- robust outliers
from mhm_data_pipelines_spark.operators.repair import robust_outlier_stats


def test_robust_outliers_hand_computed(spark):
    # group a: values 1..9 plus outlier 100. median 5.5, deviations
    # |x-5.5|: .5,1.5,2.5,3.5,4.5 x2 (symmetric) + 94.5 -> MAD = 2.5
    # modified z of 100: .6745*94.5/2.5 = 25.5 -> outlier; z of 9:
    # .6745*3.5/2.5 = .944 -> not.
    rows = [("a", float(v)) for v in range(1, 10)] + [("a", 100.0)]
    df = spark.createDataFrame(rows, "grp string, x double")
    out = robust_outlier_stats(df, "x", ["grp"]).collect()[0]
    assert out["n"] == 10
    assert out["median"] == 5.5
    assert out["mad"] == 2.5  # devs sorted: .5,.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,94.5 -> (2.5+2.5)/2
    assert out["n_outliers"] == 1


def test_robust_outliers_zero_mad_null(spark):
    rows = [("a", 5.0)] * 6 + [("a", 99.0)]
    df = spark.createDataFrame(rows, "grp string, x double")
    out = robust_outlier_stats(df, "x", ["grp"]).collect()[0]
    assert out["mad"] == 0.0 and out["n_outliers"] is None


def test_robust_outliers_per_group_and_null_values(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None),
            ("b", 10.0), ("b", 10.0), ("b", 10.0), ("b", 1000.0)]
    df = spark.createDataFrame(rows, "grp string, x double")
    out = {r["grp"]: r for r in robust_outlier_stats(df, "x", ["grp"]).collect()}
    assert out["a"]["n"] == 3 and out["a"]["n_outliers"] == 0
    assert out["b"]["n_outliers"] is None  # MAD 0 (3 of 4 identical)


def test_winsorize_hand_case(spark):
    from mhm_data_pipelines_spark.operators.repair import (
        winsorize,
        winsorize_bounds,
    )

    # g=a: 0..10 -> p10 = 1.0, p90 = 9.0 (exact interpolation)
    rows = [("a", float(i)) for i in range(11)]
    rows += [("b", 5.0), ("b", 5.0), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    b = {
        r["g"]: (r["lo"], r["hi"])
        for r in winsorize_bounds(df, "v", ["g"], 0.1, 0.9).collect()
    }
    assert b["a"] == (1.0, 9.0)
    assert b["b"] == (5.0, 5.0)
    got = winsorize(df, "v", ["g"], 0.1, 0.9, flag=True).collect()
    byrow = {(r["g"], r["v"]): r for r in got}
    assert byrow[("a", 0.0)]["v_w"] == 1.0
    assert byrow[("a", 0.0)]["v_clipped"] == -1
    assert byrow[("a", 10.0)]["v_w"] == 9.0
    assert byrow[("a", 10.0)]["v_clipped"] == 1
    assert byrow[("a", 5.0)]["v_w"] == 5.0
    assert byrow[("a", 5.0)]["v_clipped"] == 0
    assert byrow[("b", None)]["v_w"] is None
    assert byrow[("b", None)]["v_clipped"] is None
    # global (keys=None) path
    g = winsorize(df.filter("v is not null"), "v", None, 0.0, 0.5)
    mx = max(r["v_w"] for r in g.collect())
    import pytest as _pt
    assert mx == _pt.approx(5.0)


def test_winsorize_validation_and_zero_shuffle_clamp(spark):
    import pytest as _pt

    from mhm_data_pipelines_spark.operators.repair import winsorize_bounds

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with _pt.raises(ValueError):
        winsorize_bounds(df, "v", ["g"], 0.9, 0.1)


def test_quantile_normalize_equalizes_distributions(spark):
    """Two groups with very different scales map onto the same global
    distribution: post-transform group means converge, ranks are
    preserved within groups, NULLs pass through, and the global min/max
    map to the grid endpoints."""
    import numpy as np
    import pytest

    from mhm_data_pipelines_spark.operators.repair import (
        quantile_normalize,
    )

    rng = np.random.RandomState(13)
    a = rng.normal(0, 1, 200)       # small scale
    b = rng.normal(1000, 50, 200)   # wildly different scale
    rows = [("a", i, float(v)) for i, v in enumerate(a)]
    rows += [("b", 1000 + i, float(v)) for i, v in enumerate(b)]
    rows.append(("a", 9999, None))
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = quantile_normalize(df, "v", "g", n_quantiles=101).collect()
    byg = {}
    for r in out:
        if r["id"] == 9999:
            assert r["v_qnorm"] is None
            continue
        byg.setdefault(r["g"], []).append((r["v"], r["v_qnorm"]))
    ma = np.mean([q for _, q in byg["a"]])
    mb = np.mean([q for _, q in byg["b"]])
    # raw means differ by ~1000; normalized means nearly coincide
    assert abs(ma - mb) < 30
    for g in ("a", "b"):
        vs = sorted(byg[g])
        qs = [q for _, q in vs]
        assert qs == sorted(qs)  # rank-preserving within group
    # each group spans the SAME full global range after the transform
    # (p=0 -> global min, p=1 -> global max for every group)
    for g in ("a", "b"):
        qs = [q for _, q in byg[g]]
        assert min(qs) == pytest.approx(min(a.min(), b.min()), abs=1e-5)
        assert max(qs) == pytest.approx(max(a.max(), b.max()), abs=1e-5)
    allq = [q for g in byg.values() for _, q in g]
    allv = [v for g in byg.values() for v, _ in g]
    assert min(allq) == pytest.approx(round(min(allv), 6), abs=1e-9)
    assert max(allq) == pytest.approx(round(max(allv), 6), abs=1e-9)


def test_quantile_normalize_validation(spark):
    import pytest

    from mhm_data_pipelines_spark.operators.repair import (
        quantile_normalize,
    )

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="n_quantiles"):
        quantile_normalize(df, "v", "g", n_quantiles=1)
