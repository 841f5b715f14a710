"""Gap-fill and rolling z-score: crafted series with known gaps,
forward-fill values, cold-start nulls, tie determinism."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.timeseries import (
    gap_fill_daily,
    rolling_zscore,
)


def _ts(day, hour=12):
    return dt.datetime(2024, 1, day, hour)


def test_gap_fill_inserts_and_forward_fills(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(1), 10.0),
            (1, _ts(1, 18), 20.0),   # same day → avg 15
            (1, _ts(4), 40.0),       # days 2,3 missing
            (2, _ts(2), 5.0),        # single-day key: no gaps
        ],
        "user_id bigint, ts timestamp, value double",
    )
    out = {
        (r.user_id, str(r.day)): (r.value, r.was_gap)
        for r in gap_fill_daily(df).collect()
    }
    assert out == {
        (1, "2024-01-01"): (15.0, False),
        (1, "2024-01-02"): (15.0, True),
        (1, "2024-01-03"): (15.0, True),
        (1, "2024-01-04"): (40.0, False),
        (2, "2024-01-02"): (5.0, False),
    }


def test_rolling_zscore_cold_start_and_spike(spark):
    # 7 identical readings then a spike: rows 0-6 have no full window
    # (null z); the 8th is scored against a zero-std window → null; add
    # jitter so std>0 and the spike is flagged.
    rows = [(1, _ts(1, h), float(v)) for h, v in enumerate([10, 12, 10, 12, 10, 12, 10])]
    rows.append((1, _ts(1, 7), 100.0))
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    got = rolling_zscore(df, window=7).orderBy("ts").collect()
    assert all(r.z is None for r in got[:7])  # cold start
    spike = got[7]
    # mean≈10.857, std_pop≈0.99 → z ≈ 90
    assert spike.z is not None and spike.z > 50


def test_rolling_zscore_zero_std_null(spark):
    rows = [(1, _ts(1, h), 5.0) for h in range(8)]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    got = rolling_zscore(df, window=7).collect()
    assert all(r.z is None for r in got)


def _iso(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_funnel_progress_requires_order(spark):
    from mhm_data_pipelines_spark.operators.timeseries import (
        funnel_progress,
    )

    rows = [
        # user 1: clean view -> click -> buy
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 11:00:00"),
        (1, "buy", "2024-01-01 12:00:00"),
        # user 2: click BEFORE view -> chain stops after view
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 10:00:00"),
        # user 3: view only
        (3, "view", "2024-01-01 10:00:00"),
        # user 4: never viewed -> absent
        (4, "click", "2024-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(
        [(u, t, _iso(s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )
    got = {r.user_id: r for r in funnel_progress(
        df, ["view", "click", "buy"]
    ).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].t_2 is not None and got[1].t_3 is not None
    assert got[2].t_2 is None and got[2].t_3 is None
    assert got[3].t_2 is None


def test_funnel_progress_within_horizon(spark):
    from mhm_data_pipelines_spark.operators.timeseries import (
        funnel_progress,
    )

    rows = [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-09 10:00:00"),  # 8 days later
    ]
    df = spark.createDataFrame(
        [(u, t, _iso(s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )
    loose = funnel_progress(df, ["view", "click"]).collect()[0]
    tight = funnel_progress(
        df, ["view", "click"], within="7 days"
    ).collect()[0]
    assert loose.t_2 is not None and tight.t_2 is None


def test_retention_cohorts_triangle(spark):
    from mhm_data_pipelines_spark.operators.timeseries import (
        retention_cohorts,
    )

    rows = [
        # cohort week of 2024-01-01: users 1, 2
        (1, "2024-01-02 10:00:00"),
        (2, "2024-01-03 10:00:00"),
        # user 1 returns in week +1 and +2; user 2 only +2
        (1, "2024-01-09 10:00:00"),
        (1, "2024-01-16 10:00:00"),
        (2, "2024-01-17 10:00:00"),
        # cohort of 2024-01-08: user 3
        (3, "2024-01-10 10:00:00"),
    ]
    df = spark.createDataFrame(
        [(u, _iso(s)) for u, s in rows], "user_id long, ts timestamp"
    )
    got = {
        (str(r.cohort)[:10], r.offset): r.n_active
        for r in retention_cohorts(df, period="week").collect()
    }
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 1)] == 1
    assert got[("2024-01-01", 2)] == 2
    assert got[("2024-01-08", 0)] == 1


def test_ols_trend_hand_case_and_degenerates(spark):
    from mhm_data_pipelines_spark.operators.timeseries import ols_trend

    rows = [
        # g=a: y = 2x + 1 exactly -> slope 2, intercept 1, r2 1
        ("a", 0.0, 1.0), ("a", 1.0, 3.0), ("a", 2.0, 5.0),
        # g=b: known least squares: x=[0,1,2], y=[0,0,3]
        ("b", 0.0, 0.0), ("b", 1.0, 0.0), ("b", 2.0, 3.0),
        # g=c: zero x-variance
        ("c", 1.0, 0.0), ("c", 1.0, 5.0),
        # g=d: zero y-variance (flat line) -> slope 0, r2 NULL
        ("d", 0.0, 7.0), ("d", 1.0, 7.0),
        # g=e: null x / null y rows are excluded together
        ("e", 0.0, 1.0), ("e", 1.0, 2.0), ("e", None, 9.0),
        ("e", 5.0, None),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in ols_trend(df, ["g"], "x", "y").collect()}
    import numpy as np

    assert got["a"]["slope"] == pytest.approx(2.0)
    assert got["a"]["intercept"] == pytest.approx(1.0)
    assert got["a"]["r2"] == pytest.approx(1.0)
    bs, bi = np.polyfit([0, 1, 2], [0, 0, 3], 1)
    assert got["b"]["slope"] == pytest.approx(bs)
    assert got["b"]["intercept"] == pytest.approx(bi)
    assert got["c"]["slope"] is None and got["c"]["r2"] is None
    assert got["d"]["slope"] == pytest.approx(0.0)
    assert got["d"]["r2"] is None
    assert got["e"]["n"] == 2 and got["e"]["slope"] == pytest.approx(1.0)


def test_acf_matches_numpy(spark):
    """Per-series r_lag equals the standard estimator (full-series mean
    and variance normalizer) computed independently in NumPy."""
    import numpy as np

    from mhm_data_pipelines_spark.operators.timeseries import acf

    rng = np.random.RandomState(3)
    y = np.cumsum(rng.normal(0, 1, 80))  # random walk: strong ACF
    rows = [("s1", i, float(v)) for i, v in enumerate(y)]
    # second, anti-correlated series
    y2 = np.array([(-1.0) ** i for i in range(40)])
    rows += [("s2", i, float(v)) for i, v in enumerate(y2)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {
        (r["k"], r["lag"]): r
        for r in acf(df, ["k"], ["t"], "v", max_lag=3).collect()
    }

    for key, series in (("s1", y), ("s2", y2)):
        m, den = series.mean(), ((series - series.mean()) ** 2).sum()
        for lag in (1, 2, 3):
            num = ((series[:-lag] - m) * (series[lag:] - m)).sum()
            r = got[(key, lag)]
            assert r["n_pairs"] == len(series) - lag
            assert r["r"] == pytest.approx(num / den, rel=1e-9), (key, lag)
    assert got[("s2", 1)]["r"] < -0.9  # alternating series
    assert got[("s1", 1)]["r"] > 0.8  # random walk


def test_acf_gaps_and_zero_variance(spark):
    from mhm_data_pipelines_spark.operators.timeseries import acf

    df = spark.createDataFrame(
        [("s", 0, 1.0), ("s", 1, None), ("s", 2, 3.0), ("s", 3, 4.0),
         ("c", 0, 2.0), ("c", 1, 2.0), ("c", 2, 2.0)],
        "k string, t long, v double",
    )
    got = {(r["k"], r["lag"]): r for r in
           acf(df, ["k"], ["t"], "v", max_lag=2).collect()}
    # NULL at t=1 breaks the (0,1) and (1,2) pairs but not (2,3)
    assert got[("s", 1)]["n_pairs"] == 1
    # lag 2 pairs (0,2) and (1,3): (1,3) broken by the NULL at 1
    assert got[("s", 2)]["n_pairs"] == 1
    # constant series: zero variance -> NULL r, pairs still counted
    assert got[("c", 1)]["n_pairs"] == 2
    assert got[("c", 1)]["r"] is None


def test_ccf_detects_planted_lead(spark):
    """y = x shifted by 2 steps (plus noise-free construction): the CCF
    peaks exactly at lag +2 with r ~= 1, matches a NumPy replay at
    every lag, and the symmetric identity r_-l(x,y) = r_l(y,x) holds."""
    import numpy as np

    from mhm_data_pipelines_spark.operators.timeseries import ccf

    rng = np.random.RandomState(9)
    x = rng.normal(0, 1, 100)
    y = np.roll(x, 2)  # y_t = x_{t-2}: x leads y by 2
    rows = [("s", i, float(x[i]), float(y[i])) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, t long, x double, y double")
    got = {r["lag"]: r for r in
           ccf(df, ["k"], ["t"], "x", "y", max_lag=3).collect()}
    assert sorted(got) == list(range(-3, 4))

    mx, my = x.mean(), y.mean()
    den = np.sqrt(((x - mx) ** 2).sum() * ((y - my) ** 2).sum())
    for lag in range(-3, 4):
        if lag >= 0:
            xs, ys = x[: 100 - lag], y[lag:]
        else:
            xs, ys = x[-lag:], y[: 100 + lag]
        num = ((xs - mx) * (ys - my)).sum()
        assert got[lag]["n_pairs"] == 100 - abs(lag)
        assert got[lag]["r"] == pytest.approx(num / den, rel=1e-9), lag
    assert got[2]["r"] > 0.9  # the planted lead
    assert abs(got[0]["r"]) < 0.5

    # symmetry: ccf(y, x) at -2 equals ccf(x, y) at +2
    got_rev = {r["lag"]: r["r"] for r in
               ccf(df, ["k"], ["t"], "y", "x", max_lag=3).collect()}
    assert got_rev[-2] == pytest.approx(got[2]["r"], rel=1e-9)


def test_linear_fit_matches_numpy_lstsq(spark):
    """Per-group multivariate betas equal NumPy's normal-equation
    solution for d = 1, 2, 3; a collinear feature set yields NULL
    betas by the singularity contract."""
    import numpy as np

    from mhm_data_pipelines_spark.operators.timeseries import linear_fit

    rng = np.random.RandomState(21)
    X = rng.normal(0, 2, (120, 3))
    beta_true = np.array([1.5, -2.0, 0.75, 3.0])  # b0, b1, b2, b3
    y = beta_true[0] + X @ beta_true[1:] + rng.normal(0, 0.1, 120)
    rows = [
        ("g", float(X[i, 0]), float(X[i, 1]), float(X[i, 2]), float(y[i]))
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "g string, x1 double, x2 double, x3 double, y double"
    )
    for d in (1, 2, 3):
        cols = ["x1", "x2", "x3"][:d]
        got = linear_fit(df, ["g"], cols, "y").collect()[0]
        A = np.column_stack([np.ones(120)] + [X[:, k] for k in range(d)])
        want, *_ = np.linalg.lstsq(A, y, rcond=None)
        assert got["n"] == 120
        for j in range(d + 1):
            assert got[f"b{j}"] == pytest.approx(
                want[j], rel=1e-6, abs=1e-6
            ), (d, j)
    # full model recovers the planted coefficients
    got = linear_fit(df, ["g"], ["x1", "x2", "x3"], "y").collect()[0]
    for j, b in enumerate(beta_true):
        assert abs(got[f"b{j}"] - b) < 0.05

    # collinear: x2 = 2*x1 -> singular - NULL betas
    rows_c = [
        ("g", float(v), float(2 * v), float(v + 1)) for v in range(20)
    ]
    dfc = spark.createDataFrame(rows_c, "g string, x1 double, x2 double, y double")
    sing = linear_fit(dfc, ["g"], ["x1", "x2"], "y").collect()[0]
    assert sing["b0"] is None and sing["b1"] is None

    import pytest as _pt
    with _pt.raises(ValueError, match="1..3"):
        linear_fit(df, ["g"], [], "y")
    with _pt.raises(ValueError, match="1..3"):
        linear_fit(df, ["g"], ["x1", "x2", "x3", "x1"], "y")


def test_transition_matrix_counts_and_probs(spark):
    """Hand-checkable two-user sequence: exact pair counts, per-state
    probabilities sum to 1, sequence-final events drop, and entity
    boundaries never produce cross-user transitions."""
    rows = [
        # user 1: a -> b -> a -> c
        (1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "c"),
        # user 2: b -> a  (the 'c' at the end of user 1 must NOT pair
        # with user 2's 'b')
        (2, 0, "b"), (2, 1, "a"),
        # NULL state rows drop entirely
        (1, 4, None),
    ]
    df = spark.createDataFrame(rows, "u long, t long, s string")

    from mhm_data_pipelines_spark.operators.timeseries import (
        transition_matrix,
    )

    got = {
        (r["state"], r["next_state"]): r
        for r in transition_matrix(df, "u", ["t"], "s").collect()
    }
    # pairs: u1 (a,b),(b,a),(a,c); u2 (b,a)
    assert got[("a", "b")]["n"] == 1
    assert got[("a", "c")]["n"] == 1
    assert got[("b", "a")]["n"] == 2
    assert len(got) == 3
    assert got[("a", "b")]["p"] == pytest.approx(0.5)
    assert got[("a", "c")]["p"] == pytest.approx(0.5)
    assert got[("b", "a")]["p"] == pytest.approx(1.0)


def test_rfm_scores_hand_case(spark):
    """Six entities with hand-placed recency/frequency/monetary:
    tercile scores land exactly, ties break on entity id, NULL values
    count toward frequency but not monetary."""
    from datetime import datetime

    from mhm_data_pipelines_spark.operators.timeseries import rfm_scores

    def t(d):
        return datetime(2024, 1, d)

    rows = []
    # entity i: last event on day i+1, i+1 events, value 10*(i+1) each
    for i in range(6):
        for j in range(i + 1):
            rows.append((i, t(j + 1) if j < i else t(i + 1),
                         float(10 * (i + 1))))
    rows.append((0, t(1), None))  # NULL value: freq +1, monetary +0
    df = spark.createDataFrame(rows, "u long, ts timestamp, v double")
    got = {r["entity"]: r for r in
           rfm_scores(df, "u", "ts", "v").collect()}
    assert len(got) == 6
    # entity 5 most recent (day 6), most frequent, highest total
    assert got[5]["r_score"] == 3
    assert got[5]["f_score"] == 3 and got[5]["m_score"] == 3
    # entity 0: oldest (day 1), f=2 (incl. NULL-value row), m=10
    assert got[0]["r_days"] == 5.0
    assert got[0]["f"] == 2 and got[0]["m"] == 10.0
    assert got[0]["r_score"] == 1 and got[0]["m_score"] == 1
    # every score column is a permutation of 2/2/2 across terciles
    for col in ("r_score", "f_score", "m_score"):
        vals = sorted(r[col] for r in got.values())
        assert vals == [1, 1, 2, 2, 3, 3]
    import pytest as _pt
    with _pt.raises(ValueError, match="n_tiles"):
        rfm_scores(df, "u", "ts", "v", n_tiles=1)


def test_robust_trend_theil_sen_and_mann_kendall(spark):
    """Sen slope = exact median of pairwise slopes (NumPy replay) and
    survives a planted outlier that wrecks OLS; Mann-Kendall S/Z match
    the textbook tie-corrected computation; a monotone series gets the
    maximal S."""
    import itertools

    import numpy as np

    from mhm_data_pipelines_spark.operators.timeseries import (
        ols_trend,
        robust_trend,
    )

    # series A: clean slope 2 with ONE wild outlier at the end (an
    # outlier at the x-midpoint wouldn't move OLS at all)
    ys = [2.0 * t for t in range(15)]
    ys[14] = 1000.0
    rows = [("a", float(t), y) for t, y in enumerate(ys)]
    # series B: strictly increasing -> S = C(8,2) = 28
    rows += [("b", float(t), float(t * t)) for t in range(8)]
    # series C: with ties in y
    c_ys = [1.0, 2.0, 2.0, 3.0, 2.0]
    rows += [("c", float(t), v) for t, v in enumerate(c_ys)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in
           robust_trend(df, ["g"], "x", "y").collect()}

    def replay(series):
        slopes, sgn = [], 0
        for (i, yi), (j, yj) in itertools.combinations(
            enumerate(series), 2
        ):
            slopes.append((yj - yi) / (j - i))
            sgn += int(np.sign(yj - yi))
        return float(np.percentile(slopes, 50, method="linear")), sgn

    for g, series in (("a", ys), ("b", [t * t for t in range(8)]),
                      ("c", c_ys)):
        sen, s = replay(series)
        r = got[g]
        n = len(series)
        assert r["n"] == n and r["n_pairs"] == n * (n - 1) // 2
        assert r["sen_slope"] == pytest.approx(sen, rel=1e-9)
        assert r["mk_s"] == s
    assert got["b"]["mk_s"] == 28  # strictly monotone
    # the outlier barely moves Sen but wrecks OLS
    assert abs(got["a"]["sen_slope"] - 2.0) < 0.5
    ols = {r["g"]: r for r in
           ols_trend(df, ["g"], "x", "y").collect()}
    assert abs(ols["a"]["slope"] - 2.0) > 5
    # tie-corrected z for series c: n=5, ties: one y-group of 3
    n, tt = 5.0, 3.0
    var_s = (n * (n - 1) * (2 * n + 5)
             - tt * (tt - 1) * (2 * tt + 5)) / 18.0
    s = got["c"]["mk_s"]
    want_z = (s - 1) / var_s ** 0.5 if s > 0 else (
        (s + 1) / var_s ** 0.5 if s < 0 else 0.0
    )
    assert got["c"]["mk_z"] == pytest.approx(want_z, rel=1e-9)
    # all-tied series: variance 0 -> NULL z
    dft = spark.createDataFrame(
        [("t", float(i), 5.0) for i in range(4)],
        "g string, x double, y double",
    )
    rt = robust_trend(dft, ["g"], "x", "y").collect()[0]
    assert rt["mk_z"] is None and rt["mk_s"] == 0


class TestSeasonalDecompose:
    @pytest.fixture(scope="class")
    def decomposed(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            seasonal_decompose,
        )

        # 28 days starting Mon 2024-01-01: constant level 10 plus a
        # planted weekly pattern (+5 on pos 0, -5 on pos 1, 0 else).
        # With a FULL-period centered window the MA of any 7
        # consecutive days is exactly the level, so interior trend
        # must be 10.0 and seasonal must recover the pattern exactly.
        pat = {0: 5.0, 1: -5.0}
        rows = []
        for d in range(28):
            day = dt.date(2024, 1, 1) + dt.timedelta(days=d)
            rows.append(("e", day.isoformat(), 10.0 + pat.get(d % 7, 0.0)))
        df = spark.createDataFrame(
            rows, "entity string, day string, v double"
        )
        out = seasonal_decompose(
            df, ["entity"], day_col="day", value_col="v", period=7
        ).collect()
        return {r["day"]: r for r in out}

    def test_interior_trend_is_level(self, decomposed):
        # days 4..24 have the full +-3 window inside the series
        for d in range(3, 25):
            day = (dt.date(2024, 1, 1) + dt.timedelta(days=d)).isoformat()
            assert decomposed[day]["trend"] == pytest.approx(10.0)

    def test_seasonal_recovers_pattern_and_sums_to_zero(self, decomposed):
        # read the seasonal component off one interior week
        week = [
            decomposed[
                (dt.date(2024, 1, 8) + dt.timedelta(days=i)).isoformat()
            ]["seasonal"]
            for i in range(7)
        ]
        # pos = di % 7; 2024-01-08 has di % 7 == 5 (1970-01-01 was a
        # Thursday), so the +5/-5 pattern planted on (d % 7) == 0/1
        # lands at week offsets 0 and 1 regardless — offsets ARE the
        # planted d%7 positions.
        assert week[0] == pytest.approx(5.0, abs=0.05)
        assert week[1] == pytest.approx(-5.0, abs=0.05)
        assert sum(week) == pytest.approx(0.0, abs=1e-4)

    def test_identity_and_edges(self, decomposed):
        assert len(decomposed) == 28  # partial edge windows still score
        for r in decomposed.values():
            assert r["value"] == pytest.approx(
                r["trend"] + r["seasonal"] + r["residual"], abs=2e-6
            )

    def test_period_guard(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            seasonal_decompose,
        )

        df = spark.createDataFrame(
            [("e", "2024-01-01", 1.0)], "entity string, day string, v double"
        )
        with pytest.raises(ValueError, match="period must be >= 2"):
            seasonal_decompose(df, ["entity"], "day", "v", period=1)


class TestHoltTrend:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "u string, t int, y double"
        )

    def test_matches_numpy_replay(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            holt_trend,
        )

        xs = [float((i * 13) % 7) + 0.25 * i for i in range(25)]
        df = self._df(spark, [("a", i, x) for i, x in enumerate(xs)])
        got = holt_trend(df, "u", "t", "y", alpha=0.5, beta=0.3)
        row = got.collect()[0]
        s, b = xs[0], xs[1] - xs[0]
        for t in range(1, len(xs)):
            s_new = 0.5 * xs[t] + 0.5 * (s + b)
            b = 0.3 * (s_new - s) + 0.7 * b
            s = s_new
        assert row["n_points"] == 25
        assert row["level"] == pytest.approx(round(s, 6))
        assert row["trend"] == pytest.approx(round(b, 6))
        assert row["forecast_1"] == pytest.approx(round(s + b, 6))

    def test_linear_series_recovers_slope(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            holt_trend,
        )

        # exact line: level tracks it exactly and trend == slope
        df = self._df(
            spark, [("a", i, 3.0 + 2.0 * i) for i in range(20)]
        )
        row = holt_trend(df, "u", "t", "y").collect()[0]
        assert row["trend"] == pytest.approx(2.0)
        assert row["level"] == pytest.approx(3.0 + 2.0 * 19)
        assert row["forecast_1"] == pytest.approx(3.0 + 2.0 * 20)

    def test_singleton_and_nulls(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            holt_trend,
        )

        df = self._df(
            spark,
            [("a", 0, 7.0), ("b", 0, 1.0), ("b", 1, None),
             ("b", 2, 3.0), (None, 0, 9.9)],
        )
        got = {r["u"]: r.asDict() for r in
               holt_trend(df, "u", "t", "y").collect()}
        assert set(got) == {"a", "b"}
        assert got["a"]["n_points"] == 1
        assert got["a"]["level"] == 7.0 and got["a"]["trend"] == 0.0
        assert got["b"]["n_points"] == 2  # NULL dropped

    def test_per_entity_isolation_and_guards(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            holt_trend,
        )

        df = self._df(
            spark,
            [("a", i, float(i)) for i in range(5)]
            + [("b", i, 10.0 - i) for i in range(5)],
        )
        got = {r["u"]: r["trend"] for r in
               holt_trend(df, "u", "t", "y").collect()}
        assert got["a"] == pytest.approx(1.0)
        assert got["b"] == pytest.approx(-1.0)
        with pytest.raises(ValueError, match="alpha"):
            holt_trend(df, "u", "t", "y", alpha=0.0)
        with pytest.raises(ValueError, match="beta"):
            holt_trend(df, "u", "t", "y", beta=1.5)


class TestLagFeatures:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "u string, d date, y double")

    def test_calendar_lags_respect_gaps(self, spark):
        import datetime as dt

        from mhm_data_pipelines_spark.operators.timeseries import (
            lag_features,
        )

        d = lambda i: dt.date(2024, 1, 1) + dt.timedelta(days=i)  # noqa: E731
        # days 0,1,3 — day 3's lag_1 must be NULL (day 2 missing),
        # not day 1's value (what a ROW-frame lag would give)
        df = self._df(
            spark, [("a", d(0), 1.0), ("a", d(1), 2.0), ("a", d(3), 4.0)]
        )
        got = {
            r["d"]: r.asDict()
            for r in lag_features(df, "u", "d", "y", lags=(1, 2)).collect()
        }
        assert got[d(1)]["lag_1"] == 1.0
        assert got[d(3)]["lag_1"] is None
        assert got[d(3)]["lag_2"] == 2.0

    def test_rolling_window_excludes_today(self, spark):
        import datetime as dt

        from mhm_data_pipelines_spark.operators.timeseries import (
            lag_features,
        )

        d = lambda i: dt.date(2024, 1, 1) + dt.timedelta(days=i)  # noqa: E731
        df = self._df(
            spark, [("a", d(i), float(i)) for i in range(10)]
        )
        got = {
            r["d"]: r.asDict()
            for r in lag_features(
                df, "u", "d", "y", lags=(1,), window_days=3
            ).collect()
        }
        # day 5: window = days 2,3,4 -> mean 3.0, count 3
        assert got[d(5)]["rmean_3"] == pytest.approx(3.0)
        assert got[d(5)]["rcount_3"] == 3
        # day 0: empty window
        assert got[d(0)]["rmean_3"] is None
        assert got[d(0)]["rcount_3"] == 0

    def test_iso_dow_and_entity_isolation(self, spark):
        import datetime as dt

        from mhm_data_pipelines_spark.operators.timeseries import (
            lag_features,
        )

        # 2024-01-01 is a Monday; 2024-01-07 a Sunday
        df = self._df(
            spark,
            [
                ("a", dt.date(2024, 1, 1), 1.0),
                ("b", dt.date(2024, 1, 7), 9.0),
            ],
        )
        got = {r["u"]: r.asDict() for r in
               lag_features(df, "u", "d", "y").collect()}
        assert got["a"]["dow"] == 1
        assert got["b"]["dow"] == 7
        assert got["b"]["lag_1"] is None  # a's data never leaks into b

    def test_guards(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            lag_features,
        )

        import datetime as dt

        df = self._df(spark, [("a", dt.date(2024, 1, 1), 1.0)])
        with pytest.raises(ValueError, match="lags must be non-empty"):
            lag_features(df, "u", "d", "y", lags=())
        with pytest.raises(ValueError, match=">= 1"):
            lag_features(df, "u", "d", "y", lags=(0,))
        with pytest.raises(ValueError, match="window_days"):
            lag_features(df, "u", "d", "y", window_days=0)


class TestReachCurve:
    def test_hand_counts(self, spark):
        import datetime as dt

        from mhm_data_pipelines_spark.operators.timeseries import (
            reach_curve,
        )

        t = lambda d, h=0: dt.datetime(2024, 1, d, h)  # noqa: E731
        rows = [
            (1, t(1)), (1, t(1, 5)),      # u1 day1 (twice)
            (2, t(1)),                     # u2 day1
            (1, t(2)),                     # u1 returns day2
            (3, t(2)),                     # u3 new day2
            (1, t(4)), (2, t(4)), (3, t(4)),  # all return day4; day3 empty
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {str(r["day"]): r.asDict() for r in
               reach_curve(df).collect()}
        assert got["2024-01-01"]["dau"] == 2
        assert got["2024-01-01"]["new_users"] == 2
        assert got["2024-01-01"]["returning"] == 0
        assert got["2024-01-02"]["dau"] == 2
        assert got["2024-01-02"]["new_users"] == 1
        assert got["2024-01-02"]["returning"] == 1
        assert got["2024-01-02"]["cumulative_users"] == 3
        assert "2024-01-03" not in got  # no activity, no row
        assert got["2024-01-04"]["dau"] == 3
        assert got["2024-01-04"]["new_users"] == 0
        assert got["2024-01-04"]["cumulative_users"] == 3

    def test_cumulative_equals_distinct_union(self, spark):
        import datetime as dt

        from mhm_data_pipelines_spark.operators.timeseries import (
            reach_curve,
        )

        rows = [
            ((i * 7) % 23, dt.datetime(2024, 1, 1 + (i % 9)))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        curve = reach_curve(df).collect()
        seen = set()
        by_day = {}
        for u, ts in sorted(rows, key=lambda r: r[1]):
            seen.add(u)
            by_day[ts.date()] = len(seen)
        for r in curve:
            assert r["cumulative_users"] == by_day[r["day"]]


class TestSessionEntryPaths:
    def _ev(self, spark, rows):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
        return spark.createDataFrame(
            [
                (i, t0 + dt.timedelta(minutes=m), u, ty)
                for i, (m, u, ty) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string",
        )

    def test_hand_paths_and_gap_boundary(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            session_entry_paths,
        )

        rows = [
            (0, 1, "a"), (10, 1, "b"),          # u1 session 1: a>b
            (100, 1, "a"), (110, 1, "b"),       # gap 90min: session 2: a>b
            (0, 2, "a"), (31, 2, "c"),          # gap 31 > 30: two sessions
        ]
        got = {
            r["path"]: r.asDict()
            for r in session_entry_paths(
                self._ev(spark, rows), depth=3
            ).collect()
        }
        assert got["a>b"]["n_sessions"] == 2
        assert got["a"]["n_sessions"] == 1   # u2 first session
        assert got["c"]["n_sessions"] == 1   # u2 second session
        assert got["a>b"]["steps"] == 2
        assert got["a>b"]["pct"] == pytest.approx(0.5)

    def test_depth_truncates_and_topk_tie_break(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            session_entry_paths,
        )

        rows = [(m, 1, "xyxyz"[m % 5]) for m in range(8)]  # one session
        got = session_entry_paths(
            self._ev(spark, rows), depth=3
        ).collect()
        assert len(got) == 1
        assert got[0]["path"] == "x>y>x"
        assert got[0]["steps"] == 3
        # top_k cut is deterministic: equal counts order by path asc
        rows2 = [(0, u, ty) for u, ty in [(1, "a"), (2, "b"), (3, "c")]]
        top2 = session_entry_paths(
            self._ev(spark, rows2), top_k=2
        ).collect()
        assert [r["path"] for r in top2] == ["a", "b"]

    def test_guards(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            session_entry_paths,
        )

        df = self._ev(spark, [(0, 1, "a")])
        with pytest.raises(ValueError, match="depth"):
            session_entry_paths(df, depth=0)
        with pytest.raises(ValueError, match="top_k"):
            session_entry_paths(df, top_k=0)


class TestMannKendall:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "u string, t double, y double")

    @staticmethod
    def _reference(series):
        """Textbook MK + Sen replay (pure python)."""
        import math

        t = [a for a, _ in series]
        y = [b for _, b in series]
        n = len(y)
        s = sum(
            (y[j] > y[i]) - (y[j] < y[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        corr = sum(
            c * (c - 1) * (2 * c + 5) for c in Counter(y).values()
        )
        var_s = (n * (n - 1) * (2 * n + 5) - corr) / 18.0
        slopes = sorted(
            (y[j] - y[i]) / (t[j] - t[i])
            for i in range(n)
            for j in range(i + 1, n)
            if t[j] != t[i]
        )
        m = len(slopes)
        sen = (
            None if m == 0
            else slopes[m // 2] if m % 2
            else (slopes[m // 2 - 1] + slopes[m // 2]) / 2
        )
        if var_s <= 0:
            z = None
        elif s > 0:
            z = (s - 1) / math.sqrt(var_s)
        elif s < 0:
            z = (s + 1) / math.sqrt(var_s)
        else:
            z = 0.0
        p = (
            None if z is None
            else 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2))))
        )
        return s, var_s, z, p, sen

    def test_matches_reference_with_ties(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            mann_kendall,
        )

        series = [
            (1.0, 3.0), (2.0, 5.0), (3.0, 5.0), (4.0, 2.0),
            (5.0, 8.0), (6.0, 9.0), (7.0, 9.0),
        ]
        s, var_s, z, p, sen = self._reference(series)
        rows = [("a", t, y) for t, y in series]
        r = mann_kendall(self._df(spark, rows), "u", "t", "y").collect()[0]
        assert r["s_stat"] == s
        assert r["var_s"] == pytest.approx(var_s, abs=1e-6)
        assert r["z"] == pytest.approx(z, abs=1e-6)
        assert r["p_value"] == pytest.approx(p, abs=1e-6)
        assert r["sen_slope"] == pytest.approx(sen, abs=1e-6)

    def test_strictly_increasing_and_constant(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            mann_kendall,
        )

        rows = [("up", float(i), float(i) * 2) for i in range(1, 9)]
        rows += [("flat", float(i), 4.0) for i in range(1, 6)]
        out = {
            r["u"]: r
            for r in mann_kendall(
                self._df(spark, rows), "u", "t", "y"
            ).collect()
        }
        up = out["up"]
        assert up["s_stat"] == 28  # all 28 pairs increasing
        assert up["p_value"] < 0.01
        assert up["sen_slope"] == pytest.approx(2.0)
        flat = out["flat"]
        assert flat["s_stat"] == 0
        assert flat["var_s"] == 0.0
        assert flat["z"] is None and flat["p_value"] is None

    def test_nulls_dropped(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            mann_kendall,
        )

        rows = [("a", 1.0, 1.0), ("a", 2.0, None), ("a", None, 3.0),
                ("a", 4.0, 5.0)]
        r = mann_kendall(self._df(spark, rows), "u", "t", "y").collect()[0]
        assert r["n_points"] == 2 and r["s_stat"] == 1


class TestDownsampleLttb:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "u string, t double, y double")

    @staticmethod
    def _reference(series, nb):
        """Pure-python replay of the fixed-anchor rules."""
        pts = sorted(series)
        n = len(pts)
        if n <= nb:
            return sorted(pts)
        nbe = nb
        buckets = {}
        for rn, (t, y) in enumerate(pts, start=1):
            if rn == 1:
                b = 0
            elif rn == n:
                b = nbe - 1
            else:
                b = 1 + (rn - 2) * (nb - 2) // (n - 2)
            buckets.setdefault(b, []).append((rn, t, y))
        means = {
            b: (
                round(sum(t for _, t, _ in v) / len(v), 6),
                round(sum(y for _, _, y in v) / len(v), 6),
            )
            for b, v in buckets.items()
        }
        out = []
        for b, v in buckets.items():
            if b in (0, nbe - 1):
                out.extend((t, y) for _, t, y in v)
                continue
            tp, yp = means[b - 1]
            tn, yn = means[b + 1]
            scored = sorted(
                (
                    -round(abs((tp - tn) * (y - yp) - (tp - t) * (yn - yp)), 6),
                    rn,
                    t,
                    y,
                )
                for rn, t, y in v
            )
            out.append((scored[0][2], scored[0][3]))
        return sorted(out)

    def test_matches_reference(self, spark):
        import random

        from mhm_data_pipelines_spark.operators.timeseries import (
            downsample_lttb,
        )

        rng = random.Random(3)
        series = [
            (float(i), round(rng.uniform(-5, 5), 2)) for i in range(137)
        ]
        got = sorted(
            (r["t"], r["y"])
            for r in downsample_lttb(
                self._df(spark, [("a", t, y) for t, y in series]),
                "u", "t", "y", n_buckets=12,
            ).collect()
        )
        assert got == self._reference(series, 12)
        # 12 buckets -> exactly 12 survivors (all interior non-empty)
        assert len(got) == 12

    def test_short_series_pass_through_whole(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            downsample_lttb,
        )

        rows = [("s", float(i), float(i)) for i in range(5)]
        got = downsample_lttb(
            self._df(spark, rows), "u", "t", "y", n_buckets=10
        ).collect()
        assert len(got) == 5

    def test_first_last_always_kept_and_guard(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            downsample_lttb,
        )

        rows = [("a", float(i), 1.0) for i in range(50)]
        got = sorted(
            r["t"]
            for r in downsample_lttb(
                self._df(spark, rows), "u", "t", "y", n_buckets=5
            ).collect()
        )
        assert got[0] == 0.0 and got[-1] == 49.0 and len(got) == 5
        with pytest.raises(ValueError, match="n_buckets"):
            downsample_lttb(self._df(spark, rows), "u", "t", "y", 2)

    def test_spike_survives(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            downsample_lttb,
        )

        # flat series with one huge spike: the spike's bucket must
        # select the spike (largest triangle), never a flat neighbor
        rows = [("a", float(i), 0.0) for i in range(100)]
        rows[50] = ("a", 50.0, 100.0)
        got = {
            (r["t"], r["y"])
            for r in downsample_lttb(
                self._df(spark, rows), "u", "t", "y", n_buckets=10
            ).collect()
        }
        assert (50.0, 100.0) in got


class TestHoltWinters:
    @staticmethod
    def _reference(xs, m, a, b, g):
        lvl = sum(xs[:m]) / m
        trd = (sum(xs[m:2 * m]) / m - sum(xs[:m]) / m) / m
        seas = [x - lvl for x in xs[:m]]
        for t in range(m, len(xs)):
            x = xs[t]
            s_old = seas[0]
            lvl_new = a * (x - s_old) + (1 - a) * (lvl + trd)
            trd = b * (lvl_new - lvl) + (1 - b) * trd
            seas = seas[1:] + [g * (x - lvl_new) + (1 - g) * s_old]
            lvl = lvl_new
        return lvl, trd, seas[0]

    def test_matches_reference(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            holt_winters,
        )

        xs = [3.0, 5.0, 4.0, 6.0, 7.0, 5.5, 4.5,
              4.0, 6.5, 5.0, 7.5, 8.0, 6.0, 5.0,
              5.5, 7.0, 6.0, 8.5]
        rows = [("u", float(i), x) for i, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "e string, t double, y double")
        r = holt_winters(
            df, "e", "t", "y", period=7, alpha=0.4, beta=0.2, gamma=0.3
        ).collect()[0]
        lvl, trd, s1 = self._reference(xs, 7, 0.4, 0.2, 0.3)
        assert r["n_points"] == 18
        assert r["level"] == pytest.approx(lvl, abs=1e-6)
        assert r["trend"] == pytest.approx(trd, abs=1e-6)
        assert r["seasonal_next"] == pytest.approx(s1, abs=1e-6)
        assert r["forecast_1"] == pytest.approx(lvl + trd + s1, abs=1e-6)

    def test_perfect_seasonality_forecasts_exactly(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            holt_winters,
        )

        # pure period-3 pattern, no trend: forecast_1 must equal the
        # next value in the pattern (gamma=1 tracks the season fully)
        pat = [10.0, 20.0, 30.0]
        xs = pat * 4
        rows = [("u", float(i), x) for i, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "e string, t double, y double")
        r = holt_winters(
            df, "e", "t", "y", period=3, alpha=0.5, beta=0.1, gamma=1.0
        ).collect()[0]
        assert r["forecast_1"] == pytest.approx(10.0, abs=1e-6)

    def test_short_entities_omitted_and_guards(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            holt_winters,
        )

        rows = [("short", float(i), 1.0) for i in range(5)]
        rows += [("long", float(i), float(i % 3)) for i in range(8)]
        df = spark.createDataFrame(rows, "e string, t double, y double")
        got = [r["e"] for r in
               holt_winters(df, "e", "t", "y", period=3).collect()]
        assert got == ["long"]
        with pytest.raises(ValueError, match="period"):
            holt_winters(df, "e", "t", "y", period=1)
        with pytest.raises(ValueError, match="gamma"):
            holt_winters(df, "e", "t", "y", period=3, gamma=0.0)


class TestSingleChangepoint:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "e string, t double, y double")

    @staticmethod
    def _reference(ys, min_seg=2):
        n = len(ys)
        t1, t2 = sum(ys), sum(y * y for y in ys)
        best = None
        for k in range(min_seg, n - min_seg + 1):
            c1 = sum(ys[:k])
            c2 = sum(y * y for y in ys[:k])
            cost = round(
                (c2 - c1 * c1 / k)
                + ((t2 - c2) - (t1 - c1) ** 2 / (n - k)),
                6,
            )
            if best is None or cost < best[1]:
                best = (k, cost)
        return best

    def test_obvious_shift_found(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            single_changepoint,
        )

        ys = [1.0, 1.1, 0.9, 1.0, 5.0, 5.1, 4.9, 5.0]
        rows = [("a", float(i), y) for i, y in enumerate(ys)]
        r = single_changepoint(
            self._df(spark, rows), "e", "t", "y"
        ).collect()[0]
        k, cost = self._reference(ys)
        assert r["split_k"] == k == 4
        assert r["split_order"] == 4.0  # right segment starts at t=4
        assert r["sse_split"] == pytest.approx(cost, abs=1e-6)
        assert r["reduction_pct"] > 95.0

    def test_matches_reference_random(self, spark):
        import random

        from mhm_data_pipelines_spark.operators.timeseries import (
            single_changepoint,
        )

        rng = random.Random(5)
        ys = [round(rng.uniform(0, 10), 2) for _ in range(41)]
        rows = [("a", float(i), y) for i, y in enumerate(ys)]
        r = single_changepoint(
            self._df(spark, rows), "e", "t", "y", min_seg=3
        ).collect()[0]
        k, cost = self._reference(ys, min_seg=3)
        assert r["split_k"] == k
        assert r["sse_split"] == pytest.approx(cost, abs=1e-6)

    def test_short_entities_omitted_and_guard(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            single_changepoint,
        )

        rows = [("short", 1.0, 1.0), ("short", 2.0, 9.0),
                ("short", 3.0, 1.0)]
        rows += [("ok", float(i), float(i >= 2) * 10) for i in range(4)]
        out = single_changepoint(
            self._df(spark, rows), "e", "t", "y", min_seg=2
        ).collect()
        assert [r["e"] for r in out] == ["ok"]
        with pytest.raises(ValueError, match="min_seg"):
            single_changepoint(self._df(spark, rows), "e", "t", "y", 0)


class TestFunnelLatencies:
    def test_hand_computed_percentiles(self, spark):
        import datetime as dt

        from mhm_data_pipelines_spark.operators.timeseries import (
            funnel_latencies,
        )

        t0 = dt.datetime(2025, 1, 1)

        def ev(u, typ, secs):
            return (u, typ, t0 + dt.timedelta(seconds=secs))

        rows = [
            # user 1: A->B in 10s, B->C in 100s
            ev(1, "A", 0), ev(1, "B", 10), ev(1, "C", 110),
            # user 2: A->B in 30s, never C
            ev(2, "A", 0), ev(2, "B", 30),
            # user 3: only A
            ev(3, "A", 5),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        out = funnel_latencies(df, ["A", "B", "C"]).collect()
        assert [(r.step_from, r.step_to) for r in out] == [
            ("A", "B"),
            ("B", "C"),
        ]
        ab, bc = out
        assert ab.n_converted == 2
        assert ab.p50_s == pytest.approx(20.0)  # interp of {10, 30}
        assert ab.mean_s == pytest.approx(20.0)
        assert bc.n_converted == 1
        assert bc.p50_s == pytest.approx(100.0)

    def test_strict_order_excludes_pre_step_events(self, spark):
        import datetime as dt

        from mhm_data_pipelines_spark.operators.timeseries import (
            funnel_latencies,
        )

        t0 = dt.datetime(2025, 1, 1)
        rows = [
            (1, "B", t0),  # B before A: not a conversion
            (1, "A", t0 + dt.timedelta(seconds=10)),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        out = funnel_latencies(df, ["A", "B"]).collect()
        assert out == []


class TestFixedEffectsFit:
    def test_within_beta_removes_entity_confounder(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            fixed_effects_fit,
        )

        # y = 2x + entity offset; pooled OLS would be biased by the
        # offsets, the within estimator recovers exactly 2.
        rows = []
        for e, off in (("a", 0.0), ("b", 100.0), ("c", -50.0)):
            for x in (1.0, 2.0, 3.0):
                rows.append((e, x, 2.0 * x + off))
        df = spark.createDataFrame(rows, "e string, x double, y double")
        r = fixed_effects_fit(df, "y", "x", "e").collect()[0]
        assert (r.n, r.n_entities) == (9, 3)
        assert r.beta == pytest.approx(2.0, abs=1e-9)
        assert r.r2_within == pytest.approx(1.0, abs=1e-9)

    def test_no_within_variance_null(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            fixed_effects_fit,
        )

        rows = [("a", 1.0, 5.0), ("a", 1.0, 6.0), ("b", 2.0, 7.0)]
        df = spark.createDataFrame(rows, "e string, x double, y double")
        r = fixed_effects_fit(df, "y", "x", "e").collect()[0]
        assert r.beta is None and r.r2_within is None

    def test_singleton_entities_contribute_nothing(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            fixed_effects_fit,
        )

        rows = [
            ("a", 1.0, 2.0), ("a", 2.0, 4.0),
            ("solo", 99.0, -1000.0),
        ]
        df = spark.createDataFrame(rows, "e string, x double, y double")
        r = fixed_effects_fit(df, "y", "x", "e").collect()[0]
        assert r.beta == pytest.approx(2.0, abs=1e-9)


class TestHoltBacktest:
    def test_linear_series_forecast_exactly(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            holt_backtest,
        )

        rows = [(1, t, 2.0 * t) for t in range(1, 11)]
        df = spark.createDataFrame(rows, "e long, o int, v double")
        r = holt_backtest(df, "e", "o", "v").collect()[0]
        assert (r.n_train, r.n_test) == (8, 2)
        assert r.mae == pytest.approx(0.0, abs=1e-6)
        assert r.rmse == pytest.approx(0.0, abs=1e-6)

    def test_python_replay_nonlinear(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            holt_backtest,
        )

        xs = [float((t * 7) % 5) + 0.5 * t for t in range(10)]
        rows = [(1, t, x) for t, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "e long, o int, v double")
        r = holt_backtest(df, "e", "o", "v").collect()[0]
        a, g = 0.5, 0.3
        train, test = xs[:8], xs[8:]
        s, b = train[0], train[1] - train[0]
        for x in train[1:]:
            s_new = a * x + (1 - a) * (s + b)
            b = g * (s_new - s) + (1 - g) * b
            s = s_new
        s, b = round(s, 6), round(b, 6)  # operator emits 6dp state
        errs = [abs(y - (s + (h + 1) * b)) for h, y in enumerate(test)]
        assert r.mae == pytest.approx(sum(errs) / len(errs), abs=1e-6)

    def test_short_entities_excluded_and_guard(self, spark):
        from mhm_data_pipelines_spark.operators.timeseries import (
            holt_backtest,
        )

        rows = [(1, 0, 1.0), (1, 1, 2.0),   # k = 1 -> excluded
                (2, 0, 1.0)]                 # singleton -> excluded
        df = spark.createDataFrame(rows, "e long, o int, v double")
        assert holt_backtest(df, "e", "o", "v").count() == 0
        with pytest.raises(ValueError, match="train_frac"):
            holt_backtest(df, "e", "o", "v", train_frac=1.0)
