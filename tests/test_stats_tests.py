"""KS / Mann-Whitney / chi-square — hand-computed statistics."""

import math

import pytest

from mhm_data_pipelines_spark.operators.stats_tests import (
    chi2_independence,
    ks_test,
    mann_whitney_u,
)


def _df(spark, a_vals, b_vals):
    rows = [(float(v), "a") for v in a_vals] + [(float(v), "b") for v in b_vals]
    return spark.createDataFrame(rows, "v double, grp string")


def test_ks_identical_zero_and_disjoint_one(spark):
    df = _df(spark, [1, 2, 3], [1, 2, 3])
    row = ks_test(df, "v", "grp", "a", "b").collect()[0]
    assert row["d_stat"] == 0.0 and (row["n_a"], row["n_b"]) == (3, 3)
    df = _df(spark, [1, 2], [10, 20])
    row = ks_test(df, "v", "grp", "a", "b").collect()[0]
    assert row["d_stat"] == 1.0
    assert row["ks_lambda"] == pytest.approx(round(math.sqrt(4 / 4), 6))


def test_ks_hand_computed(spark):
    # a = {1,2,3,4}, b = {3,4,5,6}: ECDF gap peaks at v=2:
    # F_a(2)=.5, F_b(2)=0 -> D=.5
    df = _df(spark, [1, 2, 3, 4], [3, 4, 5, 6])
    row = ks_test(df, "v", "grp", "a", "b").collect()[0]
    assert row["d_stat"] == 0.5


def test_ks_ignores_other_groups_and_nulls(spark):
    rows = [(1.0, "a"), (2.0, "b"), (None, "a"), (9.0, "c")]
    df = spark.createDataFrame(rows, "v double, grp string")
    row = ks_test(df, "v", "grp", "a", "b").collect()[0]
    assert (row["n_a"], row["n_b"]) == (1, 1)


def test_mwu_hand_computed_no_ties(spark):
    # a = {1,2}, b = {3,4}: ranks 1,2 vs 3,4. R_a=3, U_a=3-3=0, U_b=4.
    df = _df(spark, [1, 2], [3, 4])
    row = mann_whitney_u(df, "v", "grp", "a", "b").collect()[0]
    assert (row["u_a"], row["u_b"]) == (0.0, 4.0)
    # z = (0 - 2)/sqrt(4/12 * (5 - 0)) = -2/sqrt(5/3)
    assert row["z"] == pytest.approx(round(-2 / math.sqrt(5 / 3), 6))


def test_mwu_ties_averaged_and_corrected(spark):
    # a = {1,2}, b = {2,3}: sorted 1,2,2,3 -> ranks 1, 2.5, 2.5, 4
    # R_a = 3.5, U_a = 3.5-3 = .5, U_b = 3.5; tie group t=2 ->
    # T = (8-2)/(4*3) = .5; var = 4/12*(5-.5) = 1.5
    df = _df(spark, [1, 2], [2, 3])
    row = mann_whitney_u(df, "v", "grp", "a", "b").collect()[0]
    assert (row["u_a"], row["u_b"]) == (0.5, 3.5)
    assert row["z"] == pytest.approx(round((0.5 - 2) / math.sqrt(1.5), 6))


def test_mwu_all_tied_null_z(spark):
    df = _df(spark, [5, 5], [5, 5])
    row = mann_whitney_u(df, "v", "grp", "a", "b").collect()[0]
    assert row["u_a"] == row["u_b"] == 2.0
    assert row["z"] is None


def test_chi2_independent_is_zero(spark):
    # perfectly proportional table -> chi2 = 0
    rows = []
    for x, y, n in [("r1", "c1", 10), ("r1", "c2", 20),
                    ("r2", "c1", 20), ("r2", "c2", 40)]:
        rows += [(x, y)] * n
    df = spark.createDataFrame(rows, "x string, y string")
    row = chi2_independence(df, "x", "y").collect()[0]
    assert row["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert row["dof"] == 1 and row["n"] == 90


def test_chi2_hand_computed_with_empty_cell(spark):
    # 2x2 with an EMPTY cell: o = [[5,0],[5,10]]; N=20,
    # rows (5,15), cols (10,10); e = [[2.5,2.5],[7.5,7.5]]
    # chi2 = 2.5 + 2.5 + (5-7.5)^2/7.5 + (10-7.5)^2/7.5 = 6.6667
    rows = [("r1", "c1")] * 5 + [("r2", "c1")] * 5 + [("r2", "c2")] * 10
    df = spark.createDataFrame(rows, "x string, y string")
    row = chi2_independence(df, "x", "y").collect()[0]
    assert row["chi2"] == pytest.approx(round(20 / 3, 6), abs=1e-6)
    assert row["dof"] == 1


def test_two_proportion_hand_computed(spark):
    # A: 30/100 convert; B: 20/100. pooled p = .25.
    rows = ([("a", 1)] * 30 + [("a", 0)] * 70
            + [("b", 1)] * 20 + [("b", 0)] * 80)
    df = spark.createDataFrame(rows, "grp string, conv int")
    from mhm_data_pipelines_spark.operators.stats_tests import (
        two_proportion_ztest,
    )
    r = two_proportion_ztest(df, "grp", "a", "b", "conv").collect()[0]
    assert (r["n_a"], r["n_b"]) == (100, 100)
    assert (r["p_a"], r["p_b"]) == (0.3, 0.2)
    assert r["risk_ratio"] == 1.5
    want = 0.1 / math.sqrt(0.25 * 0.75 * 0.02)
    assert r["z"] == pytest.approx(round(want, 6))


def test_two_proportion_degenerate_null_z(spark):
    from mhm_data_pipelines_spark.operators.stats_tests import (
        two_proportion_ztest,
    )
    rows = [("a", 0)] * 5 + [("b", 0)] * 5 + [("a", None)]
    df = spark.createDataFrame(rows, "grp string, conv int")
    r = two_proportion_ztest(df, "grp", "a", "b", "conv").collect()[0]
    assert r["z"] is None and r["risk_ratio"] is None
    assert r["n_a"] == 5  # NULL outcome dropped


def test_poisson_bootstrap_ci_python_replay(spark):
    """The exact resample is replayed row-for-row in Python (same md5
    draw, same CDF literals, same rounded-sum discipline) — the Spark
    result must match to the last interpolated percentile."""
    import hashlib

    import numpy as np

    from mhm_data_pipelines_spark.operators.stats_tests import (
        POISSON1_CDF,
        poisson_bootstrap_ci,
    )

    rows = [("g1", i, float((i * 7) % 13) + 1.0) for i in range(40)]
    rows += [("g2", 100 + i, 50.0 + (i % 5)) for i in range(25)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        r["g"]: r
        for r in poisson_bootstrap_ci(
            df, "v", "id", keys=["g"], n_boot=50, seed=7
        ).collect()
    }

    def draw(i, b):
        h = hashlib.md5(f"{i}#{b}:7".encode()).hexdigest()
        u = int(h[:15], 16) / 2**60
        for k, f in enumerate(POISSON1_CDF):
            if u < f:
                return k
        return len(POISSON1_CDF)

    for g in ("g1", "g2"):
        data = [(i, v) for gg, i, v in rows if gg == g]
        means = []
        for b in range(50):
            ws = [(draw(i, b), v) for i, v in data]
            ww = sum(w for w, _ in ws)
            if ww > 0:
                means.append(round(sum(w * v for w, v in ws), 6) / ww)
        lo, hi = np.percentile(means, [2.5, 97.5], method="linear")
        assert got[g]["n"] == len(data)
        assert got[g]["mean"] == pytest.approx(
            round(sum(v for _, v in data), 6) / len(data), rel=1e-12
        )
        assert got[g]["ci_lo"] == pytest.approx(lo, rel=1e-12), g
        assert got[g]["ci_hi"] == pytest.approx(hi, rel=1e-12), g
        assert got[g]["ci_lo"] <= got[g]["mean"] <= got[g]["ci_hi"]


def test_poisson_bootstrap_validation(spark):
    from mhm_data_pipelines_spark.operators.stats_tests import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame([("a", 1, 1.0)], "g string, id long, v double")
    with pytest.raises(ValueError, match="alpha"):
        poisson_bootstrap_ci(df, "v", "id", ["g"], alpha=1.5)
    with pytest.raises(ValueError, match="n_boot"):
        poisson_bootstrap_ci(df, "v", "id", ["g"], n_boot=1)


def test_anova_oneway_matches_numpy(spark):
    """F statistic equals the textbook decomposition computed
    independently in NumPy; round_sums=None for the pure-float check."""
    import numpy as np

    from mhm_data_pipelines_spark.operators.stats_tests import anova_oneway

    rng = np.random.RandomState(7)
    groups = {"a": rng.normal(0, 1, 40), "b": rng.normal(0.8, 1, 55),
              "c": rng.normal(0.4, 1.5, 30)}
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    got = anova_oneway(df, "v", "g", round_sums=None).collect()[0]

    allv = np.concatenate(list(groups.values()))
    grand = allv.mean()
    ssb = sum(len(v) * (v.mean() - grand) ** 2 for v in groups.values())
    ssw = sum(((v - v.mean()) ** 2).sum() for v in groups.values())
    k, n = 3, len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got["k_groups"] == 3 and got["n"] == n
    assert got["ss_between"] == pytest.approx(ssb, rel=1e-9)
    assert got["ss_within"] == pytest.approx(ssw, rel=1e-9)
    assert got["f_stat"] == pytest.approx(f, rel=1e-9)


def test_anova_oneway_degenerate_null_f(spark):
    from mhm_data_pipelines_spark.operators.stats_tests import anova_oneway

    one_group = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, v double"
    )
    assert anova_oneway(one_group, "v", "g").collect()[0]["f_stat"] is None
    constant = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)],
        "g string, v double",
    )
    assert anova_oneway(constant, "v", "g").collect()[0]["f_stat"] is None


def test_brown_forsythe_matches_manual(spark):
    """W equals a manual median-centered Levene computed in NumPy;
    spread difference is detected (W >> 1) while a same-spread pair
    stays small."""
    import numpy as np

    from mhm_data_pipelines_spark.operators.stats_tests import (
        brown_forsythe,
    )

    rng = np.random.RandomState(11)
    a = rng.normal(0, 1, 60)
    b = rng.normal(0, 4, 60)  # same mean, 4x the spread
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = brown_forsythe(df, "v", "g", round_sums=None,
                         round_dev=None).collect()[0]

    za = np.abs(a - np.median(a))
    zb = np.abs(b - np.median(b))
    grand = np.concatenate([za, zb]).mean()
    ssb = len(za) * (za.mean() - grand) ** 2 + len(zb) * (
        zb.mean() - grand
    ) ** 2
    ssw = ((za - za.mean()) ** 2).sum() + ((zb - zb.mean()) ** 2).sum()
    w = (ssb / 1) / (ssw / (120 - 2))
    assert got["f_stat"] == pytest.approx(w, rel=1e-9)
    assert got["f_stat"] > 10  # the planted spread difference


def test_randomization_test_md5_replay_and_power(spark):
    """n_extreme and p replay exactly from a pure-Python md5 walk of
    the same (id, replicate, seed) draws; a planted shift is detected
    at the add-one floor while a null shift is not."""
    import hashlib

    import numpy as np

    from mhm_data_pipelines_spark.operators.stats_tests import (
        randomization_test,
    )

    rng = np.random.RandomState(5)
    a = rng.normal(0.0, 1.0, 80)
    b = rng.normal(3.0, 1.0, 70)  # strong shift
    rows = [("a", i, float(v)) for i, v in enumerate(a)]
    rows += [("b", 1000 + i, float(v)) for i, v in enumerate(b)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = randomization_test(
        df, "v", "g", "a", "b", "id", n_perm=99, seed=42
    ).collect()[0]

    # pure-Python replay
    vals = {i: float(v) for _, i, v in rows}
    na, n = 80, 150
    pa = na / n
    diff_obs = round(
        round(sum(a), 6) / 80 - round(sum(b), 6) / 70, 6
    )
    n_extreme = 0
    for rep in range(99):
        sa = sb = 0.0
        ka = kb = 0
        for i, v in vals.items():
            h = hashlib.md5(f"{i}#{rep}:42".encode()).hexdigest()
            u = int(h[:15], 16) / float(16**15)
            if u < pa:
                sa += v
                ka += 1
            else:
                sb += v
                kb += 1
        if ka and kb:
            d = round(round(sa, 6) / ka - round(sb, 6) / kb, 6)
            if abs(d) >= abs(diff_obs):
                n_extreme += 1
    assert got["n_a"] == 80 and got["n_b"] == 70
    assert got["diff_obs"] == pytest.approx(diff_obs, abs=1e-9)
    assert got["n_extreme"] == n_extreme
    assert got["p_two_sided"] == pytest.approx((1 + n_extreme) / 100, abs=1e-9)
    assert got["p_two_sided"] <= 0.02  # planted 3-sigma shift detected

    # null: both halves from the same distribution -> p well above floor
    c = rng.normal(0.0, 1.0, 150)
    rows0 = [("a" if i < 75 else "b", i, float(v)) for i, v in enumerate(c)]
    df0 = spark.createDataFrame(rows0, "g string, id long, v double")
    p0 = randomization_test(
        df0, "v", "g", "a", "b", "id", n_perm=99, seed=42
    ).collect()[0]["p_two_sided"]
    assert p0 > 0.05


class TestMutualInformation:
    def test_matches_math_replay(self, spark):
        import math

        from mhm_data_pipelines_spark.operators.stats_tests import (
            mutual_information,
        )

        rows = [((i * 3) % 4, (i * 3) % 2) for i in range(40)]
        df = spark.createDataFrame(rows, "x int, y int")
        got = mutual_information(df, [("x", "y", "x", "y")]).collect()[0]

        import collections

        jc = collections.Counter(rows)
        xc = collections.Counter(r[0] for r in rows)
        yc = collections.Counter(r[1] for r in rows)
        n = len(rows)
        mi = sum(
            (c / n) * math.log(c * n / (xc[x] * yc[y]))
            for (x, y), c in jc.items()
        )
        hx = -sum((c / n) * math.log(c / n) for c in xc.values())
        hy = -sum((c / n) * math.log(c / n) for c in yc.values())
        assert got["mi"] == pytest.approx(round(mi, 6), abs=1e-6)
        assert got["h_x"] == pytest.approx(round(hx, 6), abs=1e-6)
        assert got["h_y"] == pytest.approx(round(hy, 6), abs=1e-6)
        assert got["nmi"] == pytest.approx(
            round(mi / math.sqrt(hx * hy), 6), abs=1e-6
        )

    def test_independent_and_identical(self, spark):
        import math

        from mhm_data_pipelines_spark.operators.stats_tests import (
            mutual_information,
        )

        # x uniform over 4, y = x -> perfectly dependent: nmi == 1
        dep = spark.createDataFrame(
            [(i % 4, i % 4) for i in range(40)], "x int, y int"
        )
        got = mutual_information(dep, [("x", "y", "x", "y")]).collect()[0]
        assert got["nmi"] == pytest.approx(1.0)
        assert got["mi"] == pytest.approx(round(math.log(4), 6))
        # independent by construction (cycle lengths 2 and 5 coprime,
        # 40 a multiple of 10): mi == 0
        ind = spark.createDataFrame(
            [(i % 2, i % 5) for i in range(40)], "x int, y int"
        )
        got = mutual_information(ind, [("x", "y", "x", "y")]).collect()[0]
        assert got["mi"] == pytest.approx(0.0)
        assert got["nmi"] == pytest.approx(0.0)

    def test_constant_column_nmi_zero_and_null_category(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            mutual_information,
        )

        df = spark.createDataFrame(
            [(1, None), (1, None), (1, 2)], "x int, y int"
        )
        got = mutual_information(df, [("x", "y", "x", "y")]).collect()[0]
        assert got["h_x"] == 0.0
        assert got["nmi"] == 0.0        # degenerate marginal contract
        assert got["h_y"] > 0.0         # NULL counted as a category

    def test_multiple_pairs_and_expressions(self, spark):
        from pyspark.sql import functions as F

        from mhm_data_pipelines_spark.operators.stats_tests import (
            mutual_information,
        )

        df = spark.createDataFrame(
            [(i, float(i % 3)) for i in range(30)], "x int, v double"
        )
        out = mutual_information(
            df,
            [
                ("x", "v", "x", "v"),
                (F.pmod(F.col("x"), F.lit(3)), "v", "xmod3", "v"),
            ],
        ).collect()
        by = {(r["x_col"], r["y_col"]): r for r in out}
        assert by[("xmod3", "v")]["nmi"] == pytest.approx(1.0)
        with pytest.raises(ValueError, match="non-empty"):
            mutual_information(df, [])


class TestSPRT:
    def _run(self, spark, seqs, **kw):
        import math

        from mhm_data_pipelines_spark.operators.stats_tests import (
            sprt_bernoulli,
        )

        rows = [
            (g, i, x) for g, xs in seqs.items() for i, x in enumerate(xs)
        ]
        df = spark.createDataFrame(rows, "g string, i int, x int")
        got = {
            r["g"]: r.asDict()
            for r in sprt_bernoulli(
                df, ["g"], "x", ["i"], **kw
            ).collect()
        }
        return got, math

    def test_matches_python_replay(self, spark):
        kw = dict(p0=0.4, p1=0.6, alpha=0.05, beta=0.05)
        seqs = {
            "up": [1] * 12,                   # crosses A fast
            "down": [0] * 12,                 # crosses B fast
            "mix": [1, 0] * 4,                # wanders: continue
        }
        got, math = self._run(spark, seqs, **kw)
        A = math.log((1 - 0.05) / 0.05)
        B = math.log(0.05 / (1 - 0.05))
        ws = math.log(0.6 / 0.4)
        wf = math.log(0.4 / 0.6)
        for g, xs in seqs.items():
            llr, hit_rn, hit_llr, dec = 0.0, None, None, "continue"
            for i, x in enumerate(xs, start=1):
                llr += ws if x else wf
                if dec == "continue":
                    if llr >= A:
                        dec, hit_rn, hit_llr = "accept_h1", i, llr
                    elif llr <= B:
                        dec, hit_rn, hit_llr = "accept_h0", i, llr
            r = got[g]
            assert r["decision"] == dec, g
            assert r["n_at_decision"] == hit_rn
            assert r["final_llr"] == pytest.approx(round(llr, 6))
            if hit_llr is not None:
                assert r["llr_at_decision"] == pytest.approx(
                    round(hit_llr, 6)
                )

    def test_decision_sticks_after_crossing(self, spark):
        # crosses A then collapses: decision stays accept_h1 at the
        # FIRST crossing even though final_llr ends negative
        seqs = {"g": [1] * 8 + [0] * 30}
        got, math = self._run(
            spark, seqs, p0=0.4, p1=0.6, alpha=0.05, beta=0.05
        )
        r = got["g"]
        assert r["decision"] == "accept_h1"
        assert r["n_at_decision"] == 8  # ln(1.5)*8 = 3.24 >= ln(19)
        assert r["final_llr"] < 0

    def test_guards(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            sprt_bernoulli,
        )

        df = spark.createDataFrame([("g", 1, 1)], "g string, i int, x int")
        with pytest.raises(ValueError, match="p0, p1"):
            sprt_bernoulli(df, ["g"], "x", ["i"], p0=0.5, p1=0.5)
        with pytest.raises(ValueError, match="alpha"):
            sprt_bernoulli(
                df, ["g"], "x", ["i"], p0=0.4, p1=0.6, alpha=1.5
            )


class TestFDRAdjust:
    def test_matches_statsmodels_reference_values(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            fdr_adjust,
        )

        # classic BH example: hand-computed step-up values
        ps = [0.01, 0.04, 0.03, 0.005, 0.2]
        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(ps)], "id int, p double"
        )
        got = {
            r["id"]: r.asDict()
            for r in fdr_adjust(df, "p", alpha=0.05).collect()
        }
        # sorted: 0.005,0.01,0.03,0.04,0.2 -> q = .025,.025,.05,.05,.2
        want = {3: 0.025, 0: 0.025, 2: 0.05, 1: 0.05, 4: 0.2}
        for i, q in want.items():
            assert got[i]["p_adj"] == pytest.approx(q), i
            assert got[i]["reject"] == (q <= 0.05)

    def test_monotone_capped_and_python_replay(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            fdr_adjust,
        )

        ps = [((i * 37) % 100 + 1) / 100.0 for i in range(30)]
        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(ps)], "id int, p double"
        )
        rows = fdr_adjust(df, "p").collect()
        n = len(ps)
        srt = sorted(ps)
        adj_sorted = [0.0] * n
        running = float("inf")
        for j in range(n - 1, -1, -1):
            running = min(running, srt[j] * n / (j + 1))
            adj_sorted[j] = min(1.0, running)
        want = dict(zip(srt, adj_sorted))  # ties collapse identically
        for r in rows:
            assert r["p_adj"] == pytest.approx(want[r["p"]])
            assert r["p_adj"] <= 1.0

    def test_null_p_passthrough_and_guard(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            fdr_adjust,
        )

        df = spark.createDataFrame(
            [(1, 0.01), (2, None), (3, 0.5)], "id int, p double"
        )
        got = {r["id"]: r.asDict() for r in fdr_adjust(df, "p").collect()}
        assert got[2]["p_adj"] is None and got[2]["reject"] is None
        # NULL excluded from n: n=2, so p_adj(0.01) = 0.02
        assert got[1]["p_adj"] == pytest.approx(0.02)
        with pytest.raises(ValueError, match="alpha"):
            fdr_adjust(df, "p", alpha=0.0)


class TestNormalCDF:
    def test_matches_erf_reference(self, spark):
        import math

        from mhm_data_pipelines_spark.functions.stats import normal_cdf

        zs = [-4.0, -1.96, -0.5, 0.0, 0.3, 1.0, 2.575, 4.0]
        df = spark.createDataFrame([(z,) for z in zs], "z double")
        got = {
            r["z"]: r["phi"]
            for r in df.select(
                "z", normal_cdf("z").alias("phi")
            ).collect()
        }
        for z in zs:
            ref = 0.5 * (1 + math.erf(z / math.sqrt(2)))
            assert got[z] == pytest.approx(ref, abs=1e-7)

    def test_sql_twin_agrees_to_ulp(self, spark):
        import duckdb

        from mhm_data_pipelines_spark.functions.stats import (
            NORMAL_CDF_SQL,
            normal_cdf,
        )

        zs = [(-2.3,), (-0.1,), (0.7,), (1.644853,), (3.09,)]
        df = spark.createDataFrame(zs, "z double")
        spark_vals = [
            r["phi"]
            for r in df.select(normal_cdf("z").alias("phi"))
            .orderBy("phi")
            .collect()
        ]
        con = duckdb.connect()
        duck_vals = sorted(
            con.sql(
                "SELECT "
                + NORMAL_CDF_SQL.format(z="z")
                + " FROM (SELECT unnest(["
                + ",".join(str(z[0]) for z in zs)
                + "]) AS z)"
            ).df().iloc[:, 0]
        )
        import math

        for s, d in zip(spark_vals, duck_vals):
            # identical expression TREES; the only residual is the
            # JVM-vs-C libm exp() last ulp (documented in normal_cdf)
            assert math.isclose(s, d, rel_tol=1e-14), (s, d)


class TestCUPED:
    def test_matches_numpy_reference(self, spark):
        import numpy as np

        from mhm_data_pipelines_spark.operators.stats_tests import (
            cuped_report,
        )

        rng = [((i * 17) % 13, (i * 7) % 5) for i in range(60)]
        rows = [
            ("A" if i % 2 == 0 else "B", float(x + n), float(x))
            for i, (x, n) in enumerate(rng)
        ]
        df = spark.createDataFrame(rows, "arm string, y double, x double")
        got = {
            r["arm"]: r.asDict()
            for r in cuped_report(df, "arm", "y", "x").collect()
        }
        ys = np.array([r[1] for r in rows])
        xs = np.array([r[2] for r in rows])
        arms = np.array([r[0] for r in rows])
        theta = np.cov(xs, ys, bias=True)[0, 1] / np.var(xs)
        y_adj = ys - theta * (xs - xs.mean())
        for a in ("A", "B"):
            m = arms == a
            assert got[a]["n"] == int(m.sum())
            assert got[a]["mean_y"] == pytest.approx(
                round(ys[m].mean(), 6)
            )
            assert got[a]["mean_cuped"] == pytest.approx(
                round(y_adj[m].mean(), 6), abs=1e-6
            )
            assert got[a]["var_y"] == pytest.approx(
                round(np.var(ys[m]), 6), abs=1e-6
            )
            assert got[a]["var_cuped"] == pytest.approx(
                round(np.var(y_adj[m]), 6), abs=1e-5
            )
            assert got[a]["theta"] == pytest.approx(round(theta, 6))

    def test_strong_covariate_shrinks_variance(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            cuped_report,
        )

        # y = x + tiny noise: CUPED should remove nearly all variance
        rows = [
            ("A", float(i + (i % 3) * 0.01), float(i)) for i in range(40)
        ]
        df = spark.createDataFrame(rows, "arm string, y double, x double")
        r = cuped_report(df, "arm", "y", "x").collect()[0]
        assert r["var_reduction_pct"] > 99.0
        # means preserved up to the covariate-mean centering (1 arm:
        # x̄_arm == x̄_global, so mean_cuped == mean_y exactly)
        assert r["mean_cuped"] == pytest.approx(r["mean_y"])

    def test_degenerate_covariate_is_noop(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            cuped_report,
        )

        rows = [("A", float(i), 5.0) for i in range(10)]
        df = spark.createDataFrame(rows, "arm string, y double, x double")
        r = cuped_report(df, "arm", "y", "x").collect()[0]
        assert r["theta"] == 0.0
        assert r["var_cuped"] == r["var_y"]

    def test_null_rows_excluded(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            cuped_report,
        )

        rows = [("A", 1.0, 2.0), ("A", None, 2.0), (None, 1.0, 2.0),
                ("A", 3.0, None)]
        df = spark.createDataFrame(rows, "arm string, y double, x double")
        assert cuped_report(df, "arm", "y", "x").collect()[0]["n"] == 1


class TestSRMCheck:
    def test_matches_scipy_free_reference(self, spark):
        import math

        from mhm_data_pipelines_spark.operators.stats_tests import (
            srm_check,
        )

        # 60/40 observed vs designed 50/50 over n=100
        rows = [("A",)] * 60 + [("B",)] * 40
        df = spark.createDataFrame(rows, "arm string")
        r = srm_check(
            df, "arm", {"A": 0.5, "B": 0.5}
        ).collect()[0]
        # chi2 = (60-50)^2/50 + (40-50)^2/50 = 4.0
        assert r["chi2"] == pytest.approx(4.0)
        assert r["dof"] == 1
        p_ref = 2 * (1 - 0.5 * (1 + math.erf(math.sqrt(4.0) / math.sqrt(2))))
        assert r["p_value"] == pytest.approx(p_ref, abs=1e-6)

    def test_uniform_default_and_zero_traffic_arm(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            srm_check,
        )

        df = spark.createDataFrame([("A",)] * 10, "arm string")
        # designed 3-way split, two arms got NOTHING -> huge chi2
        r = srm_check(
            df, "arm", {"A": 1 / 3, "B": 1 / 3, "C": 1 / 3}
        ).collect()[0]
        assert r["dof"] == 2
        assert r["chi2"] == pytest.approx(20.0)  # 2*(10/3) + (20/3)...
        assert r["p_value"] < 0.001
        # uniform default over OBSERVED arms: perfectly balanced
        df2 = spark.createDataFrame(
            [("A",)] * 5 + [("B",)] * 5, "arm string"
        )
        r2 = srm_check(df2, "arm").collect()[0]
        assert r2["chi2"] == 0.0 and r2["p_value"] == pytest.approx(1.0)

    def test_null_arms_reported_not_tested(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            srm_check,
        )

        df = spark.createDataFrame(
            [("A",), ("B",), (None,), (None,)], "arm string"
        )
        r = srm_check(df, "arm").collect()[0]
        assert r["n"] == 2 and r["n_null_arm"] == 2

    def test_guards(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            srm_check,
        )

        df = spark.createDataFrame([("A",), ("Z",)], "arm string")
        with pytest.raises(ValueError, match="sum to 1"):
            srm_check(df, "arm", {"A": 0.5, "B": 0.1})
        with pytest.raises(ValueError, match="absent from expected"):
            srm_check(df, "arm", {"A": 0.5, "B": 0.5})

    def test_single_arm_rejected_not_nan(self, spark):
        # ADVICE r8: k=1 -> dof=0 made Wilson-Hilferty divide by zero
        # and return NaN/Inf p_value; both branches must refuse early.
        from mhm_data_pipelines_spark.operators.stats_tests import (
            srm_check,
        )

        df = spark.createDataFrame([("A",)] * 7, "arm string")
        with pytest.raises(ValueError, match=">= 2 arms in expected"):
            srm_check(df, "arm", {"A": 1.0})
        with pytest.raises(ValueError, match=">= 2 observed arms"):
            srm_check(df, "arm")


class TestDiDReport:
    def test_matches_numpy_reference(self, spark):
        import math

        import numpy as np

        from mhm_data_pipelines_spark.operators.stats_tests import (
            did_report,
        )

        cells = {
            ("T", "post"): [5.0, 7.0, 6.0, 8.0],
            ("T", "pre"): [2.0, 3.0, 4.0],
            ("C", "post"): [3.0, 4.0, 5.0, 4.0],
            ("C", "pre"): [2.0, 3.0, 2.5],
        }
        rows = [(a, p, y) for (a, p), ys in cells.items() for y in ys]
        df = spark.createDataFrame(
            rows, "arm string, period string, y double"
        )
        r = did_report(df, "arm", "period", "y", "T", "post").collect()[0]
        m = {k: np.mean(v) for k, v in cells.items()}
        v = {k: np.var(v, ddof=1) for k, v in cells.items()}
        n = {k: len(v) for k, v in cells.items()}
        did = (m[("T", "post")] - m[("T", "pre")]) - (
            m[("C", "post")] - m[("C", "pre")]
        )
        se = math.sqrt(sum(v[k] / n[k] for k in cells))
        assert r["did"] == pytest.approx(round(did, 6))
        assert r["se"] == pytest.approx(round(se, 6), abs=1e-6)
        assert r["z"] == pytest.approx(round(did / se, 6), abs=1e-6)
        assert r["n_tp"] == 4 and r["n_cq"] == 3
        assert 0.0 <= r["p_value"] <= 1.0

    def test_parallel_trends_null_effect(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            did_report,
        )

        # both arms rise by exactly 2: DiD must be 0
        rows = []
        for i in range(20):
            base = float(i % 5)
            rows += [
                ("T", "pre", base), ("T", "post", base + 2.0),
                ("C", "pre", base), ("C", "post", base + 2.0),
            ]
        df = spark.createDataFrame(
            rows, "arm string, period string, y double"
        )
        r = did_report(df, "arm", "period", "y", "T", "post").collect()[0]
        assert r["did"] == 0.0

    def test_empty_cell_yields_null_stats(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            did_report,
        )

        rows = [("T", "post", 1.0), ("T", "post", 2.0),
                ("C", "pre", 1.0), ("C", "post", 2.0)]
        df = spark.createDataFrame(
            rows, "arm string, period string, y double"
        )
        r = did_report(df, "arm", "period", "y", "T", "post").collect()[0]
        assert r["n_tq"] == 0
        assert r["did"] is None and r["p_value"] is None


class TestBayesAB:
    def test_matches_closed_form(self, spark):
        import math

        from mhm_data_pipelines_spark.operators.stats_tests import (
            bayes_ab,
        )

        rows = [("A", 1)] * 30 + [("A", 0)] * 70 + \
               [("B", 1)] * 45 + [("B", 0)] * 55
        df = spark.createDataFrame(rows, "arm string, ok int")
        out = {r["arm"]: r for r in
               bayes_ab(df, "arm", "ok", control="A").collect()}

        def post(s, n, a0=1.0, b0=1.0):
            a, b = a0 + s, b0 + n - s
            return a / (a + b), a * b / ((a + b) ** 2 * (a + b + 1))

        ma, va = post(30, 100)
        mb, vb = post(45, 100)
        assert out["A"]["post_mean"] == pytest.approx(ma, abs=1e-6)
        assert out["A"]["p_beats_control"] is None
        z = (mb - ma) / math.sqrt(va + vb)
        p = 0.5 * (1 + math.erf(z / math.sqrt(2)))
        assert out["B"]["p_beats_control"] == pytest.approx(p, abs=1e-5)
        assert out["B"]["n"] == 100 and out["B"]["s"] == 45

    def test_null_success_dropped_and_missing_control_fails(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            bayes_ab,
        )

        rows = [("A", True), ("A", None), ("B", False)]
        df = spark.createDataFrame(rows, "arm string, ok boolean")
        out = {r["arm"]: r for r in
               bayes_ab(df, "arm", "ok", control="A").collect()}
        assert out["A"]["n"] == 1
        with pytest.raises(Exception, match="control arm"):
            bayes_ab(df, "arm", "ok", control="Z").collect()
        with pytest.raises(ValueError, match="priors"):
            bayes_ab(df, "arm", "ok", control="A", prior_alpha=0)


class TestEntropyLDiversity:
    def test_hand_computed_entropy(self, spark):
        import math

        from mhm_data_pipelines_spark.operators.privacy import (
            entropy_l_diversity_classes,
        )

        # class g1: sensitive 3:1 split -> H = -(0.75 ln .75 + .25 ln .25)
        # class g2: uniform over 2 -> H = ln 2 (meets l=2 exactly)
        rows = [("g1", "x")] * 3 + [("g1", "y")] + \
               [("g2", "x"), ("g2", "y")]
        df = spark.createDataFrame(rows, "qi string, s string")
        out = {r["qi"]: r for r in entropy_l_diversity_classes(
            df, ["qi"], "s", l=2.0).collect()}
        h1 = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
        assert out["g1"]["entropy"] == pytest.approx(h1, abs=1e-6)
        assert out["g1"]["meets_l"] is False  # H < ln 2
        assert out["g2"]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
        assert out["g2"]["meets_l"] is True
        assert out["g1"]["effective_l"] == pytest.approx(
            math.exp(h1), abs=1e-5
        )

    def test_null_sensitive_is_a_category(self, spark):
        from mhm_data_pipelines_spark.operators.privacy import (
            entropy_l_diversity_classes,
        )

        rows = [("g", "x"), ("g", None)]
        df = spark.createDataFrame(rows, "qi string, s string")
        r = entropy_l_diversity_classes(df, ["qi"], "s").collect()[0]
        assert r["n_sensitive"] == 2 and r["meets_l"] is True

    def test_guards(self, spark):
        from mhm_data_pipelines_spark.operators.privacy import (
            entropy_l_diversity_classes,
        )

        df = spark.createDataFrame([("g", "x")], "qi string, s string")
        with pytest.raises(ValueError, match="quasi_cols"):
            entropy_l_diversity_classes(df, [], "s")
        with pytest.raises(ValueError, match="l must be"):
            entropy_l_diversity_classes(df, ["qi"], "s", l=1.0)


class TestKruskalWallis:
    def test_textbook_no_ties(self, spark):
        """Three separated groups of 3: H = 7.2 exactly (ranks 1..9)."""
        from mhm_data_pipelines_spark.operators.stats_tests import (
            kruskal_wallis,
        )

        rows = [("g1", v) for v in (1.0, 2.0, 3.0)] + [
            ("g2", v) for v in (4.0, 5.0, 6.0)
        ] + [("g3", v) for v in (7.0, 8.0, 9.0)]
        df = spark.createDataFrame(rows, "grp string, v double")
        r = kruskal_wallis(df, "v", "grp").collect()[0]
        assert (r.n, r.k) == (9, 3)
        assert r.h == pytest.approx(7.2)
        assert r.h_corrected == pytest.approx(7.2)
        assert 0 < r.p_value < 0.05

    def test_two_groups_matches_mwu_z(self, spark):
        """k=2 KW is the square of the MWU z (no ties): chi2 == z²."""
        from mhm_data_pipelines_spark.operators.stats_tests import (
            kruskal_wallis,
            mann_whitney_u,
        )

        rows = [("a", float(v)) for v in (1, 4, 6, 9)] + [
            ("b", float(v)) for v in (2, 3, 12, 20)
        ]
        df = spark.createDataFrame(rows, "grp string, v double")
        kw = kruskal_wallis(df, "v", "grp").collect()[0]
        mwu = mann_whitney_u(df, "v", "grp", "a", "b").collect()[0]
        assert kw.h_corrected == pytest.approx(mwu.z**2, abs=1e-5)

    def test_all_tied_null(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            kruskal_wallis,
        )

        df = spark.createDataFrame(
            [("a", 1.0), ("b", 1.0)], "grp string, v double"
        )
        r = kruskal_wallis(df, "v", "grp").collect()[0]
        assert r.h_corrected is None and r.p_value is None


class TestCochranArmitage:
    def test_hand_computed_trend(self, spark):
        """Doses 0/1/2, rates .1/.5/.9 over n=10 each: T=8, Var=5."""
        from mhm_data_pipelines_spark.operators.stats_tests import (
            cochran_armitage,
        )

        rows = (
            [(0.0, 1)] * 1 + [(0.0, 0)] * 9
            + [(1.0, 1)] * 5 + [(1.0, 0)] * 5
            + [(2.0, 1)] * 9 + [(2.0, 0)] * 1
        )
        df = spark.createDataFrame(rows, "dose double, y int")
        r = cochran_armitage(df, "y", "dose").collect()[0]
        assert (r.n, r.k) == (30, 3)
        assert r.rate == pytest.approx(0.5)
        assert r.z == pytest.approx(8.0 / 5.0**0.5, abs=1e-6)
        assert r.p_value < 0.001

    def test_no_trend_small_z(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            cochran_armitage,
        )

        rows = [(float(d), y) for d in (0, 1, 2) for y in (0, 1)]
        df = spark.createDataFrame(rows, "dose double, y int")
        r = cochran_armitage(df, "y", "dose").collect()[0]
        assert r.z == pytest.approx(0.0, abs=1e-9)
        assert r.p_value == pytest.approx(1.0, abs=1e-6)

    def test_degenerate_null(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            cochran_armitage,
        )

        df = spark.createDataFrame(
            [(0.0, 1), (0.0, 1)], "dose double, y int"
        )
        r = cochran_armitage(df, "y", "dose").collect()[0]
        assert r.z is None and r.p_value is None


class TestMcnemar:
    def test_hand_computed(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            mcnemar_test,
        )

        rows = (
            [(1, 0)] * 5 + [(0, 1)] * 1 + [(1, 1)] * 3 + [(0, 0)] * 2
        )
        df = spark.createDataFrame(rows, "y1 int, y2 int")
        r = mcnemar_test(df, "y1", "y2").collect()[0]
        assert (r.n, r.b, r.c) == (11, 5, 1)
        assert r.chi2 == pytest.approx((4 - 1) ** 2 / 6.0, abs=1e-6)
        r2 = mcnemar_test(df, "y1", "y2", continuity=False).collect()[0]
        assert r2.chi2 == pytest.approx(16 / 6.0, abs=1e-6)
        assert 0 < r.p_value < 1

    def test_no_discordant_null(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            mcnemar_test,
        )

        df = spark.createDataFrame(
            [(1, 1), (0, 0)], "y1 int, y2 int"
        )
        r = mcnemar_test(df, "y1", "y2").collect()[0]
        assert r.chi2 is None and r.p_value is None

    def test_continuity_clamps_at_zero(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            mcnemar_test,
        )

        df = spark.createDataFrame(
            [(1, 0), (0, 1)], "y1 int, y2 int"
        )
        r = mcnemar_test(df, "y1", "y2").collect()[0]
        assert r.chi2 == pytest.approx(0.0)
        assert r.p_value == pytest.approx(1.0, abs=1e-6)


class TestFriedman:
    def test_textbook_q(self, spark):
        """3 blocks, 3 treatments, identical orderings: Q = 6."""
        from mhm_data_pipelines_spark.operators.stats_tests import (
            friedman_test,
        )

        rows = [
            (b, t, float(v))
            for b in ("b1", "b2", "b3")
            for t, v in (("t1", 1), ("t2", 2), ("t3", 3))
        ]
        df = spark.createDataFrame(rows, "blk string, trt string, v double")
        r = friedman_test(df, "blk", "trt", "v").collect()[0]
        assert (r.n_blocks, r.k) == (3, 3)
        assert r.q == pytest.approx(6.0)
        assert 0 < r.p_value < 0.1

    def test_two_treatments_hand_computed(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            friedman_test,
        )

        rows = [
            (b, t, float(v))
            for b in range(4)
            for t, v in (("a", 1), ("b", 2))
        ]
        df = spark.createDataFrame(rows, "blk int, trt string, v double")
        r = friedman_test(df, "blk", "trt", "v").collect()[0]
        assert r.q == pytest.approx(4.0)

    def test_all_tied_null(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            friedman_test,
        )

        rows = [(b, t, 1.0) for b in range(3) for t in ("a", "b")]
        df = spark.createDataFrame(rows, "blk int, trt string, v double")
        r = friedman_test(df, "blk", "trt", "v").collect()[0]
        assert r.q is None and r.p_value is None

    def test_incomplete_blocks_excluded(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            friedman_test,
        )

        rows = [
            (b, t, float(v))
            for b in ("b1", "b2", "b3")
            for t, v in (("t1", 1), ("t2", 2), ("t3", 3))
        ] + [("b4", "t1", 9.0)]  # incomplete block -> dropped
        df = spark.createDataFrame(rows, "blk string, trt string, v double")
        r = friedman_test(df, "blk", "trt", "v").collect()[0]
        assert r.n_blocks == 3
        assert r.q == pytest.approx(6.0)


class TestGroupSequential:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "unit long, arm string, y int"
        )

    def test_final_look_matches_pooled_ztest(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            group_sequential_ztest,
            two_proportion_ztest,
        )

        rows = [
            (i, "T" if i % 2 else "C", 1 if (i * 7) % 3 == 0 else 0)
            for i in range(40)
        ]
        df = self._df(spark, rows)
        gs = group_sequential_ztest(
            df, "arm", "y", "unit", "C", "T", looks=4
        ).collect()
        assert [r.look for r in gs] == [1, 2, 3, 4]
        final = gs[-1]
        assert final.n == 40
        ref = two_proportion_ztest(df, "arm", "T", "C", "y").collect()[0]
        assert final.z == pytest.approx(ref.z, abs=1e-6)
        # OBF shape: boundary shrinks toward critical_c at the end
        bs = [r.boundary for r in gs]
        assert bs == sorted(bs, reverse=True)
        assert bs[-1] == pytest.approx(2.024, abs=1e-6)
        assert bs[0] == pytest.approx(2.024 * 2.0, abs=1e-6)

    def test_cumulative_counts_and_crossing(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            group_sequential_ztest,
        )

        # extreme effect: treatment always converts, control never
        rows = [
            (i, "T" if i % 2 else "C", 1 if i % 2 else 0)
            for i in range(40)
        ]
        gs = group_sequential_ztest(
            self._df(spark, rows), "arm", "y", "unit", "C", "T",
            looks=2,
        ).collect()
        assert gs[0].n == 20 and gs[1].n == 40
        assert gs[1].crossed is True

    def test_degenerate_variance_null(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            group_sequential_ztest,
        )

        rows = [(i, "T" if i % 2 else "C", 0) for i in range(8)]
        gs = group_sequential_ztest(
            self._df(spark, rows), "arm", "y", "unit", "C", "T",
            looks=2,
        ).collect()
        assert all(r.z is None and r.crossed is None for r in gs)

    def test_guards(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            group_sequential_ztest,
        )

        df = self._df(spark, [(1, "T", 1)])
        with pytest.raises(ValueError, match="looks"):
            group_sequential_ztest(
                df, "arm", "y", "unit", "C", "T", looks=1
            )
        with pytest.raises(ValueError, match="critical_c"):
            group_sequential_ztest(
                df, "arm", "y", "unit", "C", "T", critical_c=0
            )


class TestEbShrinkage:
    def test_small_groups_shrink_more(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            eb_rate_shrinkage,
        )

        rows = (
            [("tiny", 1)] * 1                      # 1/1 = 100%
            + [("big", 1)] * 60 + [("big", 0)] * 40  # 60%
            + [("mid", 1)] * 3 + [("mid", 0)] * 7    # 30%
            + [("low", 1)] * 1 + [("low", 0)] * 9    # 10%
        )
        df = spark.createDataFrame(rows, "g string, y int")
        out = {
            r.g: r for r in eb_rate_shrinkage(df, "g", "y").collect()
        }
        assert out["tiny"].rate == pytest.approx(1.0)
        # the 1/1 group is pulled far toward the grand mean...
        assert out["tiny"].shrunk_rate < 0.9
        # ...while the n=100 group barely moves
        assert abs(out["big"].shrunk_rate - 0.6) < abs(
            out["tiny"].shrunk_rate - 1.0
        )
        assert out["big"].prior_strength is not None

    def test_python_replay(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            eb_rate_shrinkage,
        )

        data = {"a": (10, 3), "b": (20, 15), "c": (5, 1)}
        rows = [
            (g, 1 if i < s else 0)
            for g, (n, s) in data.items()
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "g string, y int")
        out = {
            r.g: r for r in eb_rate_shrinkage(df, "g", "y").collect()
        }
        rates = [s / n for (n, s) in data.values()]
        m = sum(rates) / 3
        v = sum((r - m) ** 2 for r in rates) / 3
        kk = m * (1 - m) / v - 1
        for g, (n, s) in data.items():
            want = (s + m * kk) / (n + kk)
            assert out[g].shrunk_rate == pytest.approx(want, abs=1e-6)

    def test_degenerate_no_shrink(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            eb_rate_shrinkage,
        )

        rows = [("a", 1), ("a", 0), ("b", 1), ("b", 0)]
        df = spark.createDataFrame(rows, "g string, y int")
        out = eb_rate_shrinkage(df, "g", "y").collect()
        for r in out:
            assert r.shrunk_rate == r.rate
            assert r.prior_strength is None


class TestQiniCurve:
    def test_perfect_targeting_bows_above_random(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            qini_curve,
        )

        rows = []
        for i in range(40):
            score = float(40 - i)          # i < 20 -> top bin
            arm = "T" if i % 2 == 0 else "C"
            # persuadables live in the top half: treated convert
            y = 1 if (i < 20 and arm == "T") else 0
            rows.append((score, arm, y))
        df = spark.createDataFrame(rows, "score double, arm string, y int")
        out = qini_curve(
            df, "score", "arm", "y", "C", "T", n_bins=2
        ).collect()
        assert [r.bin for r in out] == [1, 2]
        top, last = out
        # top bin: 10 treated converters, control zero
        assert top.qini == pytest.approx(10.0)
        assert top.qini > top.random_line
        # the curve and the diagonal meet at the endpoint by identity
        assert last.qini == pytest.approx(last.random_line)
        assert last.n_cum == 40

    def test_guards_and_filters(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            qini_curve,
        )

        df = spark.createDataFrame(
            [(1.0, "T", 1), (2.0, "C", 0), (3.0, "X", 1),
             (None, "T", 1)],
            "score double, arm string, y int",
        )
        out = qini_curve(df, "score", "arm", "y", "C", "T", n_bins=2)
        assert out.collect()[-1].n_cum == 2  # X and NULL dropped
        with pytest.raises(ValueError, match="n_bins"):
            qini_curve(df, "score", "arm", "y", "C", "T", n_bins=1)


class TestGroupSequentialDensify:
    def test_tied_order_still_emits_every_look(self, spark):
        """Heavily tied enrollment order collapses quantile cuts; the
        contract is still one row per scheduled look, empty waves
        inheriting the prior cumulative state."""
        from mhm_data_pipelines_spark.operators.stats_tests import (
            group_sequential_ztest,
        )

        # 75% of units share order=1: cuts c1=c2=c3 collide
        rows = [(1 if i < 30 else 2, "T" if i % 2 else "C",
                 1 if i % 3 == 0 else 0) for i in range(40)]
        df = spark.createDataFrame(rows, "o int, arm string, y int")
        gs = group_sequential_ztest(
            df, "arm", "y", "o", "C", "T", looks=4
        ).collect()
        assert [r.look for r in gs] == [1, 2, 3, 4]
        # empty waves carry the previous cumulative n forward
        ns = [r.n for r in gs]
        assert ns[-1] == 40
        assert all(a <= b for a, b in zip(ns, ns[1:]))


class TestWilsonCi:
    def test_hand_computed_95(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            wilson_ci,
        )

        rows = [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1)] * 1
        df = spark.createDataFrame(rows, "g string, y int")
        out = {r.g: r for r in wilson_ci(df, "g", "y").collect()}
        a = out["a"]
        z = 1.959964
        n, p = 10.0, 0.8
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * ((p * 0.2 / n + z * z / (4 * n * n)) ** 0.5) / denom
        assert a.ci_low == pytest.approx(center - half, abs=1e-6)
        assert a.ci_high == pytest.approx(center + half, abs=1e-6)
        # p = 1 on n = 1: Wald would give [1, 1]; Wilson stays wide
        b = out["b"]
        assert b.rate == pytest.approx(1.0)
        assert b.ci_low < 0.3 and b.ci_high == pytest.approx(1.0)

    def test_guard(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            wilson_ci,
        )

        df = spark.createDataFrame([("a", 1)], "g string, y int")
        with pytest.raises(ValueError, match="z must"):
            wilson_ci(df, "g", "y", z=0.0)


class TestCliffsDelta:
    def test_complete_separation(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            cliffs_delta,
        )

        rows = [("a", float(v)) for v in (5, 6, 7)] + [
            ("b", float(v)) for v in (1, 2, 3)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        r = cliffs_delta(df, "v", "g", "a", "b").collect()[0]
        assert r.delta == pytest.approx(1.0)
        assert r.magnitude == "large"

    def test_hand_computed_with_ties(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            cliffs_delta,
        )

        # a = {1, 3}, b = {1, 2}: pairs (1,1)=.5, (1,2)=0,
        # (3,1)=1, (3,2)=1 -> U_a = 2.5, delta = 2*2.5/4 - 1 = 0.25
        rows = [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 2.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = cliffs_delta(df, "v", "g", "a", "b").collect()[0]
        assert r.delta == pytest.approx(0.25)
        assert r.magnitude == "small"

    def test_identical_distributions_zero(self, spark):
        from mhm_data_pipelines_spark.operators.stats_tests import (
            cliffs_delta,
        )

        rows = [(g, float(v)) for g in ("a", "b") for v in range(5)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = cliffs_delta(df, "v", "g", "a", "b").collect()[0]
        assert r.delta == pytest.approx(0.0)
        assert r.magnitude == "negligible"
