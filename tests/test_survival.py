"""Kaplan-Meier: hand-computed product-limit values, censoring rules,
the everyone-fails zero tail, and the activity-span builder contract."""

from __future__ import annotations

import pytest

from mhm_data_pipelines_spark.operators.survival import (
    activity_spans,
    kaplan_meier,
)


@pytest.fixture(scope="module")
def subjects(spark):
    # (duration, event): classic textbook set — deaths at 1 and 3 (x2),
    # censors at 2 and 5.
    rows = [(1, 1), (2, 0), (3, 1), (3, 1), (5, 0)]
    return spark.createDataFrame(rows, "duration int, event int")


def test_km_hand_values(spark, subjects):
    got = {r.t: r for r in kaplan_meier(subjects).collect()}
    assert sorted(got) == [1, 2, 3, 5]
    assert (got[1].n_at_risk, got[1].n_events) == (5, 1)
    assert got[1].survival == pytest.approx(0.8)
    # censoring does not move the curve
    assert (got[2].n_events, got[2].n_censored) == (0, 1)
    assert got[2].survival == pytest.approx(0.8)
    # two deaths out of 3 at risk: 0.8 * (1/3)
    assert (got[3].n_at_risk, got[3].n_events) == (3, 2)
    assert got[3].survival == pytest.approx(0.8 / 3)
    assert got[5].survival == pytest.approx(0.8 / 3)


def test_km_everyone_fails_hits_exact_zero(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 1)], "duration int, event int"
    )
    got = {r.t: r.survival for r in kaplan_meier(df).collect()}
    assert got[1] == pytest.approx(2 / 3)
    assert got[2] == 0.0  # exact zero, not exp(-inf) NaN


def test_km_grouped_curves_independent(spark):
    rows = [("a", 1, 1), ("a", 2, 0), ("b", 1, 0), ("b", 4, 1)]
    df = spark.createDataFrame(rows, "cohort string, duration int, event int")
    got = {
        (r.cohort, r.t): r
        for r in kaplan_meier(df, group_cols=["cohort"]).collect()
    }
    assert got[("a", 1)].n_at_risk == 2
    assert got[("a", 1)].survival == pytest.approx(0.5)
    # cohort b: censor first, then a death with risk set 1 -> S drops to 0
    assert got[("b", 1)].survival == pytest.approx(1.0)
    assert got[("b", 4)].survival == 0.0


def test_activity_spans_censoring_boundary(spark):
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1, 12)
    rows = [
        # user 1: last seen day 2, cutoff day 31 -> gap 29 > 14 -> churned
        (1, t0), (1, t0 + dt.timedelta(days=2)),
        # user 2: last seen day 20 -> gap 11 <= 14 -> censored
        (2, t0 + dt.timedelta(days=10)), (2, t0 + dt.timedelta(days=20)),
        # user 3 defines the cutoff; single-event span 0, censored
        (3, t0 + dt.timedelta(days=31)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r.user_id: r for r in activity_spans(df).collect()}
    assert (got[1].duration, got[1].event) == (2, 1)
    assert (got[2].duration, got[2].event) == (10, 0)
    assert (got[3].duration, got[3].event, got[3].n_events) == (0, 0, 1)


class TestLogrank:
    def test_textbook_example(self, spark):
        """Fully-separated groups, all events: hand-computed O/E/V."""
        from mhm_data_pipelines_spark.operators.survival import (
            logrank_test,
        )

        rows = [("a", t, 1) for t in (1, 2, 3)] + [
            ("b", t, 1) for t in (4, 5, 6)
        ]
        df = spark.createDataFrame(
            rows, "grp string, duration int, event int"
        )
        r = logrank_test(
            df, "a", "b", group_col="grp"
        ).collect()[0]
        assert (r.n_a, r.n_b) == (3, 3)
        assert (r.observed_a, r.observed_b) == (3, 3)
        # E_a = 0.5 + 0.4 + 0.25 + 0 + 0 + 0 = 1.15
        assert r.expected_a == pytest.approx(1.15)
        assert r.expected_b == pytest.approx(4.85)
        assert r.variance == pytest.approx(0.6775)
        assert r.chi2 == pytest.approx((3 - 1.15) ** 2 / 0.6775, abs=1e-6)
        assert 0 < r.p_value < 0.05

    def test_identical_groups_near_zero(self, spark):
        from mhm_data_pipelines_spark.operators.survival import (
            logrank_test,
        )

        rows = [(g, t, e) for g in ("a", "b")
                for t, e in [(1, 1), (2, 0), (3, 1), (5, 1)]]
        df = spark.createDataFrame(
            rows, "grp string, duration int, event int"
        )
        r = logrank_test(df, "a", "b", group_col="grp").collect()[0]
        assert r.chi2 == pytest.approx(0.0, abs=1e-9)
        assert r.p_value == pytest.approx(1.0, abs=1e-6)

    def test_all_censored_null_stat(self, spark):
        from mhm_data_pipelines_spark.operators.survival import (
            logrank_test,
        )

        rows = [("a", 1, 0), ("b", 2, 0)]
        df = spark.createDataFrame(
            rows, "grp string, duration int, event int"
        )
        r = logrank_test(df, "a", "b", group_col="grp").collect()[0]
        assert r.chi2 is None and r.p_value is None
        assert (r.observed_a, r.observed_b) == (0, 0)

    def test_other_groups_ignored(self, spark):
        from mhm_data_pipelines_spark.operators.survival import (
            logrank_test,
        )

        rows = [("a", 1, 1), ("b", 2, 1), ("zz", 99, 1)]
        df = spark.createDataFrame(
            rows, "grp string, duration int, event int"
        )
        r = logrank_test(df, "a", "b", group_col="grp").collect()[0]
        assert (r.n_a, r.n_b) == (1, 1)


class TestNelsonAalen:
    def test_hand_computed_hazard(self, spark):
        from mhm_data_pipelines_spark.operators.survival import (
            nelson_aalen,
        )

        rows = [("a", 1, 1), ("a", 2, 0), ("a", 3, 1)]
        df = spark.createDataFrame(
            rows, "grp string, duration int, event int"
        )
        got = {
            r.t: r
            for r in nelson_aalen(df, group_cols=["grp"]).collect()
        }
        assert got[1].cum_hazard == pytest.approx(1 / 3, abs=1e-6)
        assert got[1].hazard_var == pytest.approx(1 / 9, abs=1e-6)
        assert got[2].cum_hazard == pytest.approx(1 / 3, abs=1e-6)
        assert got[3].cum_hazard == pytest.approx(4 / 3, abs=1e-6)
        assert got[3].hazard_var == pytest.approx(1 / 9 + 1, abs=1e-6)
        import math

        assert got[3].survival_na == pytest.approx(
            math.exp(-4 / 3), abs=1e-6
        )

    def test_groups_independent(self, spark):
        from mhm_data_pipelines_spark.operators.survival import (
            nelson_aalen,
        )

        rows = [("a", 1, 1), ("b", 1, 1), ("b", 2, 1)]
        df = spark.createDataFrame(
            rows, "grp string, duration int, event int"
        )
        got = {
            (r.grp, r.t): r
            for r in nelson_aalen(df, group_cols=["grp"]).collect()
        }
        assert got[("a", 1)].cum_hazard == pytest.approx(1.0)
        assert got[("b", 1)].n_at_risk == 2
        assert got[("b", 2)].cum_hazard == pytest.approx(1.5)
