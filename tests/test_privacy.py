"""k-anonymity / l-diversity reporting and seeded ε-DP noisy counts
(operators.privacy)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.privacy import (
    dp_noisy_counts,
    k_anonymity_classes,
    k_anonymity_report,
    laplace_noise,
)


@pytest.fixture(scope="module")
def people(spark):
    # (zip, age) quasi-identifiers; disease sensitive.
    rows = [
        # class A: 3 rows, 2 distinct sensitive values
        ("02139", 30, "flu"),
        ("02139", 30, "flu"),
        ("02139", 30, "cold"),
        # class B: 1 row (the re-identifiable singleton)
        ("94110", 41, "flu"),
        # class C: 5 rows, all the same sensitive value (l=1)
        *[("10001", 55, "cold")] * 5,
        # class with a NULL quasi value — kept as its own class
        (None, 30, "flu"),
        (None, 30, "asthma"),
    ]
    return spark.createDataFrame(rows, "zip string, age int, disease string")


def test_class_table(people):
    cls = {
        (r["zip"], r["age"]): (r["n"], r["n_sensitive"])
        for r in k_anonymity_classes(
            people, ["zip", "age"], "disease"
        ).collect()
    }
    assert cls == {
        ("02139", 30): (3, 2),
        ("94110", 41): (1, 1),
        ("10001", 55): (5, 1),
        (None, 30): (2, 2),
    }


def test_report_values(people):
    rep = k_anonymity_report(
        people, ["zip", "age"], "disease", k=3, l=2
    ).collect()[0]
    assert rep["n_rows"] == 11
    assert rep["n_classes"] == 4
    assert rep["k_anonymity"] == 1  # the singleton
    # classes below k=3: the singleton (1 row) + the NULL class (2)
    assert rep["rows_below_k"] == 3
    assert rep["classes_below_k"] == 2
    assert rep["pct_below_k"] == round(3 / 11, 6)
    assert rep["l_diversity"] == 1  # class C is homogeneous
    assert rep["classes_below_l"] == 2  # C and the singleton


def test_report_without_sensitive(people):
    rep = k_anonymity_report(people, ["zip"], k=2)
    cols = rep.columns
    assert "l_diversity" not in cols and "classes_below_l" not in cols
    assert rep.collect()[0]["n_classes"] == 4  # 3 zips + the NULL zip


def test_report_requires_quasi_cols(people):
    with pytest.raises(ValueError):
        k_anonymity_report(people, [])


def test_laplace_noise_deterministic_and_centered(spark):
    df = spark.range(4000).select(
        F.col("id").cast("string").alias("key")
    )
    drawn = df.select(
        laplace_noise(F.col("key"), scale=2.0, seed=7).alias("x")
    )
    a = [r["x"] for r in drawn.collect()]
    b = [r["x"] for r in drawn.collect()]
    assert a == b  # same seed, same draws
    mean = sum(a) / len(a)
    # Laplace(0, 2) has sd 2*sqrt(2); the mean of 4000 draws is
    # within ~4 standard errors of 0.
    assert abs(mean) < 4 * (2.0 * math.sqrt(2)) / math.sqrt(len(a))
    # Median |x| of Laplace(0,b) is b*ln2 — sanity band.
    med = sorted(abs(x) for x in a)[len(a) // 2]
    assert 0.5 * 2.0 * math.log(2) < med < 2.0 * 2.0 * math.log(2)


def test_dp_counts_noise_matches_closed_form(spark):
    df = spark.createDataFrame(
        [("a",)] * 10 + [("b",)] * 3, "g string"
    )
    out = {
        r["g"]: (r["n"], r["noisy_n"])
        for r in dp_noisy_counts(
            df, ["g"], epsilon=0.5, seed=42, include_true=True
        ).collect()
    }
    assert out["a"][0] == 10 and out["b"][0] == 3
    # Recompute the draw exactly (md5("<g>:42") first 15 hex chars).
    import hashlib

    for g, (n, noisy) in out.items():
        u = int(hashlib.md5(f"{g}:42".encode()).hexdigest()[:15], 16) / float(
            16**15
        )
        t = u - 0.5
        x = -2.0 * math.copysign(1.0, t) * math.log(
            max(1e-18, 1.0 - 2.0 * abs(t))
        ) if t != 0 else 0.0
        assert noisy == pytest.approx(round(n + x, 6), abs=1e-9)


def test_dp_counts_null_group_sentinel(spark):
    df = spark.createDataFrame(
        [("x",), (None,), (None,)], "g string"
    )
    out = dp_noisy_counts(df, ["g"], epsilon=1.0, seed=1)
    rows = out.collect()
    assert len(rows) == 2  # NULL group kept, own draw
    assert out.columns == ["g", "noisy_n"]  # true count withheld


def test_dp_counts_guards(spark):
    df = spark.createDataFrame([("x",)], "g string")
    with pytest.raises(ValueError):
        dp_noisy_counts(df, [], epsilon=1.0)
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], epsilon=0.0)


class TestTCloseness:
    def test_hand_computed_emd(self, spark):
        from mhm_data_pipelines_spark.operators.privacy import (
            t_closeness_report,
        )

        rows = [("A", 0), ("A", 0), ("A", 1), ("B", 1)]
        df = spark.createDataFrame(rows, "qi string, b int")
        out = {
            r.qi: r
            for r in t_closeness_report(
                df, ["qi"], "b", n_buckets=2, t=0.2
            ).collect()
        }
        # global q = (1/2, 1/2); A p = (2/3, 1/3) -> EMD 1/6
        assert out["A"].emd == pytest.approx(1 / 6, abs=1e-6)
        assert out["A"].meets_t is True
        # B p = (0, 1) -> EMD 1/2
        assert out["B"].emd == pytest.approx(0.5, abs=1e-6)
        assert out["B"].meets_t is False
        assert (out["A"].n, out["B"].n) == (3, 1)

    def test_identical_class_zero_emd_and_range_filter(self, spark):
        from mhm_data_pipelines_spark.operators.privacy import (
            t_closeness_report,
        )

        rows = [("A", 0), ("A", 2), ("B", 0), ("B", 2),
                ("B", 99), ("B", None)]
        df = spark.createDataFrame(rows, "qi string, b int")
        out = {
            r.qi: r
            for r in t_closeness_report(
                df, ["qi"], "b", n_buckets=3, t=0.1
            ).collect()
        }
        # out-of-range 99 and NULL excluded: both classes match global
        assert out["A"].emd == pytest.approx(0.0, abs=1e-9)
        assert out["B"].emd == pytest.approx(0.0, abs=1e-9)
        assert out["B"].n == 2

    def test_guards(self, spark):
        from mhm_data_pipelines_spark.operators.privacy import (
            t_closeness_report,
        )

        df = spark.createDataFrame([("g", 0)], "qi string, b int")
        with pytest.raises(ValueError, match="quasi_cols"):
            t_closeness_report(df, [], "b", 2)
        with pytest.raises(ValueError, match="n_buckets"):
            t_closeness_report(df, ["qi"], "b", 1)
        with pytest.raises(ValueError, match="t must be"):
            t_closeness_report(df, ["qi"], "b", 2, t=0.0)


class TestTClosenessNullClass:
    def test_null_quasi_class_gets_real_emd(self, spark):
        """A class keyed by a NULL QI value must match its own bucket
        counts (null-safe join), not report an empty distribution."""
        from mhm_data_pipelines_spark.operators.privacy import (
            t_closeness_report,
        )

        rows = [(None, 0), (None, 0), (None, 1), ("B", 1)]
        df = spark.createDataFrame(rows, "qi string, b int")
        out = {
            r.qi: r
            for r in t_closeness_report(
                df, ["qi"], "b", n_buckets=2, t=0.2
            ).collect()
        }
        # identical numbers to the non-null hand-computed case:
        # global q=(1/2,1/2); NULL class p=(2/3,1/3) -> EMD 1/6
        assert out[None].emd == pytest.approx(1 / 6, abs=1e-6)
        assert out[None].n == 3
        assert out["B"].emd == pytest.approx(0.5, abs=1e-6)
