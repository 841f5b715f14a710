"""PSI / JS drift over reference-quantile bins (operators.drift)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.drift import (
    EPS,
    psi_by_group,
    psi_report,
)


def test_identical_distributions_zero_psi(spark):
    ref = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("x")
    )
    out = psi_report(ref, ref, "x", n_bins=5).collect()
    assert len(out) == 5
    for r in out:
        assert r["psi_term"] == 0.0 and r["js_term"] == 0.0
        assert r["p_ref"] == r["p_cur"]
    assert out[0]["psi_total"] == 0.0 and out[0]["js_total"] == 0.0


def test_shift_detected_and_terms_match_closed_form(spark):
    # ref: 0..99 uniform; cur: 50..149 — the top bins inflate.
    ref = spark.range(100).select(F.col("id").cast("double").alias("x"))
    cur = spark.range(100).select(
        (F.col("id") + 50).cast("double").alias("x")
    )
    rows = {r["bin"]: r for r in psi_report(ref, cur, "x", 4).collect()}
    assert set(rows) == {0, 1, 2, 3}
    # Quartile edges of 0..99 are 24.75/49.5/74.25 → cur (50..149)
    # has 0 rows in bins 0-1, 25 in bin 2, 75 in bin 3.
    assert [rows[b]["n_cur"] for b in range(4)] == [0, 0, 25, 75]
    assert rows[0]["p_cur"] == 0.0 and rows[3]["p_cur"] == 0.75
    psi_total = rows[0]["psi_total"]
    expect = 0.0
    for b in range(4):
        p = max(EPS, rows[b]["p_ref"])
        q = max(EPS, rows[b]["p_cur"])
        expect += round((q - p) * math.log(q / p), 6)
    assert psi_total == pytest.approx(round(expect, 6), abs=1e-9)
    assert psi_total > 0.25  # classic "investigate" threshold


def test_js_bounded_by_ln2(spark):
    # Disjoint supports: JS divergence tops out at ln 2.
    ref = spark.range(64).select(F.col("id").cast("double").alias("x"))
    cur = spark.range(64).select(
        (F.col("id") + 1000).cast("double").alias("x")
    )
    out = psi_report(ref, cur, "x", 4).collect()
    js = out[0]["js_total"]
    assert 0 < js <= math.log(2) + 1e-6


def test_by_group_against_corpus(spark):
    # group "a" matches the corpus shape, "b" is all-high.
    rows = [("a", float(i % 100)) for i in range(300)] + [
        ("b", 99.0)
    ] * 100
    df = spark.createDataFrame(rows, "g string, x double")
    out = psi_by_group(df, "x", "g", n_bins=4)
    got = {(r["group"], r["bin"]): r for r in out.collect()}
    assert len(got) == 8  # full grid: 2 groups x 4 bins
    totals = {g: got[(g, 0)]["psi_total"] for g in ("a", "b")}
    assert totals["b"] > totals["a"] >= 0.0
    # The corpus' 75th-percentile edge IS 99.0 (100 tied rows), so
    # "b"'s mass sits in bin 2 (strict > excludes the edge) and the
    # top bin exists in the grid with zero mass on BOTH sides.
    assert got[("b", 2)]["p_cur"] == 1.0
    assert got[("b", 0)]["n_cur"] == 0
    assert got[("b", 3)]["n_ref"] == 0 and got[("b", 3)]["n_cur"] == 0
    assert got[("b", 3)]["psi_term"] == 0.0


def test_null_values_dropped(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 2.0), ("a", 3.0), ("a", 4.0)],
        "g string, x double",
    )
    out = psi_by_group(df, "x", "g", n_bins=2).collect()
    assert sum(r["n_cur"] for r in out) == 4


def test_n_bins_guard(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, x double")
    with pytest.raises(ValueError):
        psi_by_group(df, "x", "g", n_bins=1)


# ------------------------------------------------------------- WoE/IV


def test_woe_iv_separating_feature(spark):
    from mhm_data_pipelines_spark.operators.drift import woe_iv

    # feature perfectly separates: positives high, negatives low.
    rows = [(float(i), 0) for i in range(50)] + [
        (float(100 + i), 1) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "x double, y int")
    out = woe_iv(df, "x", "y", n_bins=4).collect()
    assert len(out) == 4
    by_bin = {r["bin"]: r for r in out}
    # bottom bin: all negative; top bin: all positive.
    assert by_bin[0]["n_pos"] == 0 and by_bin[0]["n_neg"] == 25
    assert by_bin[3]["n_pos"] == 25 and by_bin[3]["n_neg"] == 0
    assert by_bin[0]["woe"] < 0 < by_bin[3]["woe"]
    # a perfect separator has a huge IV (>> the 0.5 "suspicious" bar)
    assert by_bin[0]["iv_total"] > 0.5
    # proportions are label-conditional: each bin holds 1/4 of its class
    assert by_bin[0]["p_neg"] == 0.5  # 25 of 50 negatives in bin 0
    assert by_bin[3]["p_pos"] == 0.5


def test_woe_iv_uninformative_feature_near_zero(spark):
    from mhm_data_pipelines_spark.operators.drift import woe_iv

    # alternating labels: every bin is ~50/50 -> IV ~ 0.
    rows = [(float(i), i % 2) for i in range(200)]
    df = spark.createDataFrame(rows, "x double, y int")
    out = woe_iv(df, "x", "y", n_bins=5).collect()
    assert abs(out[0]["iv_total"]) < 0.01


def test_woe_iv_null_rows_dropped(spark):
    from mhm_data_pipelines_spark.operators.drift import woe_iv

    rows = [(1.0, 1), (2.0, 0), (None, 1), (3.0, None), (4.0, 1)]
    df = spark.createDataFrame(rows, "x double, y int")
    out = woe_iv(df, "x", "y", n_bins=2).collect()
    assert sum(r["n_pos"] + r["n_neg"] for r in out) == 3


def test_psi_null_group_dropped(spark):
    # A NULL group must not fabricate a maximal-drift block.
    rows = [("a", float(i % 100)) for i in range(100)] + [
        (None, float(i)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    out = psi_by_group(df, "x", "g", n_bins=4)
    groups = {r["group"] for r in out.collect()}
    assert groups == {"a"}
    # ...but the NULL rows still count as corpus reference mass.
    assert out.collect()[0]["n_ref"] >= 25


def test_woe_iv_single_class_is_null_by_contract(spark):
    from mhm_data_pipelines_spark.operators.drift import woe_iv

    df = spark.createDataFrame(
        [(float(i), 1) for i in range(40)], "x double, y int"
    )
    out = woe_iv(df, "x", "y", n_bins=4).collect()
    for r in out:
        assert r["p_neg"] is None
        assert r["woe"] is None and r["iv_term"] is None
        assert r["iv_total"] is None
