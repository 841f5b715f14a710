"""Pairwise Cohen's kappa — hand-computed confusion matrices."""

import pytest

from mhm_data_pipelines_spark.operators.agreement import pairwise_kappa


def _run(spark, rows):
    df = spark.createDataFrame(rows, "item_id long, rater string, label int")
    out = pairwise_kappa(df).orderBy("rater_a", "rater_b").collect()
    return {(r["rater_a"], r["rater_b"]): r for r in out}


def test_textbook_two_rater(spark):
    # Classic 2x2: n=100, both-yes 40, both-no 30, a-yes/b-no 20,
    # a-no/b-yes 10. po=0.70; pa_yes=0.6, pb_yes=0.5 ->
    # pe = 0.6*0.5 + 0.4*0.5 = 0.5; kappa = 0.4.
    rows = []
    i = 0
    for (la, lb), n in [((1, 1), 40), ((0, 0), 30), ((1, 0), 20), ((0, 1), 10)]:
        for _ in range(n):
            rows += [(i, "a", la), (i, "b", lb)]
            i += 1
    got = _run(spark, rows)[("a", "b")]
    assert got["n_items"] == 100
    assert got["po"] == pytest.approx(0.70)
    assert got["pe"] == pytest.approx(0.50)
    assert got["kappa"] == pytest.approx(0.40)


def test_perfect_and_opposite(spark):
    # Perfect agreement with label variety -> kappa 1; systematic
    # disagreement -> negative kappa.
    rows = []
    for i, l in enumerate([0, 1, 0, 1]):
        rows += [(i, "a", l), (i, "b", l), (i, "c", 1 - l)]
    got = _run(spark, rows)
    assert got[("a", "b")]["kappa"] == 1.0
    assert got[("a", "c")]["kappa"] == -1.0


def test_constant_raters_null_kappa(spark):
    # Both raters always say 1 -> pe = 1 -> kappa undefined (NULL).
    rows = []
    for i in range(5):
        rows += [(i, "a", 1), (i, "b", 1)]
    got = _run(spark, rows)[("a", "b")]
    assert got["po"] == 1.0 and got["pe"] == 1.0
    assert got["kappa"] is None


def test_partial_overlap_and_null_labels(spark):
    # kappa computed over the JOINTLY rated items only; NULL labels
    # are abstentions.
    rows = [
        (1, "a", 1), (1, "b", 1),
        (2, "a", 0), (2, "b", 1),
        (3, "a", 1),               # b never rated item 3
        (4, "a", 0), (4, "b", None),
    ]
    got = _run(spark, rows)[("a", "b")]
    assert got["n_items"] == 2


def test_three_raters_emit_three_pairs(spark):
    rows = []
    for i in range(10):
        rows += [(i, "a", i % 2), (i, "b", (i + 1) % 2), (i, "c", 0)]
    got = _run(spark, rows)
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
