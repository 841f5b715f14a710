"""Market-basket pair counts and association rules — hand-computed."""

import pytest

from mhm_data_pipelines_spark.operators.baskets import (
    association_rules,
    item_pair_counts,
)

ROWS = [
    (1, "bread"), (1, "butter"), (1, "milk"),
    (2, "bread"), (2, "butter"),
    (3, "bread"), (3, "milk"),
    (4, "beer"),
    (2, "bread"),         # duplicate row: presence, not weight
]


def test_pair_counts_hand(spark):
    df = spark.createDataFrame(ROWS, "b long, it string")
    got = {(r["item_a"], r["item_b"]): r["n_pair"]
           for r in item_pair_counts(df, "b", "it").collect()}
    assert got == {
        ("bread", "butter"): 2,
        ("bread", "milk"): 2,
        ("butter", "milk"): 1,
    }


def test_basket_cap_drops_defects(spark):
    rows = [(1, f"i{k}") for k in range(10)] + [(2, "i0"), (2, "i1")]
    df = spark.createDataFrame(rows, "b long, it string")
    got = item_pair_counts(df, "b", "it", max_basket_size=5).collect()
    assert {(r["item_a"], r["item_b"]) for r in got} == {("i0", "i1")}


def test_rules_hand_computed(spark):
    df = spark.createDataFrame(ROWS, "b long, it string")
    got = {(r["item_a"], r["item_b"]): r
           for r in association_rules(df, "b", "it", min_pair_count=2).collect()}
    assert set(got) == {("bread", "butter"), ("bread", "milk")}
    r = got[("bread", "butter")]
    # N=4 baskets; bread in 3, butter in 2, pair in 2.
    assert (r["n_a"], r["n_b"], r["n_pair"]) == (3, 2, 2)
    assert r["support"] == 0.5
    assert r["lift"] == pytest.approx(round(4 * 2 / (3 * 2), 6))


def test_rules_min_count_prunes(spark):
    df = spark.createDataFrame(ROWS, "b long, it string")
    got = association_rules(df, "b", "it", min_pair_count=3).collect()
    assert got == []
