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


class TestItemCosineNeighbors:
    def test_hand_computed_cosines(self, spark):
        from mhm_data_pipelines_spark.operators.baskets import (
            item_cosine_neighbors,
        )

        rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"),
                (3, "z")]
        df = spark.createDataFrame(rows, "b long, it string")
        out = item_cosine_neighbors(
            df, "b", "it", k=10, min_pair_count=1
        ).collect()
        got = {(r.item, r.neighbor): r for r in out}
        assert got[("x", "y")].cosine == pytest.approx(
            2 / 6**0.5, abs=1e-6
        )
        assert got[("x", "y")].rank == 1
        assert got[("x", "z")].rank == 2
        assert got[("y", "x")].rank == 1
        assert got[("z", "x")].cosine == pytest.approx(
            1 / 3**0.5, abs=1e-6
        )

    def test_k_truncates(self, spark):
        from mhm_data_pipelines_spark.operators.baskets import (
            item_cosine_neighbors,
        )

        rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"),
                (3, "z")]
        df = spark.createDataFrame(rows, "b long, it string")
        out = item_cosine_neighbors(
            df, "b", "it", k=1, min_pair_count=1
        ).collect()
        per_item = {}
        for r in out:
            per_item.setdefault(r.item, []).append(r)
        assert all(len(v) == 1 for v in per_item.values())
        assert per_item["x"][0].neighbor == "y"


def test_array_pair_stream_matches_bruteforce(spark):
    """r9 optimization: pairs now come from a per-basket sorted array
    explode instead of a self-equi-join — the pair MULTISET must match
    the brute-force join, including duplicate (b, it) collapse and the
    exact cap boundary (a basket of exactly max_basket_size survives,
    one more is dropped)."""
    from mhm_data_pipelines_spark.operators.baskets import (
        item_pair_counts,
    )

    rows = (
        [("b1", i) for i in (3, 1, 2, 2)]        # dup (b1, 2) collapses
        + [("b2", i) for i in (1, 2, 3, 4)]      # == cap -> kept
        + [("b3", i) for i in (1, 2, 3, 4, 5)]   # cap+1 -> dropped
        + [("b4", 9)]                            # singleton -> no pairs
    )
    df = spark.createDataFrame(rows, "b string, it long")
    got = {
        (r.item_a, r.item_b): r.n_pair
        for r in item_pair_counts(df, "b", "it", max_basket_size=4).collect()
    }
    import itertools

    want: dict = {}
    baskets = {"b1": {1, 2, 3}, "b2": {1, 2, 3, 4}}
    for its in baskets.values():
        for x, y in itertools.combinations(sorted(its), 2):
            want[(x, y)] = want.get((x, y), 0) + 1
    assert got == want


def test_prefilter_oversized_matches_and_drops_before_collect(spark):
    """r10 scale guard: prefilter_oversized=True drops oversized
    baskets with a count pre-filter BEFORE collect_list (no aggregation
    buffer ever materializes the defect basket) and must produce the
    IDENTICAL pair multiset as the default post-collect filter,
    including the exact cap boundary. The pathological basket here is
    big enough that correctness of the drop (not luck) decides the
    assert."""
    from pyspark.sql import functions as F

    from mhm_data_pipelines_spark.operators.baskets import (
        item_pair_counts,
    )

    big = [("huge", i) for i in range(5000)]  # way over the cap
    rows = (
        [("b1", i) for i in (3, 1, 2)]
        + [("b2", i) for i in (1, 2, 3, 4)]  # == cap -> kept
        + big
    )
    df = spark.createDataFrame(rows, "b string, it long")
    base = {
        (r.item_a, r.item_b): r.n_pair
        for r in item_pair_counts(
            df, "b", "it", max_basket_size=4
        ).collect()
    }
    pre = {
        (r.item_a, r.item_b): r.n_pair
        for r in item_pair_counts(
            df, "b", "it", max_basket_size=4, prefilter_oversized=True
        ).collect()
    }
    assert pre == base
    assert ("huge", 0) not in {k[0] for k in pre}  # defect basket gone
    # The guard really is pre-collect: the plan carries a LeftSemi join
    # below the collect aggregate.
    plan = item_pair_counts(
        df, "b", "it", max_basket_size=4, prefilter_oversized=True
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan
