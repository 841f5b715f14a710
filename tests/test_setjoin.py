"""Exact set-similarity joins (operators/setjoin.py): the prefix filter
must be LOSSLESS (equal to brute force), the length filter must prune
only impossible pairs, thresholds compare in exact integer arithmetic,
and empty token sets never pair."""

from __future__ import annotations

from itertools import combinations, permutations

import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.setjoin import (
    containment_pairs,
    prefix_jaccard_pairs,
)

SETS = {
    1: ["a", "b", "c", "d", "e"],
    2: ["a", "b", "c", "d", "f"],  # J(1,2) = 4/6 = 0.667
    3: ["a", "b", "c", "d", "e"],  # J(1,3) = 1.0
    4: ["a", "b", "c", "d"],       # J(1,4) = 4/5 = 0.8 (boundary)
    5: ["x", "y"],
    6: ["x", "y", "z"],            # J(5,6) = 2/3; C(5→6) = 1.0
    7: [],                          # empty: never pairs
    8: ["a", "b", "c", "d", "e", "q", "r", "s", "t", "u"],  # C(1→8)=1.0
}


def brute_jaccard(threshold_pct: int):
    out = set()
    for i, j in combinations(sorted(SETS), 2):
        a, b = set(SETS[i]), set(SETS[j])
        if not a or not b:
            continue
        inter, union = len(a & b), len(a | b)
        if 100 * inter >= threshold_pct * union:
            out.add((i, j))
    return out


def brute_containment(threshold_pct: int):
    out = set()
    for i, j in permutations(sorted(SETS), 2):
        a, b = set(SETS[i]), set(SETS[j])
        if not a:
            continue
        if 100 * len(a & b) >= threshold_pct * len(a):
            out.add((i, j))
    return out


@pytest.fixture(scope="module")
def sets_df(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in SETS.items()],
        "doc_id long, toks array<string>",
    )


@pytest.mark.parametrize("t", [60, 80, 100])
def test_prefix_jaccard_equals_brute_force(sets_df, t):
    got = {
        (r.id_a, r.id_b)
        for r in prefix_jaccard_pairs(sets_df, threshold_pct=t).collect()
    }
    assert got == brute_jaccard(t)


def test_prefix_jaccard_boundary_is_exact_integer(sets_df):
    # J(1,4) = 4/5 = exactly 0.8 — must be INCLUDED at 80.
    rows = {
        (r.id_a, r.id_b): r
        for r in prefix_jaccard_pairs(sets_df, threshold_pct=80).collect()
    }
    assert (1, 4) in rows
    r = rows[(1, 4)]
    assert (r.inter_len, r.union_len, r.jaccard) == (4, 5, 0.8)
    # ...and EXCLUDED at 81 (4/5 < 0.81): no float fuzz at the boundary.
    got81 = {
        (x.id_a, x.id_b)
        for x in prefix_jaccard_pairs(sets_df, threshold_pct=81).collect()
    }
    assert (1, 4) not in got81


@pytest.mark.parametrize("t", [50, 90, 100])
def test_containment_equals_brute_force(sets_df, t):
    got = {
        (r.id_a, r.id_b)
        for r in containment_pairs(sets_df, threshold_pct=t).collect()
    }
    assert got == brute_containment(t)


def test_containment_is_directed(sets_df):
    got = {
        (r.id_a, r.id_b)
        for r in containment_pairs(sets_df, threshold_pct=100).collect()
    }
    # 5 ⊂ 6 but 6 ⊄ 5; 1 ⊂ 8 (quote-in-page) but not the reverse.
    assert (5, 6) in got and (6, 5) not in got
    assert (1, 8) in got and (8, 1) not in got


def test_empty_sets_never_pair(sets_df):
    for fn in (prefix_jaccard_pairs, containment_pairs):
        ids = {
            x
            for r in fn(sets_df, threshold_pct=50).collect()
            for x in (r.id_a, r.id_b)
        }
        assert 7 not in ids


def test_duplicate_tokens_treated_as_sets(spark):
    df = spark.createDataFrame(
        [(1, ["a", "a", "b"]), (2, ["a", "b", "b", "b"])],
        "doc_id long, toks array<string>",
    )
    rows = prefix_jaccard_pairs(df, threshold_pct=100).collect()
    assert len(rows) == 1 and rows[0].jaccard == 1.0
    crows = containment_pairs(df, threshold_pct=100).collect()
    assert {(r.id_a, r.id_b) for r in crows} == {(1, 2), (2, 1)}


def test_prefix_join_avoids_common_token_blowup(spark):
    """The candidate join must key on PREFIX tokens (rarest-first), so
    a token shared by every doc ('the') contributes candidates only
    when it lands in a prefix — here every doc shares 'the' but no
    pair reaches the threshold, and the distinct candidate set stays
    bounded by rare-token co-occurrence."""
    df = spark.createDataFrame(
        [(i, ["the", f"u{i}", f"v{i}", f"w{i}", f"x{i}"]) for i in range(20)],
        "doc_id long, toks array<string>",
    )
    assert prefix_jaccard_pairs(df, threshold_pct=80).count() == 0


# ------------------------------------------------------- sorted neighborhood
import pytest

from mhm_data_pipelines_spark.operators.setjoin import (
    sorted_neighborhood_pairs,
)


def _snp(spark, rows, window):
    df = spark.createDataFrame(rows, "rid long, key string")
    out = sorted_neighborhood_pairs(
        df, "rid", order_by=["key", "rid"], window=window
    )
    return {(r["id_a"], r["id_b"]): (r["rank_a"], r["rank_b"])
            for r in out.collect()}


def test_snp_window3_exact_pairs(spark):
    # Sort by key: d(1) a(2)... keys chosen so rank order is knowable.
    rows = [(10, "a"), (20, "b"), (30, "c"), (40, "d"), (50, "e")]
    got = _snp(spark, rows, window=3)
    # ranks: a=1..e=5; pairs with 0 < dist < 3
    want = {(10, 20), (10, 30), (20, 30), (20, 40), (30, 40),
            (30, 50), (40, 50)}
    assert set(got) == want
    assert got[(10, 30)] == (1, 3)


def test_snp_pair_count_bound_and_window2(spark):
    rows = [(i, f"k{i:03d}") for i in range(20)]
    got = _snp(spark, rows, window=2)
    # window=2 -> adjacent pairs only: exactly n-1
    assert len(got) == 19
    assert all(rb - ra == 1 for ra, rb in got.values())


def test_snp_tie_broken_by_id(spark):
    # identical keys -> rank order falls back to rid (total order)
    rows = [(3, "x"), (1, "x"), (2, "x")]
    got = _snp(spark, rows, window=2)
    assert set(got) == {(1, 2), (2, 3)}


def test_snp_rejects_degenerate_window(spark):
    df = spark.createDataFrame([(1, "a")], "rid long, key string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "rid", ["key", "rid"], window=1)
