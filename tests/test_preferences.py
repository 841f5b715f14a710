"""Preference-pair construction (RLHF/DPO prep)."""

import pytest

from mhm_data_pipelines_spark.operators.preferences import (
    attach_pair_texts,
    preference_pairs,
)

ROWS = [
    # prompt 1: clear spread, unique scores
    (1, 10, 0.1, "a"),
    (1, 11, 0.9, "b"),
    (1, 12, 0.5, "c"),
    # prompt 2: tied top (ids 21, 22) and tied bottom (ids 20, 23)
    (2, 20, 0.2, "d"),
    (2, 21, 0.8, "e"),
    (2, 22, 0.8, "f"),
    (2, 23, 0.2, "g"),
    # prompt 3: single completion — can never pair
    (3, 30, 0.7, "h"),
    # prompt 4: all same score — zero margin, never a preference
    (4, 40, 0.5, "i"),
    (4, 41, 0.5, "j"),
    # prompt 5: NULL score must not pair
    (5, 50, None, "k"),
    (5, 51, 0.3, "l"),
]


@pytest.fixture(scope="module")
def scored(spark):
    return spark.createDataFrame(
        ROWS, "prompt_id long, completion_id long, score double, text string"
    )


def test_best_worst_pairs(spark, scored):
    got = {
        r.prompt_id: r
        for r in preference_pairs(scored).collect()
    }
    # prompt 1: best 11 (0.9), worst 10 (0.1)
    assert (got[1].chosen_id, got[1].rejected_id) == (11, 10)
    assert got[1].score_margin == pytest.approx(0.8)
    # prompt 2 ties: chosen = larger id of the tied top (22),
    # rejected = smaller id of the tied bottom (20)
    assert (got[2].chosen_id, got[2].rejected_id) == (22, 20)
    # prompts 3 (single), 4 (zero margin), 5 (lone non-null) drop out
    assert set(got) == {1, 2}


def test_margin_floor_is_strict(spark, scored):
    got = preference_pairs(scored, margin=0.8).collect()
    # prompt 1 margin is exactly 0.8 -> strictly-greater floor drops it
    assert got == [] or all(r.score_margin > 0.8 for r in got)
    assert len(got) == 0


def test_all_pairs_and_cap(spark, scored):
    pairs = preference_pairs(scored, mode="all_pairs")
    p1 = sorted(
        (r.chosen_id, r.rejected_id)
        for r in pairs.filter("prompt_id = 1").collect()
    )
    assert p1 == [(11, 10), (11, 12), (12, 10)]
    # prompt 2: each of the two tied tops beats each of the two bottoms
    p2 = sorted(
        (r.chosen_id, r.rejected_id)
        for r in pairs.filter("prompt_id = 2").collect()
    )
    assert p2 == [(21, 20), (21, 23), (22, 20), (22, 23)]
    capped = preference_pairs(
        scored, mode="all_pairs", max_pairs_per_prompt=2
    )
    c1 = sorted(
        (r.chosen_id, r.rejected_id)
        for r in capped.filter("prompt_id = 1").collect()
    )
    # rank: margin desc then ids -> (11,10) m=.8, then (11,12) m=.4
    assert c1 == [(11, 10), (11, 12)]


def test_attach_texts(spark, scored):
    pairs = preference_pairs(scored)
    out = {
        r.prompt_id: r
        for r in attach_pair_texts(pairs, scored).collect()
    }
    assert (out[1].chosen_text, out[1].rejected_text) == ("b", "a")
    assert (out[2].chosen_text, out[2].rejected_text) == ("f", "d")


def test_unknown_mode_rejected(spark, scored):
    with pytest.raises(ValueError, match="unknown mode"):
        preference_pairs(scored, mode="nope")


def test_capped_all_pairs_matches_full_expansion(spark):
    """The hot-prompt candidate pruning (top/bottom-K per prompt before
    the join — r7 fix for the Zipf-skew quadratic blowup) must be
    invisible: capped output == rank-K of the FULL expansion, including
    heavy score ties where only the id tie-breaks order pairs."""
    import itertools
    import random

    rng = random.Random(11)
    rows = []
    for prompt in range(4):
        n = 30
        for cid in range(n):
            # few distinct scores -> massive margin ties
            rows.append((prompt, prompt * 100 + cid,
                         float(rng.choice([1.0, 2.0, 2.0, 3.0]))))
    df = spark.createDataFrame(
        rows, "prompt_id int, completion_id int, score double"
    )
    for k in (1, 3, 5):
        got = sorted(
            (r.prompt_id, r.chosen_id, r.rejected_id)
            for r in preference_pairs(
                df, mode="all_pairs", margin=0.5, max_pairs_per_prompt=k
            ).collect()
        )
        # reference: full expansion ranked in python
        want = []
        by_prompt = {}
        for pr, cid, sc in rows:
            by_prompt.setdefault(pr, []).append((cid, sc))
        for pr, comps in by_prompt.items():
            pairs = [
                (cs - rs, c, r)
                for (c, cs), (r, rs) in itertools.product(comps, comps)
                if cs - rs > 0.5
            ]
            pairs.sort(key=lambda t: (-t[0], t[1], t[2]))
            want += [(pr, c, r) for _, c, r in pairs[:k]]
        assert got == sorted(want), f"k={k}"
