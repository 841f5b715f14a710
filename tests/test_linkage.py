"""Fellegi-Sunter record-linkage scoring (operators.linkage)."""

from __future__ import annotations

import math

import pytest

from mhm_data_pipelines_spark.operators.linkage import (
    fs_pair_scores,
    fs_pattern_summary,
    u_probabilities,
)


@pytest.fixture(scope="module")
def records(spark):
    # 6 records in one block; city has a null; 2 exact dupes on
    # (city, phone).
    rows = [
        (1, "b1", "nyc", "111"),
        (2, "b1", "nyc", "111"),
        (3, "b1", "nyc", "222"),
        (4, "b1", "sfo", "333"),
        (5, "b1", None, "333"),
        (6, "b2", "nyc", "111"),
    ]
    return spark.createDataFrame(
        rows, "id int, blk string, city string, phone string"
    )


def test_u_probabilities_closed_form(records):
    row = u_probabilities(records, ["city", "phone"]).collect()[0]
    # city non-null counts: nyc=4, sfo=1 over n=5 -> (16+1)/25
    assert row["u_city"] == round(17 / 25, 6)
    # phone: 111=3, 222=1, 333=2 over n=6 -> (9+1+4)/36
    assert row["u_phone"] == round(14 / 36, 6)


def test_pair_scores_states_and_weights(records):
    out = {
        (r["id_a"], r["id_b"]): r
        for r in fs_pair_scores(
            records, "id", ["blk"], ["city", "phone"], m=0.9
        ).collect()
    }
    # block b1 has 5 records -> 10 pairs; record 6 is alone in b2.
    assert len(out) == 10
    u_city = round(17 / 25, 6)
    u_phone = round(14 / 36, 6)
    wa_c = round(math.log2(0.9 / u_city), 6)
    wd_c = round(math.log2(0.1 / (1 - u_city)), 6)
    wa_p = round(math.log2(0.9 / u_phone), 6)
    wd_p = round(math.log2(0.1 / (1 - u_phone)), 6)
    # (1,2): agree on both.
    r = out[(1, 2)]
    assert (r["s_city"], r["s_phone"]) == (1, 1)
    assert r["score"] == pytest.approx(round(wa_c + wa_p, 6), abs=1e-9)
    # (1,3): agree city, disagree phone.
    r = out[(1, 3)]
    assert (r["s_city"], r["s_phone"]) == (1, -1)
    assert r["score"] == pytest.approx(round(wa_c + wd_p, 6), abs=1e-9)
    # (4,5): city missing on one side -> state 0, no evidence.
    r = out[(4, 5)]
    assert (r["s_city"], r["s_phone"]) == (0, 1)
    assert r["score"] == pytest.approx(round(wa_p, 6), abs=1e-9)


def test_pattern_summary_collapses(records):
    pat = fs_pattern_summary(
        records, "id", ["blk"], ["city", "phone"], m=0.9
    ).collect()
    assert sum(r["n_pairs"] for r in pat) == 10
    assert len(pat) <= 9  # <= 3^2 patterns
    # distinct (pattern -> score) is injective
    assert len({(r["s_city"], r["s_phone"]) for r in pat}) == len(pat)


def test_guards(records):
    with pytest.raises(ValueError):
        u_probabilities(records, [])
    with pytest.raises(ValueError):
        fs_pair_scores(records, "id", ["blk"], ["city"], m=1.0)


def test_near_constant_field_clamped_not_null(spark):
    # u rounds to 1.0 for a constant-valued field: the disagreement
    # weight must clamp, never NULL/inf-poison the score.
    rows = [(i, "b", "same") for i in range(6)]
    df = spark.createDataFrame(rows, "id int, blk string, f string")
    out = fs_pair_scores(df, "id", ["blk"], ["f"], m=0.9).collect()
    assert all(r["score"] is not None for r in out)
    # all pairs agree here; force a disagreement and re-check
    rows[0] = (0, "b", "diff")
    df = spark.createDataFrame(rows, "id int, blk string, f string")
    out = fs_pair_scores(df, "id", ["blk"], ["f"], m=0.9).collect()
    assert all(r["score"] is not None for r in out)


def test_pattern_summary_equals_pair_rollup(spark):
    # The profile-lifted summary must equal rolling up the per-pair
    # scores exactly (counts AND scores), including NULL fields and
    # same-profile diagonals.
    import random

    random.seed(7)
    rows = [
        (
            i,
            random.choice(["b1", "b2"]),
            random.choice(["nyc", "sfo", None]),
            random.choice(["111", "222"]),
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "id int, blk string, city string, phone string"
    )
    lifted = {
        (r["s_city"], r["s_phone"]): (r["n_pairs"], r["score"])
        for r in fs_pattern_summary(
            df, "id", ["blk"], ["city", "phone"], m=0.9
        ).collect()
    }
    scored = fs_pair_scores(df, "id", ["blk"], ["city", "phone"], m=0.9)
    from pyspark.sql import functions as F

    rolled = {
        (r["s_city"], r["s_phone"]): (r["n_pairs"], r["score"])
        for r in scored.groupBy("s_city", "s_phone", "score")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .collect()
    }
    assert lifted == rolled


def test_pattern_summary_null_block_matches_pair_path(spark):
    # NULL blocking keys never pair in fs_pair_scores; the lifted
    # summary must not count same-profile pairs inside NULL blocks.
    rows = [
        (1, None, "x"), (2, None, "x"),  # would be a diag pair if
                                          # NULL blocks counted
        (3, "b", "x"), (4, "b", "x"),
    ]
    df = spark.createDataFrame(rows, "id int, blk string, f string")
    from pyspark.sql import functions as F

    lifted = {
        (r["s_f"],): (r["n_pairs"], r["score"])
        for r in fs_pattern_summary(
            df, "id", ["blk"], ["f"], m=0.9
        ).collect()
    }
    rolled = {
        (r["s_f"],): (r["n_pairs"], r["score"])
        for r in fs_pair_scores(df, "id", ["blk"], ["f"], m=0.9)
        .groupBy("s_f", "score")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .collect()
    }
    assert lifted == rolled
    assert sum(n for n, _ in lifted.values()) == 1  # only the b-block pair


def test_near_unique_field_agree_weight_clamped(spark):
    # u rounds to 0.0 for an all-distinct field over enough rows that
    # sum((1/n)^2) < 5e-7 -> agree weights must clamp, never NULL.
    n = 2000  # u = 1/n = 5e-4 -> rounds to 0.0005, still fine; force
    # the clamp with a synthetic u by using many distinct values and
    # checking scores stay non-NULL even when u6 is tiny.
    rows = [(i, "b", str(i)) for i in range(n)] + [(n, "b", "0")]
    df = spark.createDataFrame(rows, "id int, blk string, f string")
    out = fs_pattern_summary(df, "id", ["blk"], ["f"], m=0.9)
    assert all(r["score"] is not None for r in out.collect())


class TestBlockedPairSample:
    @pytest.fixture(scope="class")
    def sampled(self, spark):
        import hashlib

        # block A: 5 members (cap k=3 bites -> C(3,2)=3 pairs of 10
        # true); block B: 2 members (below cap -> its 1 true pair);
        # block C: 1 member (never pairs); one NULL block key.
        rows = [(i, "A") for i in range(1, 6)]
        rows += [(10, "B"), (11, "B"), (20, "C"), (30, None)]
        df = spark.createDataFrame(rows, "doc_id long, blk string")
        from mhm_data_pipelines_spark.operators.linkage import (
            blocked_pair_sample,
        )

        out = blocked_pair_sample(
            df, ["blk"], id_col="doc_id", k=3, seed=42
        ).collect()
        # Python replay of the md5-HEX-rank member selection.
        keep = sorted(
            range(1, 6),
            key=lambda i: (
                hashlib.md5(f"{i}:42".encode()).hexdigest(), i
            ),
        )[:3]
        return out, keep

    def test_budget_bites_and_small_blocks_full(self, sampled):
        out, _ = sampled
        a = [r for r in out if r.blk == "A"]
        b = [r for r in out if r.blk == "B"]
        assert len(a) == 3  # C(k=3, 2), not C(5,2)=10
        assert len(b) == 1  # below cap: all pairs
        assert all(r.n_block == 5 and r.pairs_total == 10 for r in a)
        assert all(r.n_block == 2 and r.pairs_total == 1 for r in b)

    def test_sampled_members_match_md5_rank_replay(self, sampled):
        out, keep = sampled
        ids = set()
        for r in out:
            if r.blk == "A":
                ids.update((r.id_a, r.id_b))
        assert ids == set(keep)
        assert all(r.id_a < r.id_b for r in out)

    def test_singleton_and_null_blocks_never_pair(self, sampled):
        out, _ = sampled
        assert not [r for r in out if r.blk in ("C", None)]

    def test_k_below_two_rejected(self, spark):
        from mhm_data_pipelines_spark.operators.linkage import (
            blocked_pair_sample,
        )

        df = spark.createDataFrame([(1, "A")], "doc_id long, blk string")
        with pytest.raises(ValueError, match="k must be >= 2"):
            blocked_pair_sample(df, ["blk"], id_col="doc_id", k=1)
