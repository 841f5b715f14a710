"""Edit-distance join: brute-force equivalence (the FastSS deletion-
neighborhood blocking must be EXACT), k=2, and the hot-bucket cap."""

from __future__ import annotations

import random

import pytest

from mhm_data_pipelines_spark.operators.fuzzy import (
    deletion_variants,
    edit_distance_join,
)

from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def _brute(rows, k):
    out = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1:]:
            d = _lev(ta, tb)
            if d <= k:
                lo, hi = min(ia, ib), max(ia, ib)
                out.add((lo, hi, d))
    return out


def _corpus(n=60, seed=7):
    rng = random.Random(seed)
    words = []
    for i in range(n // 2):
        words.append((i, f"item-{rng.randrange(100):03d}-x"))
    # Mutated near-copies: substitution, deletion, insertion.
    for i in range(n // 2, n):
        base = words[i - n // 2][1]
        op = rng.choice(("sub", "del", "ins", "same"))
        p = rng.randrange(len(base))
        if op == "sub":
            t = base[:p] + chr(97 + rng.randrange(26)) + base[p + 1:]
        elif op == "del":
            t = base[:p] + base[p + 1:]
        elif op == "ins":
            t = base[:p] + chr(97 + rng.randrange(26)) + base[p:]
        else:
            t = base
        words.append((i, t))
    return words


@pytest.mark.parametrize("k", [1, 2])
def test_matches_brute_force(spark, k):
    rows = _corpus()
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "name", "id", k=k).collect()
    }
    assert got == _brute(rows, k)


def test_identical_strings_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abc"), (3, "abd")], ["id", "name"]
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "name", "id", k=1).collect()
    }
    assert got == {(1, 2, 0), (1, 3, 1), (2, 3, 1)}


def test_hot_bucket_cap_star_edges(spark):
    # 30 identical strings: uncapped -> 435 pairs; capped at 5 -> the
    # bucket short-circuits to star edges against the min id (plus any
    # cold-bucket survivors), every one still exact-distance-filtered.
    rows = [(i, "same-text") for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = edit_distance_join(
        df, "name", "id", k=1, max_bucket_size=5
    ).collect()
    assert all(r["dist"] == 0 for r in out)
    assert all(r["id_a"] < r["id_b"] for r in out)
    # Star edges from the rep (id 0) must cover every other node so
    # connected components can recover the full cluster.
    touched = {r["id_a"] for r in out} | {r["id_b"] for r in out}
    assert touched == set(range(30))
    assert len(out) < 435


def test_empty_and_short_strings(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "b"), (4, "ab")], ["id", "name"]
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "name", "id", k=1).collect()
    }
    rows = [(1, ""), (2, "a"), (3, "b"), (4, "ab")]
    assert got == _brute(rows, 1)


def test_deletion_variants_counts(spark):
    df = spark.createDataFrame([("abc",)], ["s"])
    (row,) = df.select(
        deletion_variants(F.col("s"), 1).alias("v1"),
        deletion_variants(F.col("s"), 2).alias("v2"),
    ).collect()
    assert sorted(row["v1"]) == sorted(["abc", "bc", "ac", "ab"])
    assert set(row["v2"]) == {
        "abc", "bc", "ac", "ab", "a", "b", "c"
    }
