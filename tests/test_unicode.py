"""Unicode canonicalization: NFC composition/idempotence, ASCII fast
path, null handling, cleanup expressions, zero-shuffle plan. All
non-ASCII is spelled as escapes — literal glyphs in source would be
one editor-normalization away from testing nothing."""

from __future__ import annotations

import unicodedata

import pytest

from mhm_data_pipelines_spark.functions.unicode import (
    canonicalize_text,
    nfc,
)

CASES = [
    (1, "plain ascii stays"),
    (2, "café decomposes"),
    (3, "café composed"),
    (4, "naïve and Å ring"),
    (5, None),
    (6, ""),
]


@pytest.fixture(scope="module")
def strings(spark):
    return spark.createDataFrame(CASES, "id long, s string")


def test_nfc_matches_unicodedata(spark, strings):
    got = {
        r.id: r.n
        for r in strings.select("id", nfc("s").alias("n")).collect()
    }
    for i, s in CASES:
        want = None if s is None else unicodedata.normalize("NFC", s)
        assert got[i] == want
    # the composed forms really did compose
    assert got[2].split()[0] == "café"
    assert got[4].split()[0] == "naïve"


def test_nfc_unifies_composed_and_decomposed(spark, strings):
    got = {
        r.id: r.n
        for r in strings.select("id", nfc("s").alias("n")).collect()
    }
    assert got[2].split()[0] == got[3].split()[0]
    # idempotence
    twice = strings.select("id", nfc(nfc("s")).alias("n")).collect()
    assert {r.id: r.n for r in twice} == got


def test_canonicalize_cleanup(spark):
    df = spark.createDataFrame(
        [(1, "  Mixed\tCasé\n\ntext   here ")],
        "id long, s string",
    )
    out = (
        df.select(canonicalize_text("s", lowercase=True).alias("c"))
        .collect()[0]
        .c
    )
    assert out == "mixed casé text here"


def test_canonicalize_plan_is_shuffle_free(spark, strings):
    plan = (
        strings.select(canonicalize_text("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
