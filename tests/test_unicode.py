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


def test_script_profile_counts(spark):
    from mhm_data_pipelines_spark.functions.unicode import script_profile
    from pyspark.sql import functions as F

    rows = [
        (1, "Hello мир 123"),          # 5 latin, 3 cyrillic, 3 digit, 2 ws
        (2, "你好 world"),              # 2 cjk, 5 latin, 1 ws
        (3, "1234 !!"),                # digits + other -> dominant other
        (4, ""),                       # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.s.asDict()
        for r in df.select("doc_id", script_profile("text").alias("s")).collect()
    }
    assert got[1] == {
        "n_chars": 13, "n_latin": 5, "n_cyrillic": 3, "n_cjk": 0,
        "n_digit": 3, "n_space": 2, "n_other": 0, "dominant": "latin",
    }
    assert (got[2]["n_cjk"], got[2]["n_latin"], got[2]["dominant"]) == (2, 5, "latin")
    assert got[3]["dominant"] == "other"
    assert got[3]["n_other"] == 2
    assert got[4] == {
        "n_chars": 0, "n_latin": 0, "n_cyrillic": 0, "n_cjk": 0,
        "n_digit": 0, "n_space": 0, "n_other": 0, "dominant": "other",
    }


def test_script_profile_dominance_tiebreak(spark):
    from mhm_data_pipelines_spark.functions.unicode import script_profile

    rows = [(1, "aб"), (2, "б一"), (3, "一a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.s.dominant
        for r in df.select("doc_id", script_profile("text").alias("s")).collect()
    }
    # ties break latin > cyrillic > cjk
    assert got == {1: "latin", 2: "cyrillic", 3: "latin"}
