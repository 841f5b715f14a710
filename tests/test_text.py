"""Text-analysis functions: tokenization, quality features, language ID,
fingerprints; multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.functions.text import (
    char_ngrams,
    fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_ngrams,
)


def _one(spark, text, expr):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(expr.alias("v"))
        .first()
        .v
    )


def test_tokens_collapse_whitespace(spark):
    assert _one(spark, "  a  b\tc ", tokens("text")) == ["a", "b", "c"]
    assert _one(spark, "", token_count("text")) == 0


def test_stopword_and_punct_ratio(spark):
    assert _one(spark, "the cat", stopword_ratio("text")) == pytest.approx(0.5)
    assert _one(spark, "a,b.c!", punct_ratio("text")) == pytest.approx(0.5)
    assert _one(spark, "", punct_ratio("text")) == 0.0


def test_quality_score_bands(spark):
    good = "the quick brown fox jumps over a lazy dog near the old river bank"
    assert _one(spark, good, quality_score("text")) == pytest.approx(1.0)
    assert _one(spark, "short", quality_score("text")) == pytest.approx(0.2)


def test_char_and_word_ngrams(spark):
    assert _one(spark, "abcd", char_ngrams("text", 3)) == ["abc", "bcd"]
    assert _one(spark, "a b c d", word_ngrams("text", 3)) == ["a b c", "b c d"]
    assert _one(spark, "ab", char_ngrams("text", 3)) == []


def test_fingerprint_normalization(spark):
    a = _one(spark, "The  Quick fox", fingerprint("text"))
    b = _one(spark, "the quick FOX", fingerprint("text"))
    c = _one(spark, "the quick dog", fingerprint("text"))
    assert a == b != c


def test_lang_id_markers(spark):
    cases = {
        "the cat is on the mat and happy": "en",
        "el gato y la casa que vemos": "es",
        "le chat est sur la table et les chaises": "fr",
        "der Hund und die Katze das ist gut": "de",
        "这是一个中文句子": "zh",
    }
    for text, want in cases.items():
        assert _one(spark, text, lang_id("text")) == want


def test_multimodal_feature_extraction(spark):
    from mhm_data_pipelines_spark.operators.multimodal import (
        extract_features,
        fake_feature_extractor,
        frame_sample_plan,
    )

    rows = [
        (1, "image/png", bytes([0, 1, 2, 3, 4, 5, 6, 7] * 4), 8, 8, None),
        (2, "audio/wav", b"", None, None, 2500),
        (3, "video/mp4", bytes(range(32)), 64, 64, 3000),
    ]
    assets = spark.createDataFrame(
        rows,
        "asset_id long, mime_type string, payload binary, "
        "width long, height long, duration_ms long",
    )
    feats = {r.asset_id: r for r in extract_features(assets).collect()}
    assert feats[1].n_bytes == 32
    assert feats[1].feature == pytest.approx(fake_feature_extractor(rows[0][2]))
    assert feats[2].feature == [0.0] * 8  # empty payload → zero vector
    frames = frame_sample_plan(assets, every_ms=1000).collect()
    got = {(r.asset_id, r.frame_ts_ms) for r in frames}
    assert got == {(2, 0), (2, 1000), (2, 2000), (3, 0), (3, 1000), (3, 2000), (3, 3000)}


def test_multimodal_decode_stub_raises():
    from mhm_data_pipelines_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_tfidf_top_terms(spark):
    from mhm_data_pipelines_spark.functions.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.rank): (r.term, r.tf) for r in
           tfidf_top_terms(docs, k=2).collect()}
    # doc 1: apple appears twice and only in doc 1 -> top term
    assert got[(1, 1)] == ("apple", 2)
    # doc 3: durian unique to doc 3 beats cherry (df=2) at tf=3?
    # tfidf(cherry)=3*ln(3/2)=1.216 > tfidf(durian)=1*ln(3)=1.099
    assert got[(3, 1)] == ("cherry", 3)
    assert got[(3, 2)] == ("durian", 1)

    # min_df prunes the vocabulary tail: df(durian)=1 < 2 drops it.
    pruned = {(r.doc_id, r.rank): r.term for r in
              tfidf_top_terms(docs, k=2, min_df=2).collect()}
    assert "durian" not in set(pruned.values())
    assert pruned[(3, 1)] == "cherry"

    # Scale guard: the unbounded docfreq aggregate must NOT carry a
    # broadcast hint (AQE decides from runtime size); the single-row
    # n_docs scalar is the only hinted broadcast in the plan.
    analyzed = (
        tfidf_top_terms(docs, k=2)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert analyzed.count("ResolvedHint") == 1
    assert "n_docs" in analyzed.split("ResolvedHint", 1)[1][:300]
