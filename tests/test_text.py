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
        decode_image(b"\x89PNG")  # compressed format, no pillow installed


def test_ppm_decode_roundtrip_and_resize():
    import numpy as np

    from mhm_data_pipelines_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(img)) == img).all()
    # comments + extra whitespace in the header parse too
    hdr = b"P6\n# a comment\n 9 12\n255\n" + img.tobytes()
    assert (decode_image(hdr) == img).all()
    small = resize_nearest(img, 4, 3)
    assert small.shape == (4, 3, 3)
    assert (small == img[[0, 3, 6, 9]][:, [0, 3, 6]]).all()
    up = resize_nearest(img, 24, 18)
    assert up.shape == (24, 18, 3)


def test_real_image_features_through_spark(spark):
    """The decode path run END-TO-END through mapInPandas: PPM payloads
    decoded to pixels, per-channel stats + luminance grid verified
    against a local numpy computation; an undecodable payload yields the
    zero vector instead of failing the batch."""
    import numpy as np

    from mhm_data_pipelines_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
        extract_features,
        image_feature_extractor,
        resize_nearest,
    )

    rng = np.random.default_rng(42)
    imgs = {
        1: rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8),
        2: np.full((8, 4, 3), 255, dtype=np.uint8),  # white
    }
    rows = [
        (1, "image/x-portable-pixmap", bytearray(encode_ppm(imgs[1])), 16, 16, None),
        (2, "image/x-portable-pixmap", bytearray(encode_ppm(imgs[2])), 4, 8, None),
        (3, "image/png", bytearray(b"\x89PNG\r\n\x1a\nnotreal"), None, None, None),
    ]
    assets = spark.createDataFrame(
        rows,
        "asset_id long, mime_type string, payload binary, "
        "width long, height long, duration_ms long",
    )
    feats = {
        r.asset_id: r
        for r in extract_features(
            assets, extractor=image_feature_extractor
        ).collect()
    }
    for aid, img in imgs.items():
        assert feats[aid].feature == pytest.approx(
            image_feature_extractor(encode_ppm(img)), abs=1e-6
        )
    # white image: means 1.0, stds 0.0, grid 1.0
    assert feats[2].feature == pytest.approx([1, 1, 1, 0, 0, 0, 1, 1, 1, 1])
    assert feats[3].feature == [0.0] * 10  # undecodable → quarantine vector


def test_image_features_with_pillow_if_present():
    PIL = pytest.importorskip("PIL")  # noqa: F841 — exercised when installed
    import io

    import numpy as np
    from PIL import Image

    from mhm_data_pipelines_spark.operators.multimodal import decode_image

    img = np.zeros((5, 5, 3), dtype=np.uint8)
    img[:, :, 0] = 200
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    assert (decode_image(buf.getvalue()) == img).all()


def test_c4_line_filtering(spark):
    """C4 heuristics on planted lines: terminal punctuation + ≥3 words
    keep a line; lorem-ipsum / brace pages are flagged; clean text is
    the kept lines re-joined."""
    from mhm_data_pipelines_spark.functions.text import (
        c4_clean_text,
        c4_line_stats,
    )

    doc = "\n".join(
        [
            "This is a proper sentence with enough words.",
            "Too short.",                 # <3 words
            "no terminal punctuation here",
            "",                           # blank — not counted
            "Another good sentence stays in the document!",
            'He said "stop now."',        # quote after period keeps it
        ]
    )
    rows = [
        (1, doc),
        (2, "Lorem ipsum dolor sit amet, consectetur adipiscing elit."),
        (3, "function f() { return 1; } is code not prose."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.s.asDict()
        for r in df.select("doc_id", c4_line_stats("text").alias("s")).collect()
    }
    assert got[1]["n_lines"] == 5
    assert got[1]["n_kept_lines"] == 3
    assert got[1]["n_short_lines"] == 1
    assert got[1]["n_nopunct_lines"] == 1
    assert not got[1]["has_lorem"] and not got[1]["has_brace"]
    assert got[1]["doc_kept"]
    assert got[2]["has_lorem"] and not got[2]["doc_kept"]
    assert got[3]["has_brace"] and not got[3]["doc_kept"]
    clean = {
        r.doc_id: r.c
        for r in df.select("doc_id", c4_clean_text("text").alias("c")).collect()
    }
    assert clean[1].split("\n") == [
        "This is a proper sentence with enough words.",
        "Another good sentence stays in the document!",
        'He said "stop now."',
    ]


def test_winnow_fingerprints(spark):
    """Staged winnowing equals the local reference implementation; the
    winnowing guarantee holds (docs sharing a substring of length
    ≥ window + k − 1 share a fingerprint); short texts fingerprint to
    empty, not error."""
    import hashlib

    from mhm_data_pipelines_spark.functions.text import winnow_fingerprints

    def local(text, k=8, w=4):
        s = text.lower()
        if len(s) < k + w - 1:
            return set()
        hs = [
            int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:15], 16)
            for i in range(len(s) - k + 1)
        ]
        return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}

    shared = "a distinctive plagiarized passage that is long enough"
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, f"prefix text then {shared} then unrelated tail content"),
        (3, f"{shared} embedded at the very start, different elsewhere"),
        (4, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: set(r.fingerprints)
        for r in winnow_fingerprints(df).collect()
    }
    for i, t in rows:
        assert got[i] == local(t), i
    assert got[4] == set()
    assert got[2] & got[3], "shared substring must share a fingerprint"
    assert not (got[1] & got[2])


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


# --------------------------------------------------------------------------
# PII redaction / repetition stats / decontamination


def test_redact_pii_all_shapes(spark):
    from mhm_data_pipelines_spark.functions.text import redact_pii

    got = _one(
        spark,
        "mail a.b+c@ex.co, ssn 123-45-6789, ip 10.0.0.1, "
        "call +1 (555) 123-4567 now",
        redact_pii(F.col("text")),
    )
    assert got == "mail [email], ssn [ssn], ip [ipv4], call [phone] now"


def test_redact_pii_no_pii_unchanged(spark):
    from mhm_data_pipelines_spark.functions.text import redact_pii

    for s in ("nothing here 42", "", "v1.2 is out"):
        assert _one(spark, s, redact_pii(F.col("text"))) == s


def test_redact_pii_custom_replacement(spark):
    from mhm_data_pipelines_spark.functions.text import redact_pii

    got = _one(spark, "x@y.io", redact_pii(F.col("text"), "<gone>"))
    assert got == "<gone>"


def test_repetition_stats(spark):
    from mhm_data_pipelines_spark.functions.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam ham"),
            (2, "all words differ here"),
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = rows[1]
    assert r1.n_words == 4
    assert r1.dup_word_frac == 0.5           # 2 distinct / 4 words
    assert (r1.top_word, r1.top_word_frac) == ("spam", 0.75)
    assert r1.top_bigram_frac == round(2 / 3, 4)  # "spam spam" ×2 of 3
    r2 = rows[2]
    assert r2.dup_word_frac == 0.0 and r2.top_word_frac == 0.25
    # tie on count=1 → lexicographically first token wins
    assert r2.top_word == "all"
    # 1-token doc: no bigrams (NULL, not a crash via descending sequence)
    r3 = rows[3]
    assert r3.n_words == 1 and r3.top_bigram_frac is None


def test_decontaminate_verdicts(spark):
    from mhm_data_pipelines_spark.operators.decontam import (
        decontaminate,
        ngram_overlap,
    )

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),     # shares "quick brown fox"
            (2, "totally unrelated training doc"),
            (3, "short doc"),                     # <3 tokens: no n-grams
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "a quick brown fox appears"), (101, "quick brown fox here")],
        "doc_id long, text string",
    )
    ov = {r.doc_id: r for r in ngram_overlap(train, eval_df).collect()}
    assert set(ov) == {1}
    assert ov[1].n_shared_ngrams == 1 and ov[1].n_eval_docs == 2

    out = {r.doc_id: r for r in decontaminate(train, eval_df).collect()}
    assert len(out) == 3                      # every training row kept
    assert out[1].contaminated is True
    assert out[2].contaminated is False and out[2].n_shared_ngrams == 0
    assert out[3].contaminated is False


def test_bpe_pair_counts_hand_check(spark):
    from mhm_data_pipelines_spark.functions.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "Ab x")], "doc_id long, text string"
    )
    # vocabulary: ab×3 (case-folded), abc×1, x×1 (no pairs: len 1)
    got = {
        (r.left, r.right): r.n for r in bpe_pair_counts(df).collect()
    }
    assert got == {("a", "b"): 4, ("b", "c"): 1}

    top = bpe_pair_counts(df, top_n=1).collect()
    assert len(top) == 1 and (top[0].left, top[0].right) == ("a", "b")


def test_gopher_stats_rules(spark):
    from pyspark.sql import functions as F

    from mhm_data_pipelines_spark.functions.text import gopher_stats

    good = " ".join(
        ["the quick brown fox jumps that have gone with vigor"] * 6
    )  # 60 words, all alphabetic, >=2 stop-set words, mean len in band
    short = "too short to pass the word count rule with these few"
    symbols = " ".join(["see### word##"] * 30)  # hash-heavy, 60 words
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", gopher_stats("text").alias("s")
        ).collect()
    }
    assert out[1].doc_kept
    assert out[1].n_words == 60
    assert out[1].pass_stopwords and out[1].n_stop_hits >= 3
    assert not out[2].pass_word_count and not out[2].doc_kept
    assert not out[3].pass_symbol_ratio and not out[3].doc_kept
    assert out[3].symbol_ratio > 0.1


def test_gopher_stats_bullet_and_ellipsis_lines(spark):
    from mhm_data_pipelines_spark.functions.text import gopher_stats

    text = "\n".join(["- bullet line here"] * 9 + ["plain line end"])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    s = df.select(gopher_stats("text").alias("s")).collect()[0].s
    assert s.bullet_frac == 0.9
    assert not s.pass_bullet_lines

    text2 = "\n".join(["ends with dots..."] * 3 + ["clean"] * 7)
    df2 = spark.createDataFrame([(1, text2)], "doc_id long, text string")
    s2 = df2.select(gopher_stats("text").alias("s")).collect()[0].s
    assert s2.ellipsis_frac == 0.3
    assert not s2.pass_ellipsis_lines


def test_gopher_stats_empty_text(spark):
    from mhm_data_pipelines_spark.functions.text import gopher_stats

    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    s = df.select(gopher_stats("text").alias("s")).collect()[0].s
    assert s.n_words == 0 and not s.doc_kept
    assert s.mean_word_len == 0.0 and s.alpha_frac == 0.0


def test_bpe_apply_fixed_merges(spark):
    from mhm_data_pipelines_spark.functions.text import bpe_apply

    df = spark.createDataFrame(
        [(1, "the thin thread then")], "doc_id long, text string"
    )
    merges = [("t", "h"), ("th", "e"), ("a", "n"), ("an", "d")]
    toks = df.select(bpe_apply("text", merges).alias("t")).collect()[0].t
    assert toks == [
        "the", "th", "i", "n", "th", "r", "e", "a", "d", "the", "n",
    ]
    # Lossless: concatenating subwords recovers the words.
    assert "".join(toks) == "thethinthreadthen"


def test_train_bpe_learns_frequent_pairs(spark):
    from mhm_data_pipelines_spark.functions.text import (
        bpe_apply,
        train_bpe,
    )

    df = spark.createDataFrame(
        [(1, "the the the and and banana")], "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=3)
    # ('a','n') ×4: twice in 'and'×2, twice in 'banana' — beats
    # ('t','h') ×3.
    assert merges[0] == ("a", "n")
    # Encoding with trained merges shrinks the token stream vs chars.
    enc = df.select(bpe_apply("text", merges).alias("t")).collect()[0].t
    n_chars = len("thethetheandandbanana")
    assert len(enc) < n_chars
    assert "".join(enc) == "thethetheandandbanana"


def test_train_bpe_empty_corpus(spark):
    from mhm_data_pipelines_spark.functions.text import train_bpe

    df = spark.createDataFrame([(1, "  ")], "doc_id long, text string")
    assert train_bpe(df, n_merges=3) == []


def test_char_entropy_known_values(spark):
    from pyspark.sql import functions as F

    from mhm_data_pipelines_spark.functions.text import char_entropy

    df = spark.createDataFrame(
        [("aaaa",), ("abab",), ("abcd",), ("",)], ["t"]
    )
    got = [
        r["e"]
        for r in df.select(F.round(char_entropy("t"), 10).alias("e"))
        .collect()
    ]
    assert got == [0.0, 1.0, 2.0, 0.0]


def test_doc_char_entropy_matches_expression(spark):
    from pyspark.sql import functions as F

    from mhm_data_pipelines_spark.functions.text import (
        char_entropy,
        doc_char_entropy,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "zzzzz"), (3, "the quick brown fox")],
        ["doc_id", "text"],
    )
    frame = {
        r["doc_id"]: r["entropy"] for r in doc_char_entropy(df).collect()
    }
    expr = {
        r["doc_id"]: r["e"]
        for r in df.select(
            "doc_id", char_entropy("text").alias("e")
        ).collect()
    }
    for k in expr:
        assert abs(frame[k] - expr[k]) < 1e-9


def test_compression_ratio_orders_repetitive_below_random(spark):
    """Boilerplate compresses far better than high-entropy text."""
    from mhm_data_pipelines_spark.functions.text import compression_stats

    import string
    import random as _random

    rng = _random.Random(0)
    rand_text = "".join(
        rng.choice(string.ascii_letters + " ") for _ in range(2000)
    )
    rep_text = "spam and eggs. " * 133
    df = spark.createDataFrame(
        [(1, rep_text), (2, rand_text)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in compression_stats(df).collect()}
    assert out[1]["ratio"] < 0.1 < out[2]["ratio"]
    assert out[1]["n_bytes"] == len(rep_text)
    assert out[2]["n_compressed"] < out[2]["n_bytes"] * 1.1


def test_compression_gate_pins_and_invariants(spark, tmp_path):
    """The gate query's pinned rows carry exact zlib values and every
    corpus row satisfies the compressBound/shrink invariant."""
    import zlib

    from mhm_data_pipelines_spark.benchmarks.registry import (
        QUERIES,
        _ZLIB_PINS,
    )

    df = spark.createDataFrame(
        [(1, "word salad " * 40), (2, "xy")], ["doc_id", "text"]
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r for r in QUERIES["compression_ratio"](
        spark, d
    ).collect()}
    assert set(rows) == {-3, -2, -1, 1, 2}
    for did, text in _ZLIB_PINS.items():
        b = text.encode()
        assert rows[did]["n_bytes"] == len(b)
        assert rows[did]["n_compressed"] == len(zlib.compress(b, 6))
    # pin ordering: repetitive < natural < hex noise
    assert (
        rows[-3]["ratio"] < rows[-2]["ratio"] < rows[-1]["ratio"]
    )
    assert all(rows[i]["ok"] for i in rows)
    assert rows[1]["n_compressed"] == -1  # corpus rows sentineled


def test_wav_roundtrip_and_quarantine(spark):
    import numpy as np

    from mhm_data_pipelines_spark.operators.multimodal import (
        audio_feature_extractor,
        decode_wav,
        encode_wav,
    )

    # Sine at 440 Hz / 16 kHz: rms = A/sqrt(2), zcr = 2 crossings per
    # period (within one of the count over a non-integer period span).
    sr, f, amp, n = 16_000, 440, 10_000, 16_000
    t = np.arange(n)
    x = (amp * np.sin(2 * np.pi * f * t / sr)).astype("<i2")
    payload = encode_wav(x, sr)
    arr, got_sr = decode_wav(payload)
    assert got_sr == sr and arr.dtype == np.dtype("<i2")
    assert np.array_equal(arr, x)

    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"not audio"))],
        "asset_id long, payload binary",
    )
    got = {
        r["asset_id"]: r
        for r in audio_feature_extractor(df).collect()
    }
    assert got[1]["decoded"] and got[1]["n_samples"] == n
    assert abs(got[1]["rms"] - amp / np.sqrt(2)) / amp < 0.01
    assert abs(got[1]["zero_crossings"] - 2 * f) <= 2
    # Undecodable -> quarantined zero row, never dropped.
    assert not got[2]["decoded"] and got[2]["n_samples"] == 0


def test_decode_wav_rejects_non_pcm16(spark):
    import struct

    import pytest as _pytest

    from mhm_data_pipelines_spark.operators.multimodal import decode_wav

    # 8-bit PCM header: must raise NotImplementedError, not misparse.
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36, b"WAVE", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8,
        b"data", 0,
    )
    with _pytest.raises(NotImplementedError):
        decode_wav(hdr)
    with _pytest.raises(NotImplementedError):
        decode_wav(b"\x00\x01\x02")


def test_doc_char_entropy_empty_doc_emits_no_row(spark):
    """split('', '') yields [''] — the phantom element must not turn an
    empty doc into a (n=1, entropy=0) row; the contract (matching the
    SQL twin's generate_series(1, 0)) is NO row (ADVICE r4)."""
    from mhm_data_pipelines_spark.functions.text import doc_char_entropy

    df = spark.createDataFrame(
        [(1, ""), (2, "ab")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in doc_char_entropy(df).collect()}
    assert set(rows) == {2}
    assert rows[2]["n_chars_ent"] == 2
    assert rows[2]["entropy"] == pytest.approx(1.0)


def test_wordlist_hits_word_boundary_and_punct(spark):
    from mhm_data_pipelines_spark.functions.text import wordlist_hits

    rows = [
        (1, "the Spam! spam and assess"),   # 'spam' x2; 'assess' != 'ass'
        (2, "clean text only"),
        (3, "SPAM, (ham)"),                 # punctuation-stripped matches
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.s.asDict()
        for r in df.select(
            "doc_id", wordlist_hits("text", ("spam", "ham", "ass")).alias("s")
        ).collect()
    }
    assert got[1] == {"n_hits": 2, "n_distinct_hits": 1, "hit_any": True}
    assert got[2] == {"n_hits": 0, "n_distinct_hits": 0, "hit_any": False}
    assert got[3] == {"n_hits": 2, "n_distinct_hits": 2, "hit_any": True}


def test_wordlist_hits_null_text_is_zero(spark):
    from mhm_data_pipelines_spark.functions.text import wordlist_hits

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    got = df.select(wordlist_hits("text", ("spam",)).alias("s")).collect()[0]
    assert got.s.asDict() == {
        "n_hits": 0, "n_distinct_hits": 0, "hit_any": False
    }


def test_ahash64_known_bits_and_perturbation():
    """aHash integer contract on a hand-checkable image: half-dark /
    half-bright vertical split -> exactly the bright half's 32 bits
    set; a strong perturbation of one sampled cell flips ~1 bit."""
    import numpy as np

    from mhm_data_pipelines_spark.operators.multimodal import (
        ahash64,
        encode_ppm,
    )

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, 8:, :] = 200  # right half bright
    h = ahash64(encode_ppm(img))
    bits = [(h >> i) & 1 if h >= 0 else ((h + (1 << 64)) >> i) & 1
            for i in range(64)]
    for y in range(8):
        for x in range(8):
            expect = 1 if x >= 4 else 0
            assert bits[y * 8 + x] == expect, (y, x)
    # Perturb one dark sampled cell (pixel (0,0) drives grid cell 0).
    img2 = img.copy()
    img2[0, 0, :] = 255
    h2 = ahash64(encode_ppm(img2))
    ham = bin((h ^ h2) & ((1 << 64) - 1)).count("1")
    assert 1 <= ham <= 2, ham


def test_image_ahash_and_neardup_through_spark(spark):
    """bytes -> decode -> hash -> banded Hamming join end-to-end:
    identical images pair at 0, a 1-cell variant pairs within 3, a
    different image does not pair; undecodable payloads quarantine."""
    import numpy as np

    from mhm_data_pipelines_spark.operators.multimodal import (
        ahash_near_duplicates,
        encode_ppm,
        image_ahash,
    )

    base = np.zeros((16, 16, 3), dtype=np.uint8)
    base[:, 8:, :] = 200
    variant = base.copy()
    variant[0, 0, :] = 255  # flips ~1 bit
    other = np.zeros((16, 16, 3), dtype=np.uint8)
    other[8:, :, :] = 200  # horizontal split: hamming 32 from base
    rows = [
        (1, bytearray(encode_ppm(base))),
        (2, bytearray(encode_ppm(base))),
        (3, bytearray(encode_ppm(variant))),
        (4, bytearray(encode_ppm(other))),
        (5, bytearray(b"GIF89a not decodable")),
    ]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    hashed = image_ahash(assets)
    got = {r["asset_id"]: r for r in hashed.collect()}
    assert got[5]["decoded"] is False and got[5]["ahash"] is None
    assert got[1]["ahash"] == got[2]["ahash"]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_near_duplicates(hashed, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and 1 <= pairs[(1, 3)] <= 2
    assert not any(4 in p or 5 in p for p in pairs)


class TestReadability:
    def _one(self, spark, txt):
        from pyspark.sql import functions as F

        from mhm_data_pipelines_spark.functions.text import (
            readability_stats,
        )

        df = spark.createDataFrame([(txt,)], "t string")
        return df.select(
            readability_stats("t").alias("r")
        ).select("r.*").collect()[0]

    def test_hand_counts(self, spark):
        r = self._one(spark, "The cat sat. The dog ran away!")
        # words: 7; sentences: 2; syllables: the(1) cat(1) sat(1)
        # the(1) dog(1) ran(1) a-way(2) = 8
        assert r["words"] == 7
        assert r["sentences"] == 2
        assert r["syllables"] == 8
        w_s, syl_w = 7 / 2, 8 / 7
        assert r["flesch"] == pytest.approx(
            206.835 - 1.015 * w_s - 84.6 * syl_w
        )
        assert r["fk_grade"] == pytest.approx(
            0.39 * w_s + 11.8 * syl_w - 15.59
        )

    def test_vowelless_word_counts_one_syllable(self, spark):
        r = self._one(spark, "Mr Smith left.")
        # mr: 0 vowel groups -> +1; smith: 1; left: 1
        assert r["syllables"] == 3

    def test_no_terminator_floors_sentences_at_one(self, spark):
        r = self._one(spark, "no punctuation here at all")
        assert r["sentences"] == 1

    def test_empty_text_is_null_scores(self, spark):
        r = self._one(spark, "   ")
        assert r["words"] == 0
        assert r["flesch"] is None and r["fk_grade"] is None
        assert r["sentences"] is None
