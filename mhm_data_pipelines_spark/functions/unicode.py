"""Unicode text canonicalization — the web-corpus normalization stage
(NFC composition, whitespace/control cleanup) that runs before any
fingerprint/dedup/tokenize step so visually-identical strings hash
identically.

No reference counterpart (north-star LLM-pipeline extension): crawled
text mixes composed ("é") and decomposed ("e" + U+0301) forms; every
downstream exact-match operator (dedup fingerprints, paragraph/sentence
units, span grams) silently treats them as different documents unless
ingestion canonicalizes. NFC is the interchange form (UAX #15) and is
what DuckDB's ``nfc_normalize`` / utf8proc implement, which keeps the
operation oracle-checkable across engines.

Scale shape: NFC has no Spark builtin, so the composition hop is ONE
Arrow-vectorized ``pandas_udf`` (a Column function — composes into any
projection, no reshuffle, no mapInPandas frame rewrite); the
whitespace/control cleanup stays in builtin regexp expressions around
it (codegen). The UDF is a no-op fast path for ASCII: ``str.isascii``
short-circuits before ``unicodedata.normalize`` — crawl corpora are
overwhelmingly ASCII, so most batches never pay the normalize call.

NOTE: deliberately no ``from __future__ import annotations`` here —
``pandas_udf`` infers its eval type from RESOLVED type hints, and that
future-import would turn them into bare strings it cannot resolve.
"""

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["nfc", "canonicalize_text"]


def _nfc_impl(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(
        lambda t: t
        if t is None or t.isascii()
        else unicodedata.normalize("NFC", t)
    )


def nfc(col):
    """Unicode NFC composition of a string column (NULL-preserving),
    as an Arrow-batched vectorized UDF. The UDF wraps lazily per call:
    ``pandas_udf`` needs an active SparkSession, which an importing
    module must not assume exists."""
    udf = pandas_udf(_nfc_impl, "string")
    return udf(F.col(col) if isinstance(col, str) else col)


def canonicalize_text(
    col,
    lowercase: bool = False,
    strip_controls: bool = True,
) -> Column:
    """Full canonical form: NFC, optional lowercase, control characters
    (category Cc, newline/tab included) → space, whitespace collapsed
    and trimmed. Everything except the NFC hop is builtin regexp/string
    expressions (whole-stage codegen)."""
    c = nfc(col)
    if lowercase:
        c = F.lower(c)
    if strip_controls:
        c = F.regexp_replace(c, r"\p{Cntrl}", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def script_profile(text: Column | str) -> Column:
    """Per-document writing-script composition as one struct column —
    the multilingual routing signal read before language-specific
    stages (tokenizer choice, lang-id trust, CJK-aware dedup): counts
    of Latin letters, Cyrillic, CJK unified ideographs, digits,
    whitespace, and everything else, plus the dominant-script tag.

    Counting uses LITERAL codepoint ranges (``[A-Za-z]``,
    ``[\\u0400-\\u04FF]``, ``[\\u4E00-\\u9FFF]``) rather than named
    regex script classes — Java (``\\p{IsCyrillic}``) and RE2
    (``\\p{Cyrillic}``) draw class boundaries differently, literal
    ranges are engine-exact. Pure Column expressions
    (``regexp_count``); no explode, no Python.

    ``dominant`` ties break latin > cyrillic > cjk > other (web-corpus
    prior); a document of only digits/whitespace is ``'other'``.
    """
    from pyspark.sql import functions as F

    c = F.col(text) if isinstance(text, str) else text
    n_latin = F.regexp_count(c, F.lit(r"[A-Za-z]"))
    n_cyr = F.regexp_count(c, F.lit("[Ѐ-ӿ]"))
    n_cjk = F.regexp_count(c, F.lit("[一-鿿]"))
    n_digit = F.regexp_count(c, F.lit(r"[0-9]"))
    n_space = F.regexp_count(c, F.lit(r"\s"))
    n_total = F.length(c)
    n_other = n_total - n_latin - n_cyr - n_cjk - n_digit - n_space
    dominant = (
        F.when((n_latin >= n_cyr) & (n_latin >= n_cjk) & (n_latin > 0), "latin")
        .when((n_cyr >= n_cjk) & (n_cyr > 0), "cyrillic")
        .when(n_cjk > 0, "cjk")
        .otherwise("other")
    )
    return F.struct(
        n_total.cast("long").alias("n_chars"),
        n_latin.cast("long").alias("n_latin"),
        n_cyr.cast("long").alias("n_cyrillic"),
        n_cjk.cast("long").alias("n_cjk"),
        n_digit.cast("long").alias("n_digit"),
        n_space.cast("long").alias("n_space"),
        n_other.cast("long").alias("n_other"),
        dominant.alias("dominant"),
    )
