"""BM25 retrieval: hand-computed scores on a tiny corpus, top-k
determinism, input validation."""

from __future__ import annotations

import math

import pytest

from mhm_data_pipelines_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
)

DOCS = [
    (1, "spark engine for data processing at scale"),
    (2, "data data data everywhere"),
    (3, "a completely unrelated document about cats"),
    (4, "spark spark spark spark streaming"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _expected(query_terms, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for d, t in toks.items():
        score, matched = 0.0, 0
        for q in query_terms:
            tf = t.count(q)
            if tf == 0:
                continue
            df = sum(1 for tt in toks.values() if q in tt)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            score += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(t) / avgdl)
            )
            matched += 1
        if matched:
            out[d] = (score, matched)
    return out


def test_bm25_scores_match_reference_formula(spark, corpus):
    got = {
        r.doc_id: (r.score, r.n_terms_matched)
        for r in bm25_scores(corpus, "spark data").collect()
    }
    want = _expected(["spark", "data"])
    assert set(got) == set(want)
    for d, (s, m) in want.items():
        assert got[d][1] == m
        assert got[d][0] == pytest.approx(s, rel=1e-12)


def test_bm25_topk_order_and_k(spark, corpus):
    rows = bm25_topk(corpus, "spark data", k=2).collect()
    want = _expected(["spark", "data"])
    order = sorted(want, key=lambda d: (-want[d][0], d))
    assert [r.doc_id for r in rows] == order[:2]
    # scores descend
    assert rows[0].score >= rows[1].score


def test_bm25_unmatched_docs_absent_and_case_folded(spark, corpus):
    got = {r.doc_id for r in bm25_scores(corpus, "SPARK").collect()}
    assert got == {1, 4}


def test_bm25_empty_query_raises(spark, corpus):
    with pytest.raises(ValueError):
        bm25_scores(corpus, "   ")


def test_bm25_share_scan_same_results(spark, corpus):
    base = {
        (r.doc_id, r.score)
        for r in bm25_scores(corpus, "spark data", round_scores=6).collect()
    }
    shared = {
        (r.doc_id, r.score)
        for r in bm25_scores(
            corpus, "spark data", round_scores=6, share_scan=True
        ).collect()
    }
    assert base == shared
