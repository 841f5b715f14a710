"""Hypothesis property tests: distributed operators vs trusted
single-node references on randomized inputs (SURVEY §5 strategy —
the reference validates merges against pandas; we do the same,
adversarially)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mhm_data_pipelines_spark.operators.skew import salted_agg
from mhm_data_pipelines_spark.operators.temporal import asof_join

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_keys = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=1_000)
_vals = st.integers(min_value=-100, max_value=100)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@given(
    left=st.lists(st.tuples(_keys, _ts), min_size=1, max_size=25),
    right=st.lists(st.tuples(_keys, _ts, _vals), min_size=1, max_size=25),
)
@_settings
def test_asof_join_matches_pandas_merge_asof(sp, left, right):
    # Dedup right on (key, ts): with duplicate right timestamps the
    # winner is input-order-dependent in both engines (documented caller
    # contract) — property holds on unique (key, ts).
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())
    ldf = sp.createDataFrame(
        [(k, t) for k, t in left], "k bigint, ts bigint"
    )
    rdf = sp.createDataFrame(right, "k bigint, ts bigint, v bigint")
    got = {
        (r.k, r.ts): r.asof_v
        for r in asof_join(ldf, rdf, on=["k"]).collect()
    }
    lp = pd.DataFrame(sorted(left), columns=["k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(sorted(right), columns=["k", "ts", "v"]).sort_values("ts")
    want_df = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for row in want_df.itertuples(index=False):
        want_v = None if pd.isna(row.v) else int(row.v)
        assert got[(row.k, row.ts)] == want_v, (row, got)


@given(
    rows=st.lists(st.tuples(_keys, _vals), min_size=1, max_size=40),
    buckets=st.sampled_from([1, 2, 7]),
)
@_settings
def test_salted_agg_equals_plain_groupby(sp, rows, buckets):
    df = sp.createDataFrame(rows, "k bigint, v bigint")
    got = {
        r.k: (r.n, r.total, r.mn, r.mx)
        for r in salted_agg(
            df,
            keys=["k"],
            aggs={
                "n": ("count", "v"),
                "total": ("sum", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
            },
            buckets=buckets,
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    for k, g in pdf.groupby("k"):
        assert got[k] == (
            len(g), g.v.sum(), g.v.min(), g.v.max()
        ), (k, got[k])


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcde"), min_size=0, max_size=18
        ).map(lambda ts: " ".join(ts)),
        min_size=2,
        max_size=5,
    ),
    k=st.sampled_from([2, 3]),
)
@_settings
def test_duplicate_ngram_spans_matches_bruteforce(sp, docs, k):
    from mhm_data_pipelines_spark.operators.dedup import (
        duplicate_ngram_spans,
    )

    df = sp.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.n_grams)
        for r in duplicate_ngram_spans(
            df, k=k, min_run=1, max_gram_df=None
        ).collect()
    }

    # Brute force: all matching k-gram position pairs, consolidated
    # into maximal diagonal runs.
    toksets = [d.split() for d in docs]
    want = set()
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            ta, tb = toksets[a], toksets[b]
            matches = {
                (i, j)
                for i in range(len(ta) - k + 1)
                for j in range(len(tb) - k + 1)
                if ta[i:i + k] == tb[j:j + k]
            }
            for (i, j) in matches:
                if (i - 1, j - 1) in matches:
                    continue  # not a run start
                run = 1
                while (i + run, j + run) in matches:
                    run += 1
                want.add((a, b, i + 1, j + 1, run))
    assert got == want
