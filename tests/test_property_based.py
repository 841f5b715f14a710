"""Hypothesis property tests: distributed operators vs trusted
single-node references on randomized inputs (SURVEY §5 strategy —
the reference validates merges against pandas; we do the same,
adversarially)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Slow tier: hypothesis replays run dozens of Spark actions per test
# (VERDICT r9 #3 — the default suite must fit the driver's budget);
# run with `pytest -m slow`.
pytestmark = pytest.mark.slow

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


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


_words = st.text(alphabet="abc", min_size=0, max_size=6)


@given(
    texts=st.lists(_words, min_size=1, max_size=15),
    k=st.sampled_from([1, 2]),
)
@_settings
def test_edit_distance_join_matches_bruteforce(sp, texts, k):
    """Deletion-neighborhood blocking must be EXACT — a tiny alphabet
    maximizes collisions, short strings hit the empty/boundary paths."""
    from mhm_data_pipelines_spark.operators.fuzzy import edit_distance_join

    rows = list(enumerate(texts))
    df = sp.createDataFrame(rows, "id int, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, "name", "id", k=k).collect()
    }
    want = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1:]:
            d = _lev_ref(ta, tb)
            if d <= k:
                want.add((ia, ib, d))
    assert got == want


@given(
    edges=st.lists(
        st.tuples(
            st.integers(0, 5),
            st.integers(0, 5),
            st.integers(1, 4),
        ),
        min_size=1,
        max_size=20,
    ),
    iters=st.sampled_from([1, 3]),
)
@_settings
def test_pagerank_matches_reference_recurrence(sp, edges, iters):
    from mhm_data_pipelines_spark.operators.graph import pagerank

    # Collapse duplicate (src,dst) by summing weights — the operator
    # treats each edge row independently, the reference dict can't.
    agg: dict = {}
    for s, d, w in edges:
        agg[(s, d)] = agg.get((s, d), 0) + w
    df = sp.createDataFrame(
        [(s, d, float(w)) for (s, d), w in agg.items()],
        "src int, dst int, w double",
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, weight="w", iterations=iters).collect()
    }
    nodes = sorted({s for s, _ in agg} | {d for _, d in agg})
    n = len(nodes)
    out_w: dict = {}
    for (s, _), w in agg.items():
        out_w[s] = out_w.get(s, 0.0) + w
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        nxt = {v: 0.15 / n for v in nodes}
        for (s, d), w in agg.items():
            nxt[d] += 0.85 * rank[s] * w / out_w[s]
        rank = nxt
    assert set(got) == set(rank)
    for v in rank:
        assert abs(got[v] - rank[v]) < 1e-9, (v, got[v], rank[v])


@given(
    n_rows=st.integers(10, 60),
    n=st.integers(1, 20),
    parts=st.sampled_from([1, 5, 13]),
)
@_settings
def test_weighted_sample_partitioning_invariant(sp, n_rows, n, parts):
    """The selected ID SET must not depend on physical layout."""
    from mhm_data_pipelines_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + (i * 7) % 5)) for i in range(n_rows)]
    df = sp.createDataFrame(rows, "id int, w double")
    base = {
        r["id"] for r in weighted_sample(df, n, "w", "id").collect()
    }
    repart = {
        r["id"]
        for r in weighted_sample(
            df.repartition(parts), n, "w", "id"
        ).collect()
    }
    assert base == repart
    assert len(base) == min(n, n_rows)


_sane_float = st.floats(
    min_value=-50, max_value=50, allow_nan=False, allow_subnormal=False
).map(lambda v: 0.0 if abs(v) < 1e-6 else v)
# tiny-but-nonzero magnitudes make BOTH the operator's variance sums
# underflow and polyfit's SVD ill-conditioned; production inputs that
# small are a data bug, not a fit case


@_settings
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2), _sane_float,
                  _sane_float),
        min_size=3,
        max_size=40,
    )
)
def test_ols_trend_matches_lstsq(sp, rows):
    """Per-group slope/intercept equal NumPy least squares whenever x
    has variance; NULL-contract groups (single distinct x) are NULL."""
    import numpy as np

    from mhm_data_pipelines_spark.operators.timeseries import ols_trend

    df = sp.createDataFrame(
        [(g, float(x), float(y)) for g, x, y in rows],
        "g int, x double, y double",
    )
    got = {r["g"]: r for r in ols_trend(df, ["g"], "x", "y").collect()}
    by_g: dict[int, list] = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    for g, pts in by_g.items():
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        r = got[g]
        assert r["n"] == len(pts)
        # mirror the operator's own float guard: n·Σx² − (Σx)² must be
        # strictly positive in DOUBLE arithmetic (subnormal x values
        # underflow it to 0 even when ptp(xs) != 0, and polyfit's SVD
        # can't handle them either)
        varx_n = len(xs) * float((xs * xs).sum()) - float(xs.sum()) ** 2
        if varx_n <= 0:
            assert r["slope"] is None and r["r2"] is None
            continue
        slope, intercept = np.polyfit(xs, ys, 1)
        assert r["slope"] == pytest.approx(slope, rel=1e-6, abs=1e-6)
        assert r["intercept"] == pytest.approx(
            intercept, rel=1e-6, abs=1e-6
        )
        if r["r2"] is not None:
            assert -1e-9 <= r["r2"] <= 1 + 1e-9


@_settings
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=6,
        max_size=40,
    ),
    shift=st.floats(min_value=-1000, max_value=1000, allow_nan=False),
)
def test_anova_shift_and_relabel_invariance(sp, rows, shift):
    """The F statistic is invariant under adding a constant to every
    value and under permuting group labels (variance decomposition
    properties) — checked against the Spark implementation itself."""
    from mhm_data_pipelines_spark.operators.stats_tests import anova_oneway

    df = sp.createDataFrame(
        [(str(g), float(v)) for g, v in rows], "g string, v double"
    )
    base = anova_oneway(df, "v", "g", round_sums=None).collect()[0]
    from pyspark.sql import functions as F

    shifted = anova_oneway(
        df.withColumn("v", F.col("v") + float(shift)),
        "v",
        "g",
        round_sums=None,
    ).collect()[0]
    relabel = anova_oneway(
        df.withColumn("g", F.concat(F.lit("z"), F.col("g"))),
        "v",
        "g",
        round_sums=None,
    ).collect()[0]
    for other in (shifted, relabel):
        assert other["k_groups"] == base["k_groups"]
        assert other["n"] == base["n"]
        if base["f_stat"] is None:
            assert other["f_stat"] is None
        else:
            assert other["f_stat"] == pytest.approx(
                base["f_stat"], rel=1e-6, abs=1e-6
            )


@_settings
@given(
    vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        min_size=5,
        max_size=50,
    )
)
def test_winsorize_bounds_and_idempotence(sp, vals):
    """Clamped values always land inside the percentile band, row count
    is preserved, and winsorizing the already-winsorized column with
    the same bounds is the identity."""
    from pyspark.sql import functions as F

    from mhm_data_pipelines_spark.operators.repair import (
        winsorize,
        winsorize_bounds,
    )

    df = sp.createDataFrame([(float(v),) for v in vals], "v double")
    b = winsorize_bounds(df, "v", None, 0.1, 0.9).collect()[0]
    out = winsorize(df, "v", None, 0.1, 0.9).collect()
    assert len(out) == len(vals)
    for r in out:
        assert b["lo"] - 1e-9 <= r["v_w"] <= b["hi"] + 1e-9
    again = winsorize(
        sp.createDataFrame([(r["v_w"],) for r in out], "v double"),
        "v",
        None,
        0.0,
        1.0,
    ).collect()
    assert sorted(r["v_w"] for r in again) == pytest.approx(
        sorted(r["v_w"] for r in out)
    )


# ------------------------------------------------- r7 batch properties


@given(
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=20,
    ),
)
@_settings
def test_interval_concurrency_matches_brute_force(sp, intervals):
    from datetime import datetime, timedelta

    from mhm_data_pipelines_spark.operators.temporal import (
        interval_concurrency,
    )

    base = datetime(2024, 1, 1)
    rows = [
        ("k", base + timedelta(hours=min(s, e)),
         base + timedelta(hours=max(s, e)))
        for s, e in intervals
    ]
    df = sp.createDataFrame(rows, "k string, s timestamp, e timestamp")
    out = interval_concurrency(df, "s", "e", keys=["k"]).collect()[0]
    # brute force over the half-open semantics: concurrency at any
    # boundary instant t = #intervals with s <= t < e.
    pts = sorted({min(s, e) for s, e in intervals})
    want = max(
        sum(1 for s, e in intervals if min(s, e) <= t < max(s, e))
        for t in pts
    )
    # zero-length intervals can make every candidate 0
    want = max(want, 0)
    assert out["peak_concurrency"] == want
    assert out["n_intervals"] == len(rows)


@given(
    elems_a=st.sets(st.integers(0, 500), min_size=1, max_size=80),
    elems_b=st.sets(st.integers(0, 500), min_size=1, max_size=80),
)
@_settings
def test_kmv_exact_below_k(sp, elems_a, elems_b):
    from mhm_data_pipelines_spark.operators.sketches import kmv_set_ops

    rows = [("A", e) for e in elems_a] + [("B", e) for e in elems_b]
    df = sp.createDataFrame(rows, "s string, e int")
    out = kmv_set_ops(df, "s", "e", k=256).collect()[0]
    # both sets below k: the sketch IS the set — everything exact.
    assert out["est_a"] == float(len(elems_a))
    assert out["est_b"] == float(len(elems_b))
    assert out["est_inter"] == float(len(elems_a & elems_b))
    assert out["est_union"] == float(len(elems_a | elems_b))


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=4,
        max_size=60,
    ),
    n_bins=st.sampled_from([2, 4, 5]),
)
@_settings
def test_psi_self_comparison_is_zero(sp, vals, n_bins):
    from mhm_data_pipelines_spark.operators.drift import psi_report

    df = sp.createDataFrame([(v,) for v in vals], "x double")
    out = psi_report(df, df, "x", n_bins=n_bins).collect()
    assert out, "grid must not be empty"
    for r in out:
        assert r["psi_term"] == 0.0 and r["js_term"] == 0.0
        assert r["n_ref"] == r["n_cur"]


@_settings
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),  # id
            st.integers(min_value=0, max_value=4),    # block
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(min_value=2, max_value=5),
    parts=st.integers(min_value=1, max_value=7),
)
def test_blocked_pair_sample_properties(sp, rows, k, parts):
    """(1) per block: exactly C(min(n,k),2) pairs; (2) the emitted
    pair SET is invariant to physical partitioning (deterministic
    md5 rank, no rand()/monotonic id); (3) mass columns are the true
    block stats; (4) a python md5 replay selects the same members."""
    import hashlib
    from collections import Counter

    from mhm_data_pipelines_spark.operators.linkage import (
        blocked_pair_sample,
    )

    df = sp.createDataFrame(rows, "doc_id long, blk int")
    out = blocked_pair_sample(
        df, ["blk"], id_col="doc_id", k=k
    ).collect()
    again = blocked_pair_sample(
        df.repartition(parts), ["blk"], id_col="doc_id", k=k
    ).collect()
    key = lambda r: (r.blk, r.id_a, r.id_b)  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, again))

    sizes = Counter(b for _, b in rows)
    per_block = Counter(r.blk for r in out)
    for blk, n in sizes.items():
        m = min(n, k)
        assert per_block.get(blk, 0) == m * (m - 1) // 2
    for r in out:
        n = sizes[r.blk]
        assert r.n_block == n and r.pairs_total == n * (n - 1) // 2
        members = sorted(
            (i for i, b in rows if b == r.blk),
            key=lambda i: (
                hashlib.md5(f"{i}:42".encode()).hexdigest(), i
            ),
        )[:k]
        assert r.id_a in members and r.id_b in members


@_settings
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=50), min_size=8, max_size=40
    ),
    period=st.sampled_from([3, 5, 7]),
)
def test_seasonal_decompose_matches_numpy_replay(sp, vals, period):
    """Full numpy replay of the documented semantics on a random
    contiguous daily series: calendar-range centered MA trend
    (partial edges), re-centered per-position mean of detrended,
    residual identity — every cell equal to 6dp."""
    import datetime as dt

    import numpy as np

    from mhm_data_pipelines_spark.operators.timeseries import (
        seasonal_decompose,
    )

    start = dt.date(2024, 3, 1)
    rows = [
        ("g", (start + dt.timedelta(days=i)).isoformat(), float(v))
        for i, v in enumerate(vals)
    ]
    df = sp.createDataFrame(rows, "g string, day string, v double")
    got = {
        r["day"]: r
        for r in seasonal_decompose(
            df, ["g"], day_col="day", value_col="v", period=period
        ).collect()
    }

    n = len(vals)
    hw = period // 2
    v = np.array(vals, dtype=float)
    trend = np.array(
        [
            round(v[max(0, i - hw): i + hw + 1].mean(), 6)
            for i in range(n)
        ]
    )
    detr = v - trend
    di0 = (start - dt.date(1970, 1, 1)).days
    pos = np.array([(di0 + i) % period for i in range(n)])
    s_raw = {
        p: round(detr[pos == p].mean(), 6) for p in sorted(set(pos))
    }
    center = np.mean(list(s_raw.values()))
    seasonal = {p: round(s - center, 6) for p, s in s_raw.items()}
    for i in range(n):
        day = (start + dt.timedelta(days=i)).isoformat()
        r = got[day]
        assert r["trend"] == pytest.approx(trend[i], abs=2e-6)
        assert r["seasonal"] == pytest.approx(seasonal[pos[i]], abs=2e-6)
        assert r["residual"] == pytest.approx(
            round(v[i] - trend[i] - seasonal[pos[i]], 6), abs=2e-6
        )
