"""EWMA + CUSUM sequential operators: hand-computed recursions, tie
ordering, restart-on-alarm semantics, zero-variance guard."""

from __future__ import annotations

import datetime as dt

import pytest

from mhm_data_pipelines_spark.operators.timeseries import (
    cusum_summary,
    ewma,
)

T0 = dt.datetime(2025, 3, 1, 12)


def _events(spark, vals, key=1):
    rows = [
        (key, T0 + dt.timedelta(minutes=i), i, float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )


def test_ewma_hand_recursion(spark):
    df = _events(spark, [10.0, 20.0, 10.0])
    got = {
        r.rn: r.ewma
        for r in ewma(df, order_id="event_id", alpha=0.25).collect()
    }
    # y1=10; y2=0.75*10+0.25*20=12.5; y3=0.75*12.5+0.25*10=11.875
    assert got == {1: 10.0, 2: 12.5, 3: 11.875}


def test_ewma_orders_by_ts_then_id(spark):
    rows = [
        (1, T0, 5, 100.0),  # same ts, higher id -> second
        (1, T0, 2, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    got = {r.rn: r.ewma for r in ewma(df, order_id="event_id").collect()}
    assert got[1] == 0.0 and got[2] == 25.0


def test_ewma_keys_independent(spark):
    df = _events(spark, [1.0, 3.0], key=7).union(
        _events(spark, [100.0], key=8)
    )
    out = ewma(df, order_id="event_id", alpha=0.5).collect()
    by_key = {(r.user_id, r.rn): r.ewma for r in out}
    assert by_key[(7, 2)] == 2.0
    assert by_key[(8, 1)] == 100.0


def test_cusum_alarm_and_restart(spark):
    # 12 baseline points alternating +-1 around 0, then a sustained
    # upward shift: z-scores drift positive and s+ must alarm, reset,
    # and keep counting.
    vals = [1.0, -1.0] * 6 + [5.0] * 10
    df = _events(spark, vals)
    row = cusum_summary(df, k=0.5, h=2.0).collect()[0]
    assert row.n_obs == 22
    assert row.n_alarms_hi >= 1
    assert row.max_s_hi > 2.0
    # python replay of the exact two-sided recursion for the same data
    import statistics

    mu = statistics.fmean(vals)
    sd = statistics.pstdev(vals)
    sp = sn = 0.0
    hi = lo = 0
    mxp = mxn = 0.0
    for v in vals:
        z = (v - mu) / sd
        sp = max(0.0, (0.0 if sp > 2.0 else sp) + z - 0.5)
        sn = max(0.0, (0.0 if sn > 2.0 else sn) - z - 0.5)
        if sp > 2.0:
            hi += 1
        if sn > 2.0:
            lo += 1
        mxp = max(mxp, sp)
        mxn = max(mxn, sn)
    assert (row.n_alarms_hi, row.n_alarms_lo) == (hi, lo)
    assert row.max_s_hi == pytest.approx(mxp, rel=1e-12)
    assert row.max_s_lo == pytest.approx(mxn, rel=1e-12)


def test_cusum_zero_variance_key_never_alarms(spark):
    df = _events(spark, [3.0, 3.0, 3.0])
    row = cusum_summary(df).collect()[0]
    assert (row.n_alarms_hi, row.n_alarms_lo) == (0, 0)
    assert row.max_s_hi == 0.0 and row.max_s_lo == 0.0


# ------------------------------------------------- sequential patterns


def test_sequential_patterns_hand_counts(spark):
    from mhm_data_pipelines_spark.operators.timeseries import (
        sequential_patterns,
    )

    rows = [
        # u1: a b a b  -> trigrams a>b>a, b>a>b
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
        # u2: a b a    -> trigram a>b>a
        (2, 1, "a"), (2, 2, "b"), (2, 3, "a"),
        # u3: too short for any trigram
        (3, 1, "a"), (3, 2, "b"),
    ]
    df = spark.createDataFrame(rows, "u int, t int, s string")
    got = {
        r["pattern"]: r
        for r in sequential_patterns(df, "u", ["t"], "s", k=3).collect()
    }
    assert set(got) == {"a>b>a", "b>a>b"}
    assert got["a>b>a"]["n_occurrences"] == 2
    assert got["a>b>a"]["n_entities"] == 2
    assert got["a>b>a"]["support"] == round(2 / 3, 6)
    assert got["b>a>b"]["n_entities"] == 1


def test_sequential_patterns_null_state_breaks_run(spark):
    from mhm_data_pipelines_spark.operators.timeseries import (
        sequential_patterns,
    )

    rows = [(1, 1, "a"), (1, 2, None), (1, 3, "b"), (1, 4, "c"),
            (1, 5, "d")]
    df = spark.createDataFrame(rows, "u int, t int, s string")
    got = {r["pattern"] for r in
           sequential_patterns(df, "u", ["t"], "s", k=3).collect()}
    # runs containing the NULL are dropped; b>c>d survives — and the
    # truncated a>_>b must NOT alias to a bigram-looking pattern.
    assert got == {"b>c>d"}


def test_sequential_patterns_k2_matches_transitions(spark):
    from mhm_data_pipelines_spark.operators.timeseries import (
        sequential_patterns,
        transition_matrix,
    )

    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (2, 1, "b"),
            (2, 2, "b")]
    df = spark.createDataFrame(rows, "u int, t int, s string")
    pat = {
        r["pattern"]: r["n_occurrences"]
        for r in sequential_patterns(df, "u", ["t"], "s", k=2).collect()
    }
    tm = {
        f"{r['state']}>{r['next_state']}": r["n"]
        for r in transition_matrix(df, "u", ["t"], "s").collect()
    }
    assert pat == tm


def test_sequential_patterns_k_guard(spark):
    import pytest as _pytest

    from mhm_data_pipelines_spark.operators.timeseries import (
        sequential_patterns,
    )

    df = spark.createDataFrame([(1, 1, "a")], "u int, t int, s string")
    with _pytest.raises(ValueError):
        sequential_patterns(df, "u", ["t"], "s", k=1)


def test_sequential_patterns_separator_in_state_not_conflated(spark):
    from mhm_data_pipelines_spark.operators.timeseries import (
        sequential_patterns,
    )

    # ('a>b', 'c') and ('a', 'b>c') must NOT merge even though both
    # render as 'a>b>c'.
    rows = [(1, 1, "a>b"), (1, 2, "c"), (2, 1, "a"), (2, 2, "b>c")]
    df = spark.createDataFrame(rows, "u int, t int, s string")
    out = sequential_patterns(df, "u", ["t"], "s", k=2).collect()
    assert len(out) == 2  # two distinct rows, one per true sequence
    assert all(r["n_occurrences"] == 1 for r in out)
