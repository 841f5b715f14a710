"""as-of join vs a naive per-row maximum (and vs pandas merge_asof
semantics for ties/missing)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),
            (1, _ts("2024-01-01T12:00:00"), "b"),
            (1, _ts("2024-01-01T09:00:00"), "pre"),
            (2, _ts("2024-01-02T00:00:00"), "c"),
            (3, _ts("2024-01-01T00:00:00"), "nomatch"),
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 10.0),
            (1, _ts("2024-01-01T11:00:00"), 20.0),
            (1, _ts("2024-01-01T12:00:00"), 30.0),  # equal-ts match for "b"
            (2, _ts("2024-01-01T00:00:00"), 40.0),
        ],
        "k long, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_semantics(sides):
    left, right = sides
    got = {
        (r.k, r.tag): (r.asof_ts, r.asof_v)
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert got[(1, "a")] == (_ts("2024-01-01T09:30:00"), 10.0)
    assert got[(1, "b")] == (_ts("2024-01-01T12:00:00"), 30.0)  # >= tie
    assert got[(1, "pre")] == (None, None)  # no prior right row
    assert got[(2, "c")] == (_ts("2024-01-01T00:00:00"), 40.0)
    assert got[(3, "nomatch")] == (None, None)  # key absent on right


def test_asof_tolerance(sides):
    left, right = sides
    got = {
        (r.k, r.tag): r.asof_v
        for r in asof_join(
            left, right, on=["k"], tolerance="2 HOURS"
        ).collect()
    }
    assert got[(1, "a")] == 10.0
    assert got[(2, "c")] is None  # match is 24h old > 2h tolerance


def test_asof_matches_naive_on_events(spark):
    """Property check on generated data: window formulation ==
    naive groupBy-max formulation."""
    ev = spark.range(500).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.col("id") * 37 % 10007).alias("ts"),
        (F.col("id") * 13 % 101).cast("double").alias("v"),
    )
    left = ev.filter(F.col("v") < 50).select("k", "ts")
    right = ev.filter(F.col("v") >= 50).select("k", "ts", "v")

    got = asof_join(left, right, on=["k"]).select("k", "ts", "asof_ts", "asof_v")

    naive = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k")) & (F.col("l.ts") >= F.col("r.ts")),
            "left",
        )
        .groupBy(F.col("l.k").alias("k"), F.col("l.ts").alias("ts"))
        .agg(
            F.max(F.col("r.ts")).alias("asof_ts"),
            F.max_by(F.col("r.v"), F.col("r.ts")).alias("asof_v"),
        )
    )
    g = {(r.k, r.ts): (r.asof_ts, r.asof_v) for r in got.collect()}
    n = {(r.k, r.ts): (r.asof_ts, r.asof_v) for r in naive.collect()}
    assert set(g) == set(n)
    for key in n:
        assert g[key][0] == n[key][0]
        # equal right-ts duplicates: any of the tied v values is valid
        if g[key][1] != n[key][1]:
            assert g[key][0] is not None


def test_range_join_equals_naive(spark):
    from mhm_data_pipelines_spark.operators.temporal import range_join

    ev = spark.range(400).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 97 % 50000).alias("ts"),
        F.col("id").alias("pid"),
    )
    iv = spark.range(60).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 731 % 48000).alias("start_ts"),
        F.timestamp_seconds(F.col("id") * 731 % 48000 + 3600 * (1 + F.col("id") % 3)).alias("end_ts"),
        F.col("id").alias("iid"),
    )
    got = range_join(ev, iv, on=["k"], bucket="30 minutes").select("pid", "iid")
    naive = (
        ev.alias("p")
        .join(
            iv.alias("i"),
            (F.col("p.k") == F.col("i.k"))
            & (F.col("p.ts") >= F.col("i.start_ts"))
            & (F.col("p.ts") <= F.col("i.end_ts")),
        )
        .select("pid", "iid")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


# --------------------------------------------------- interval sweep


def _iv_df(spark, rows, schema="k string, s timestamp, e timestamp"):
    return spark.createDataFrame(rows, schema)


def test_concurrency_basic_overlap(spark):
    from datetime import datetime as dt

    from mhm_data_pipelines_spark.operators.temporal import (
        interval_concurrency,
    )

    rows = [
        ("a", dt(2024, 1, 1, 0), dt(2024, 1, 1, 2)),
        ("a", dt(2024, 1, 1, 1), dt(2024, 1, 1, 3)),   # overlaps 1st
        ("a", dt(2024, 1, 1, 10), dt(2024, 1, 1, 11)),  # lone
    ]
    out = interval_concurrency(
        _iv_df(spark, rows), "s", "e", keys=["k"]
    ).collect()[0]
    assert out["n_intervals"] == 3
    assert out["peak_concurrency"] == 2
    # peak first reached when the 2nd interval opens (01:00)
    from datetime import timezone

    assert out["peak_at_us"] == int(
        dt(2024, 1, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000
    )


def test_concurrency_touching_intervals_do_not_overlap(spark):
    from datetime import datetime as dt

    from mhm_data_pipelines_spark.operators.temporal import (
        interval_concurrency,
    )

    rows = [
        ("a", dt(2024, 1, 1, 0), dt(2024, 1, 1, 1)),
        ("a", dt(2024, 1, 1, 1), dt(2024, 1, 1, 2)),  # starts as 1st ends
    ]
    out = interval_concurrency(
        _iv_df(spark, rows), "s", "e", keys=["k"]
    ).collect()[0]
    assert out["peak_concurrency"] == 1  # half-open: no overlap


def test_concurrency_global_distributed_path(spark):
    from datetime import datetime as dt

    from mhm_data_pipelines_spark.operators.temporal import (
        interval_concurrency,
    )

    # 50 nested intervals -> peak 50 at the innermost start.
    rows = [
        ("x", dt(2024, 1, 1, 0, i), dt(2024, 1, 1, 10, 59 - i))
        for i in range(50)
    ]
    out = interval_concurrency(_iv_df(spark, rows), "s", "e").collect()[0]
    assert out["n_intervals"] == 50
    assert out["peak_concurrency"] == 50
    assert "k" not in out.asDict()


def test_concurrency_null_and_inverted_dropped(spark):
    from datetime import datetime as dt

    from mhm_data_pipelines_spark.operators.temporal import (
        interval_concurrency,
    )

    rows = [
        ("a", dt(2024, 1, 1, 0), dt(2024, 1, 1, 2)),
        ("a", None, dt(2024, 1, 1, 2)),
        ("a", dt(2024, 1, 1, 3), dt(2024, 1, 1, 1)),  # inverted
    ]
    out = interval_concurrency(
        _iv_df(spark, rows), "s", "e", keys=["k"]
    ).collect()[0]
    assert out["n_intervals"] == 1 and out["peak_concurrency"] == 1


class TestIntervalOverlapJoin:
    def _df(self, spark, rows):
        import datetime as dt

        t0 = dt.datetime(2025, 1, 1)
        data = [
            (k, i, t0 + dt.timedelta(hours=s), t0 + dt.timedelta(hours=e))
            for (k, i, s, e) in rows
        ]
        return spark.createDataFrame(
            data, "k string, iid long, start_ts timestamp, end_ts timestamp"
        )

    def test_overlap_duration_and_dedup(self, spark):
        from mhm_data_pipelines_spark.operators.temporal import (
            interval_overlap_join,
        )

        left = self._df(spark, [("u", 1, 0, 10)])   # 00:00-10:00
        right = self._df(spark, [("u", 2, 4, 12)])  # 04:00-12:00
        out = interval_overlap_join(
            left, right, ["k"], "iid", "iid", bucket="1 hour"
        ).collect()
        # 6 shared cells but exactly ONE result row
        assert len(out) == 1
        r = out[0]
        assert r.overlap_s == pytest.approx(6 * 3600.0)

    def test_disjoint_and_touching(self, spark):
        from mhm_data_pipelines_spark.operators.temporal import (
            interval_overlap_join,
        )

        left = self._df(spark, [("u", 1, 0, 2)])
        right = self._df(
            spark, [("u", 2, 3, 4), ("u", 3, 2, 5), ("v", 4, 0, 2)]
        )
        out = {
            r.iid_r: r
            for r in interval_overlap_join(
                left,
                right.withColumnRenamed("iid", "iid_r"),
                ["k"],
                "iid",
                "iid_r",
            ).collect()
        }
        assert 2 not in out        # disjoint
        assert 4 not in out        # different key
        assert out[3].overlap_s == pytest.approx(0.0)  # touching, closed
