"""Custom stateful streaming: applyInPandasWithState sessionization must
match the batch sessionization semantics; dropDuplicatesWithinWatermark
must match batch exact dedup."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.streaming.stateful import (
    dedup_stream,
    stateful_sessions,
)

DEC = 1735387200  # 2024-12-28 12:00 UTC
MIN = 60


def _events_parquet(spark, tmp_path, rows):
    """rows: (event_id, user_id, offset_seconds, value)."""
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "ts": [pd.Timestamp(DEC + r[2], unit="s") for r in rows],
            "value": [float(r[3]) for r in rows],
        }
    )
    path = tmp_path / "events_stream"
    path.mkdir(parents=True)
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
        str(path / "batch0")
    )
    return str(path)


def _stream(spark, path):
    schema = "event_id bigint, user_id bigint, ts timestamp, value double"
    return (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def _drain(writer, name):
    q = (
        writer.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_sessions_match_batch_semantics(spark, tmp_path):
    # user 1: three sessions (two closed by later data, one dangling);
    # user 2: one dangling session only.
    rows = [
        (1, 1, 0, 1.0),
        (2, 1, 5 * MIN, 2.0),          # session A: 2 events
        (3, 1, 60 * MIN, 4.0),         # gap 55m > 30m → closes A
        (4, 1, 70 * MIN, 8.0),         # session B: 2 events
        (5, 1, 200 * MIN, 16.0),       # closes B; session C dangling
        (6, 2, 0, 32.0),               # user 2: dangling only
    ]
    path = _events_parquet(spark, tmp_path, rows)
    out = stateful_sessions(_stream(spark, path), gap_minutes=30.0)
    _drain(out.writeStream, "sessions_out")
    got = {
        (r.user_id, str(r.session_start), r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # Closed sessions must be exactly A and B (dangling C / user-2 stay
    # in state: event time never advances past their timeout in this
    # single drained run).
    assert (1, "2024-12-28 12:00:00", 2, 3.0) in got
    assert (1, "2024-12-28 13:00:00", 2, 12.0) in got
    assert all(uid != 2 for uid, *_ in got)
    assert len(got) == 2


def test_stateful_sessions_timeout_flush(spark, tmp_path):
    """A second batch far in the future advances the watermark past the
    dangling session's timeout → it flushes exactly once."""
    path = _events_parquet(
        spark, tmp_path, [(1, 7, 0, 1.0), (2, 7, 5 * MIN, 2.0)]
    )
    out = stateful_sessions(
        _stream(spark, path), gap_minutes=30.0, watermark="10 minutes"
    )
    _drain(out.writeStream, "sessions_t1")
    assert spark.sql("SELECT * FROM sessions_t1").count() == 0

    # Late second file: another key's event two days on moves event time.
    pdf = pd.DataFrame(
        {
            "event_id": [99],
            "user_id": [8],
            "ts": [pd.Timestamp(DEC + 2 * 86400, unit="s")],
            "value": [0.0],
        }
    )
    import pathlib

    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(pathlib.Path(path) / "batch1")
    )
    # Fresh query over the same checkpoint-free memory sink: availableNow
    # re-reads both files; batch 2 carries the watermark forward and the
    # user-7 session times out.
    out2 = stateful_sessions(
        _stream(spark, path), gap_minutes=30.0, watermark="10 minutes"
    )
    q = (
        out2.writeStream.format("memory")
        .queryName("sessions_t2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_t2"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    flushed = [
        r
        for r in spark.sql("SELECT * FROM sessions_t2").collect()
        if r.user_id == 7
    ]
    assert len(flushed) == 1
    assert flushed[0].n_events == 2 and flushed[0].sum_value == 3.0


def test_stateful_sessions_out_of_order_across_batches(spark, tmp_path):
    """Late-but-within-watermark events must merge into the carried
    session without regressing session_end, and the carried span must
    bridge batch segments that sit further than the gap apart from each
    other (the carried events in between justify the merge)."""
    # Batch 0 → carried open session [12:00, 12:50], 3 events.
    path = _events_parquet(
        spark,
        tmp_path,
        [(1, 1, 0, 1.0), (2, 1, 25 * MIN, 2.0), (3, 1, 50 * MIN, 4.0)],
    )
    # Batch 1: a late event inside the carried span (12:10), an event
    # that only merges via the carried end (13:10 is 20m past 12:50 but
    # 60m past 12:10 — the old per-batch split would wrongly close it
    # off), and a far-future other-key event to advance the watermark so
    # the merged session flushes on timeout.
    import pathlib
    import time

    time.sleep(1.1)  # file-source orders batches by modification time
    pdf = pd.DataFrame(
        {
            "event_id": [10, 11, 99],
            "user_id": [1, 1, 8],
            "ts": [
                pd.Timestamp(DEC + 10 * MIN, unit="s"),
                pd.Timestamp(DEC + 70 * MIN, unit="s"),
                pd.Timestamp(DEC + 2 * 86400, unit="s"),
            ],
            "value": [8.0, 16.0, 0.0],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(pathlib.Path(path) / "batch1")
    )
    schema = "event_id bigint, user_id bigint, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)  # force true cross-batch state
        .parquet(path)
    )
    out = stateful_sessions(stream, gap_minutes=30.0, watermark="1 day")
    _drain(out.writeStream, "sessions_ooo")
    got = [
        (str(r.session_start), str(r.session_end), r.n_events, r.sum_value)
        for r in spark.sql(
            "SELECT * FROM sessions_ooo WHERE user_id = 1"
        ).collect()
    ]
    assert got == [("2024-12-28 12:00:00", "2024-12-28 13:10:00", 5, 31.0)]


def test_dedup_stream_first_arrival_wins(spark, tmp_path):
    rows = [
        (1, 1, 0, 1.0),
        (1, 1, 60, 1.0),   # duplicate event_id
        (2, 1, 120, 2.0),
        (2, 1, 120, 2.0),  # exact duplicate row
        (3, 2, 0, 3.0),
    ]
    path = _events_parquet(spark, tmp_path, rows)
    out = dedup_stream(_stream(spark, path), keys=("event_id",))
    _drain(out.writeStream, "dedup_out")
    got = spark.sql("SELECT * FROM dedup_out")
    assert got.count() == 3
    assert got.select("event_id").distinct().count() == 3
    batch = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(path)
        .dropDuplicates(["event_id"])
    )
    assert got.count() == batch.count()


def test_stateful_sessions_is_distributed(spark, tmp_path):
    """State partitions by the grouping key: the physical plan must show
    a stateful applyInPandasWithState over a hash exchange on user_id,
    not any driver-side collection."""
    path = _events_parquet(spark, tmp_path, [(1, 1, 0, 1.0)])
    plan = stateful_sessions(_stream(spark, path))._jdf.queryExecution().toString()
    assert "FlatMapGroupsInPandasWithState" in plan
    assert "user_id" in plan


def test_correlate_streams_matches_batch_join(spark, tmp_path):
    """Stream-stream interval join ≡ the equivalent batch join."""
    from mhm_data_pipelines_spark.streaming.stateful import correlate_streams

    purchases = [(1, 1, 0, 10.0), (2, 1, 10 * MIN, 20.0), (3, 2, 0, 5.0)]
    errors = [
        (50, 1, 2 * MIN, 0.0),    # within 5min of purchase 1
        (51, 1, 11 * MIN, 0.0),   # within 5min of purchase 2
        (52, 1, 30 * MIN, 0.0),   # matches nothing
        (53, 2, 3 * MIN, 0.0),    # within 5min of purchase 3
        (54, 3, 0, 0.0),          # different user
    ]
    lp = _events_parquet(spark, tmp_path / "l", purchases)
    rp = _events_parquet(spark, tmp_path / "r", errors)
    out = correlate_streams(
        _stream(spark, lp), _stream(spark, rp), max_delay="5 minutes"
    )
    _drain(out.writeStream, "corr_out")
    got = {
        (r.event_id, r.r_event_id)
        for r in spark.sql("SELECT * FROM corr_out").collect()
    }
    assert got == {(1, 50), (2, 51), (3, 53)}
    # batch twin
    import pyspark.sql.functions as F

    lb = spark.read.option("recursiveFileLookup", "true").parquet(lp)
    rb = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(rp)
        .select([F.col(c).alias(f"r_{c}") for c in ["event_id", "user_id", "ts", "value"]])
    )
    want = {
        (r.event_id, r.r_event_id)
        for r in lb.join(
            rb,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("r_ts") >= F.col("ts"))
            & (F.col("r_ts") <= F.col("ts") + F.expr("INTERVAL 5 minutes")),
        ).collect()
    }
    assert got == want


def test_neardup_stream_matches_against_growing_index(spark, tmp_path):
    """Two micro-batches of documents: batch 2 contains a near-copy of a
    batch-1 doc. With update_index, batch 1 seeds the index and batch 2
    matches against it; the match lands in the output parquet."""
    from mhm_data_pipelines_spark.streaming.stateful import neardup_stream

    base = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "running through the quiet field"
    )
    docs_path = tmp_path / "docs_stream"
    docs_path.mkdir()
    spark.createDataFrame(
        [(1, base), (2, "completely unrelated content about engines")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(docs_path / "b0"))

    index_path = str(tmp_path / "sig_index")
    out_path = str(tmp_path / "matches")
    ck = str(tmp_path / "ck_nd")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(docs_path))
    )

    def run():
        q = neardup_stream(
            stream, index_path, ck, out_path, threshold=0.5
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run()
    # index seeded with batch-1 signatures
    assert spark.read.parquet(index_path).count() == 2

    # second arrival: near-copy of doc 1 + a fresh doc
    spark.createDataFrame(
        [(3, base.replace("quick", "swift")), (4, "another new doc")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(docs_path / "b1"))
    run()

    matches = spark.read.parquet(out_path)
    got = {(r.id_new, r.id_index) for r in matches.collect()}
    assert (3, 1) in got
    assert all(b in (1, 2) for _, b in got)
    # index grew to cover both batches
    assert spark.read.parquet(index_path).count() == 4


def test_compact_signature_index_preserves_rows(spark, tmp_path):
    from mhm_data_pipelines_spark.operators.dedup import minhash_signatures
    from mhm_data_pipelines_spark.streaming.stateful import (
        compact_signature_index,
    )

    index = str(tmp_path / "sigidx")
    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared words") for i in range(8)],
        "doc_id long, text string",
    )
    for b in range(3):
        sigs = minhash_signatures(
            docs.filter(F.col("doc_id") % 3 == b), num_hashes=16
        )
        sigs.write.parquet(f"{index}/batch_id={b}")
    before = {
        (r.doc_id, tuple(r.signature))
        for r in spark.read.parquet(index).collect()
    }
    retired = compact_signature_index(spark, index, target_files=2)
    assert retired == 3
    after_df = spark.read.parquet(index)
    after = {
        (r.doc_id, tuple(r.signature)) for r in after_df.collect()
    }
    assert after == before
    assert set(after_df.select("batch_id").distinct().toPandas().batch_id) == {-1}
    # a post-compaction stream append coexists with the compacted epoch
    minhash_signatures(docs.limit(1), num_hashes=16).write.parquet(
        f"{index}/batch_id=7"
    )
    assert spark.read.parquet(index).count() == len(before) + 1


class TestHoltStream:
    def _drain(self, spark, stream, name, max_files=None):
        from mhm_data_pipelines_spark.streaming.stateful import (
            holt_stream,
        )

        out = holt_stream(stream)
        w = out.writeStream.format("memory").queryName(name).outputMode(
            "append"
        ).trigger(availableNow=True)
        q = w.start()
        q.awaitTermination(120)
        return spark.table(name)

    def test_single_batch_matches_batch_operator(self, spark, tmp_path):
        from mhm_data_pipelines_spark.operators.timeseries import (
            holt_trend,
        )

        rows = [
            (i, 1 + i % 2, i * MIN, float((i * 13) % 7) + 0.5 * i)
            for i in range(30)
        ]
        path = _events_parquet(spark, tmp_path, rows)
        got = {
            r["user_id"]: r.asDict()
            for r in self._drain(
                spark, _stream(spark, path), "_holt_single"
            ).collect()
        }
        batch_df = spark.read.option(
            "recursiveFileLookup", "true"
        ).parquet(path)
        want = {
            int(r["u"]): r.asDict()
            for r in holt_trend(
                batch_df, "user_id", "ts", "value"
            )
            .withColumnRenamed("user_id", "u")
            .collect()
        }
        assert set(got) == set(want)
        for u in got:
            assert got[u]["n_points"] == want[u]["n_points"]
            # batch operator rounds 6dp; stream emits raw state
            assert round(got[u]["level"], 6) == want[u]["level"]
            assert round(got[u]["trend"], 6) == want[u]["trend"]

    def test_batch_split_is_bit_invariant(self, spark, tmp_path):
        import pandas as pd

        from mhm_data_pipelines_spark.streaming.stateful import (
            holt_stream,
        )

        # same series split across three files, drained one file per
        # micro-batch -> final state must be BIT-equal to one batch
        xs = [float((i * 7) % 11) + 0.25 * i for i in range(24)]
        path = tmp_path / "split"
        path.mkdir()
        for b in range(3):
            pdf = pd.DataFrame(
                {
                    "event_id": list(range(b * 8, b * 8 + 8)),
                    "user_id": [1] * 8,
                    "ts": [
                        pd.Timestamp(DEC + i * MIN, unit="s")
                        for i in range(b * 8, b * 8 + 8)
                    ],
                    "value": xs[b * 8 : b * 8 + 8],
                }
            )
            spark.createDataFrame(pdf).coalesce(1).write.parquet(
                str(path / f"b{b}")
            )
        stream = (
            spark.readStream.schema(
                "event_id bigint, user_id bigint, ts timestamp, "
                "value double"
            )
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(path))
        )
        out = holt_stream(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("_holt_split")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table("_holt_split").orderBy("n_points").collect()
        assert rows[-1]["n_points"] == 24
        # python replay with the exact float tree
        a, g = 0.5, 0.3
        s, b = xs[0], xs[1] - xs[0]
        for t in range(1, len(xs)):
            s_new = a * xs[t] + (1.0 - a) * (s + b)
            b = g * (s_new - s) + (1.0 - g) * b
            s = s_new
        assert rows[-1]["level"] == s      # bit-equal, no rounding
        assert rows[-1]["trend"] == b

    def test_null_values_skipped_and_guard(self, spark, tmp_path):
        import pytest as _pt

        from mhm_data_pipelines_spark.streaming.stateful import (
            holt_stream,
        )

        rows = [(0, 1, 0, 5.0)]
        path = _events_parquet(spark, tmp_path, rows)
        got = self._drain(
            spark, _stream(spark, path), "_holt_null"
        ).collect()
        assert got[0]["n_points"] == 1 and got[0]["trend"] == 0.0
        with _pt.raises(ValueError, match="alpha"):
            holt_stream(_stream(spark, path), alpha=0.0)


class TestEwmaAnomalyStream:
    def _drain(self, spark, stream, name, **kw):
        from mhm_data_pipelines_spark.streaming.stateful import (
            ewma_anomaly_stream,
        )

        out = ewma_anomaly_stream(stream, **kw)
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.table(name)

    @staticmethod
    def _replay(xs, a=0.25, th=3.0):
        n, m, v, k = 0, 0.0, 0.0, 0
        for x in xs:
            if n == 0:
                m, v, n = x, 0.0, 1
                continue
            d = x - m
            if v > 0.0 and d * d > th * th * v:
                k += 1
            m = m + a * d
            v = (1.0 - a) * (v + a * d * d)
            n += 1
        return n, m, v, k

    def test_matches_python_replay_and_flags_spike(
        self, spark, tmp_path
    ):
        xs = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 60.0, 10.0, 9.9]
        rows = [(i, 1, i * MIN, x) for i, x in enumerate(xs)]
        path = _events_parquet(spark, tmp_path, rows)
        got = self._drain(
            spark, _stream(spark, path), "_ewma_anom_single"
        ).collect()
        latest = max(got, key=lambda r: r.n_points)
        n, m, v, k = self._replay(xs)
        assert latest.n_points == n
        assert latest.mean == m
        assert latest["var"] == v
        assert latest.n_anomalies == k
        assert k >= 1  # the 60.0 spike must be flagged

    def test_batch_split_is_bit_invariant(self, spark, tmp_path):
        import pandas as pd

        xs = [float((i * 7) % 11) + 0.25 * i for i in range(24)]
        path = tmp_path / "ewma_split"
        path.mkdir()
        for b in range(3):
            chunk = xs[b * 8 : (b + 1) * 8]
            pdf = pd.DataFrame(
                {
                    "event_id": [b * 8 + i for i in range(8)],
                    "user_id": [1] * 8,
                    "ts": [
                        pd.Timestamp(DEC + (b * 8 + i) * MIN, unit="s")
                        for i in range(8)
                    ],
                    "value": chunk,
                }
            )
            spark.createDataFrame(pdf).coalesce(1).write.parquet(
                str(path / f"b{b}")
            )
        stream = (
            spark.readStream.schema(
                "event_id bigint, user_id bigint, ts timestamp,"
                " value double"
            )
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(path))
        )
        got = self._drain(spark, stream, "_ewma_anom_split").collect()
        latest = max(got, key=lambda r: r.n_points)
        n, m, v, k = self._replay(xs)
        assert latest.n_points == n
        assert latest.mean == m  # bit-equal, no tolerance
        assert latest["var"] == v
        assert latest.n_anomalies == k

    def test_guards(self, spark, tmp_path):
        from mhm_data_pipelines_spark.streaming.stateful import (
            ewma_anomaly_stream,
        )

        rows = [(0, 1, 0, 1.0)]
        path = _events_parquet(spark, tmp_path, rows)
        with pytest.raises(ValueError, match="alpha"):
            ewma_anomaly_stream(_stream(spark, path), alpha=0.0)
        with pytest.raises(ValueError, match="threshold"):
            ewma_anomaly_stream(_stream(spark, path), threshold=0.0)
