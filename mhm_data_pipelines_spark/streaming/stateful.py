"""Custom stateful streaming operators (applyInPandasWithState).

Two capabilities the built-in streaming aggregates can't express, added
on top of the ingest layer (SURVEY §2.9):

* ``stateful_sessions`` — gap-based sessionization that EMITS A ROW PER
  CLOSED SESSION carrying arbitrary per-session aggregates
  (count/sum/duration). ``F.session_window`` can only grow windowed
  aggregates and re-emits under update mode; here a session row appears
  exactly once, the moment the gap (or the event-time timeout) closes
  it — the shape downstream training-data jobs want for "one example
  per session".
* ``dedup_stream`` — exactly-once keyed dedup across micro-batches
  bounded by a watermark (built-in ``dropDuplicatesWithinWatermark``,
  wrapped so batch and streaming twins share the call site).

Scale notes: state lives per group in the state store, partitioned by
the grouping key — the same hash partitioning a shuffle would use, so a
1000-executor cluster spreads sessions across the fleet with no
driver-side state. The per-batch work inside the UDF is vectorized
(numpy gap-split), not a per-row Python loop; per-key state is O(1)
(one open session tuple). Event-time timeout + watermark bound state
size for keys that go quiet.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
#: (start_us, last_us, n, sum_value) of the one open session per key.
_STATE_SCHEMA = "start bigint, last bigint, n bigint, sv double"


def _emit_row(uid: int, start_us: int, end_us: int, n: int, sv: float):
    return pd.DataFrame(
        {
            "user_id": [uid],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n],
            "sum_value": [sv],
        }
    )


def stateful_sessions(
    stream: DataFrame,
    ts: str = "ts",
    key: str = "user_id",
    value: str = "value",
    gap_minutes: float = 30.0,
    watermark: str = "1 day",
) -> DataFrame:
    """One output row per *closed* session: (key, start, end, n_events,
    sum_value). A session closes when a later event arrives past the gap,
    or when event time moves ``gap`` past its last event (timeout) — so
    dangling sessions flush once the watermark passes them, and state
    never outlives its key.

    The reference's batch sessionization (windows over lag(ts)) can't
    run incrementally; this is its streaming twin with identical
    session-boundary semantics (gap strictly greater than
    ``gap_minutes`` starts a new session).
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def fn(
        key_: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key_
        if state.hasTimedOut:
            start, last, n, sv = state.get
            state.remove()
            yield _emit_row(uid, start, last, n, sv)
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:  # pragma: no cover - defensive
            return
        pdf = pdf.sort_values(ts, kind="mergesort")
        ts_us = (pdf[ts].astype("int64") // 1000).to_numpy()
        vals = pdf[value].to_numpy(dtype="float64")
        carried: tuple[Any, ...] | None = state.get if state.exists else None
        # Vectorized split: a new session starts where the gap from the
        # previous event exceeds gap_us.
        new_session = np.empty(len(ts_us), dtype=bool)
        new_session[0] = (
            carried is None or ts_us[0] - carried[1] > gap_us
        )
        np.greater(np.diff(ts_us), gap_us, out=new_session[1:])
        seg = np.cumsum(new_session)  # 1-based segment ids
        if carried is not None and not new_session[0]:
            seg0_mask = seg == 1
            start = carried[0]
            n0 = carried[2] + int(seg0_mask.sum())
            sv0 = carried[3] + float(vals[seg0_mask].sum())
            merged0 = (start, int(ts_us[seg0_mask].max()), n0, sv0)
        else:
            merged0 = None
            if carried is not None:
                yield _emit_row(uid, carried[0], carried[1], carried[2], carried[3])
        n_segs = int(seg[-1])
        open_seg: tuple[int, int, int, float] | None = None
        for s in range(1, n_segs + 1):
            if s == 1 and merged0 is not None:
                summary = merged0
            else:
                m = seg == s
                summary = (
                    int(ts_us[m].min()),
                    int(ts_us[m].max()),
                    int(m.sum()),
                    float(vals[m].sum()),
                )
            if s == n_segs:
                open_seg = summary
            else:
                yield _emit_row(uid, *summary)
        assert open_seg is not None
        state.update(open_seg)
        # Flush the open session once event time passes last + gap.
        state.setTimeoutTimestamp(open_seg[1] // 1000 + gap_us // 1000)

    return (
        stream.withWatermark(ts, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "5 minutes",
    watermark: str = "1 day",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream interval join: pair each left event with the right
    events of the same key that occur at-or-after it, within
    ``max_delay`` (e.g. "errors within 5 minutes of a purchase").

    Both sides carry watermarks and the join condition bounds the event
    time range, so Spark can expire buffered state: each side's buffer
    holds at most ``watermark + max_delay`` of data per key — the
    requirement for an unbounded-stream join to run forever. Right
    columns come back ``right_prefix``-renamed (stream-stream joins
    forbid ambiguous references).
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    r = r.select([F.col(c).alias(f"{right_prefix}{c}") for c in r.columns])
    cond = (
        (F.col(key) == F.col(f"{right_prefix}{key}"))
        & (
            F.col(f"{right_prefix}{right_ts}")
            >= F.col(left_ts)
        )
        & (
            F.col(f"{right_prefix}{right_ts}")
            <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return l.join(r, cond, "inner")


def dedup_stream(
    stream: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup: first arrival of each key wins; duplicate
    arrivals within the watermark horizon are dropped. State is one
    entry per key, expired past the watermark — the streaming twin of
    operators.dedup.dedup_exact for the at-least-once-delivery case."""
    return stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
