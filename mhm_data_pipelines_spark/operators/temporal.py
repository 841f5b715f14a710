"""Temporal joins Spark lacks as builtins: as-of join (latest right row
at-or-before each left row's timestamp).

No reference counterpart (the reference correlates streams only by
shared calendar buckets); this is the canonical sensor-fusion primitive
for the domain — e.g. attach the most recent device-status reading to
every symptom report.

Scale design: the naive formulation is an inequality join (left.ts >=
right.ts) — a range join that explodes to |L|×|R| per key before
aggregation. This implementation instead UNIONS the two sides, sorts by
(key, ts) once, and propagates the last-seen right payload with
``last(..., ignorenulls=True)`` over an unbounded-preceding window:
**one shuffle of |L|+|R| rows, zero join fan-out**, skew bounded by the
hottest key like any windowed op (salt via operators.skew if needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket: str = "1 hour",
) -> DataFrame:
    """All (point, interval) pairs with ``start ≤ point_ts ≤ end`` within
    the same key — the point-in-interval range join.

    A naive inequality join degenerates to a per-key cross product
    (Catalyst can only plan it as BroadcastNestedLoop / cartesian +
    filter). This implementation quantizes time into ``bucket``-sized
    cells: each interval is exploded to the cells it overlaps, each point
    maps to exactly one cell, and the join becomes an **equi-join on
    (key, cell)** — shuffle-partitioned, AQE-skew-splittable — followed
    by the exact range filter. Each qualifying pair appears exactly once
    (a point's single cell occurs once per interval). Choose ``bucket``
    near the typical interval length: fan-out per interval ≈
    length/bucket + 1.
    """
    cell = F.expr(f"INTERVAL {bucket}")
    p_cell = F.unix_micros(F.col(point_ts)) - (
        F.unix_micros(F.col(point_ts))
        % F.unix_micros(F.to_timestamp(F.lit("1970-01-01")) + cell)
    )
    cell_us = F.unix_micros(F.to_timestamp(F.lit("1970-01-01")) + cell)
    i_cells = F.sequence(
        F.unix_micros(F.col(start_col)) - (F.unix_micros(F.col(start_col)) % cell_us),
        F.unix_micros(F.col(end_col)) - (F.unix_micros(F.col(end_col)) % cell_us),
        cell_us,
    )
    p = points.withColumn("_cell", p_cell)
    i = intervals.withColumn("_cell", F.explode(i_cells))
    joined = p.join(i, [*on, "_cell"]).drop("_cell")
    return joined.filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """For every ``left`` row, attach the ``right`` row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``on`` key (NULLs when no
    prior right row exists) — semantics of DuckDB/pandas ASOF JOIN
    (backward direction).

    ``right_cols``: right payload columns to carry (default: all except
    keys + timestamp), returned with an ``asof_`` prefix plus
    ``asof_ts``. ``tolerance`` (an INTERVAL literal like ``'2 days'``)
    drops matches older than ``left_ts - tolerance``.

    Ties on equal timestamps: the right row *at* the left timestamp
    matches (>= semantics); among right rows with identical (key, ts)
    the last by sort order wins (deterministic input ordering is the
    caller's contract, as in pandas merge_asof).
    """
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (*on, right_ts)
        ]

    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("asof_ts"),
                    *[F.col(c).alias(f"asof_{c}") for c in right_cols],
                ).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("_r"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("_l"),
        F.struct(
            F.col(right_ts).alias("asof_ts"),
            *[F.col(c).alias(f"asof_{c}") for c in right_cols],
        ).alias("_r"),
    )

    # Right rows sort before left rows at the same timestamp (_is_left
    # ascending) so a right row AT left_ts is visible to that left row.
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_last_r", F.last("_r", ignorenulls=True).over(w)
    )

    out = carried.filter(F.col("_is_left") == 1)
    match = F.col("_last_r")
    if tolerance is not None:
        match = F.when(
            F.col("_last_r.asof_ts")
            >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}"),
            F.col("_last_r"),
        )
    return out.select(
        F.col("_l.*"),
        match.alias("_m"),
    ).select(
        *[c for c in left.columns],
        F.col("_m.asof_ts").alias("asof_ts"),
        *[F.col(f"_m.asof_{c}").alias(f"asof_{c}") for c in right_cols],
    )


def interval_concurrency(
    intervals: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    keys: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Sweep-line peak-overlap: how many intervals are open at once —
    the concurrency question (peak concurrent sessions / devices /
    jobs) that a naive self-join answers in O(n²). Half-open
    ``[start, end)`` semantics: an interval closing at t does not
    overlap one opening at t (at equal timestamps −1 boundaries sort
    before +1, so touching intervals never count as concurrent, and
    zero-length intervals contribute nothing).

    Returns, per key group (or one global row when ``keys`` is None):
    ``(keys…, n_intervals, peak_concurrency, peak_at_us)`` —
    ``peak_at_us`` = the EARLIEST boundary (epoch µs) where the peak
    is reached. Rows with a NULL endpoint or ``end < start`` are
    dropped (an unbounded or negative interval has no sweep
    semantics). ``tiebreak_cols`` complete the boundary total order —
    they change nothing about the counts (same-timestamp boundaries
    commute within a delta sign) but make the sweep replayable
    row-for-row by an external oracle. On the GLOBAL path (no keys)
    tiebreak columns must be NON-NULL: they become range-bucket
    boundary keys in ``budget.running_total``, whose comparisons are
    null-poisoned by contract — coalesce to a sentinel first (the
    keyed window path tolerates NULLs).

    Scale shape: boundaries = a 2×n explode (pure projection). Keyed:
    ONE window partitioned by the keys. Global: the two-phase
    distributed literal-boundary prefix sum (``budget.running_total``)
    — no single-task window. The peak + its earliest time come from
    ONE aggregate (lexicographic max over (running, −t)).
    """
    keys = list(keys or [])
    tb = list(tiebreak_cols or [])
    iv = intervals.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
    )
    base = [
        *[F.col(c) for c in keys],
        *[F.col(c) for c in tb],
    ]
    starts = iv.select(
        *base,
        F.unix_micros(F.col(start_col)).alias("t_us"),
        F.lit(1).alias("delta"),
    )
    ends = iv.select(
        *base,
        F.unix_micros(F.col(end_col)).alias("t_us"),
        F.lit(-1).alias("delta"),
    )
    bounds = starts.unionByName(ends)
    order = [F.col("t_us").asc(), F.col("delta").asc()] + [
        F.col(c).asc() for c in tb
    ]
    if keys:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        run = bounds.withColumn("running", F.sum("delta").over(w))
        grouped = run.groupBy(*keys)
    else:
        from mhm_data_pipelines_spark.operators.budget import (
            running_total,
        )

        run = running_total(
            bounds,
            order_by=["t_us", "delta", *tb],
            value_col="delta",
            out_col="running",
        )
        grouped = run.groupBy()
    peak = F.max(
        F.struct(
            F.col("running").alias("c"),
            (-F.col("t_us")).alias("neg_t"),
        )
    ).alias("pk")
    out = grouped.agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
        peak,
    )
    return out.select(
        *keys,
        "n_intervals",
        F.col("pk.c").cast("long").alias("peak_concurrency"),
        (-F.col("pk.neg_t")).cast("long").alias("peak_at_us"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_id: str,
    right_id: str,
    l_start: str = "start_ts",
    l_end: str = "end_ts",
    r_start: str = "start_ts",
    r_end: str = "end_ts",
    bucket: str = "1 hour",
) -> DataFrame:
    """Interval×interval overlap join with overlap duration — the
    "time-in-state" join (user sessions × experiment windows, device
    uptime × incident windows): all key-matched pairs whose CLOSED
    intervals intersect, with the intersection bounds and length.

    Same cell-quantization strategy as :func:`range_join` (a naive
    ``l_start <= r_end AND r_start <= l_end`` join plans as a per-key
    cross product): BOTH sides explode to the cells they span and the
    join is an equi-join on (key, cell). A pair sharing many cells
    would emit once per shared cell, so the exact filter keeps ONLY
    the cell containing ``greatest(l_start, r_start)`` — the first
    overlapping cell, which both sides provably span — making each
    qualifying pair appear exactly once, dedup-free.

    Returns ``on + (left_id, right_id, overlap_start, overlap_end,
    overlap_s)``. Fan-out per interval ≈ length/bucket + 1: choose
    ``bucket`` near the typical interval length.
    """
    cell_us = F.unix_micros(
        F.to_timestamp(F.lit("1970-01-01")) + F.expr(f"INTERVAL {bucket}")
    )

    def cells(s, e):
        return F.sequence(
            F.unix_micros(F.col(s)) - (F.unix_micros(F.col(s)) % cell_us),
            F.unix_micros(F.col(e)) - (F.unix_micros(F.col(e)) % cell_us),
            cell_us,
        )

    lhs = left.select(
        *on,
        F.col(left_id).alias("_lid"),
        F.col(l_start).alias("_ls"),
        F.col(l_end).alias("_le"),
    ).withColumn("_cell", F.explode(cells("_ls", "_le")))
    rhs = right.select(
        *on,
        F.col(right_id).alias("_rid"),
        F.col(r_start).alias("_rs"),
        F.col(r_end).alias("_re"),
    ).withColumn("_cell", F.explode(cells("_rs", "_re")))
    o_start = F.greatest(F.col("_ls"), F.col("_rs"))
    o_end = F.least(F.col("_le"), F.col("_re"))
    anchor = F.unix_micros(o_start) - (
        F.unix_micros(o_start) % cell_us
    )
    return (
        lhs.join(rhs, [*on, "_cell"])
        .filter((o_start <= o_end) & (F.col("_cell") == anchor))
        .select(
            *on,
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            o_start.alias("overlap_start"),
            o_end.alias("overlap_end"),
            (
                (
                    F.unix_micros(o_end) - F.unix_micros(o_start)
                ).cast("double")
                / F.lit(1e6)
            ).alias("overlap_s"),
        )
    )
