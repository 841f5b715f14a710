"""Planar spatial joins via grid-cell blocking.

No reference counterpart (north-star extension): proximity joins —
"which candidate points lie within r of each query point" — appear the
moment any table carries coordinates (site locations, sensor
positions, embedding-plane projections). The naive formulation is a
cross join with a distance predicate; Spark plans that as a
BroadcastNestedLoopJoin/cartesian, which is exactly the shape this
engine bans at scale.

The standard fix (same family as the LSH bucket joins in ``dedup`` and
the value-bucketed ``temporal.range_join``): snap points to a square
grid with cell size = the search radius. Any pair within ``r`` is then
guaranteed to sit in the SAME or an ADJACENT cell, so candidate
generation is an EQUI-join on cell id over the left side exploded to
its 3x3 cell neighborhood (a literal 9-element array — constant
fan-out, no data-dependent blow-up), followed by the exact distance
filter. Shuffle is by cell id; skew follows point density, and a
``cell_cap`` drops pathological cells loudly (the hot-bucket
discipline used across this package — documented recall trade).

Euclidean on a plane: callers with lon/lat project first (note in the
registry query); great-circle correctness at the poles is out of
scope for the blocking pattern being certified here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grid_radius_join", "radius_neighbor_counts"]


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    left_id: str = "id",
    right_id: str = "id",
    x: str = "x",
    y: str = "y",
    cell_cap: int | None = None,
) -> DataFrame:
    """All pairs (left, right) within euclidean ``radius``:
    ``(left_id, right_id, dist)``.

    Left points explode to their 3x3 grid neighborhood (9 literal
    offsets); right points hash to their own cell only — one
    equi-join on cell id, then the exact ``dist <= radius`` filter.
    Candidate cost is bounded by 9·|left| + per-cell density; with
    ``cell_cap`` set, right-side cells holding more than ``cell_cap``
    points are dropped (count-based prune BEFORE the join — same
    loud-cap semantics as dedup's LSH buckets; results then
    under-report around degenerate density spikes, documented here).

    Self-join note: pass the same frame twice and filter
    ``left_id < right_id`` on the result for unordered pairs.

    At 100 TB: emitting all pairs is output-bound by nature — compose
    :func:`radius_neighbor_counts` (or aggregate downstream) when the
    decision only needs per-point neighborhood summaries.
    """
    if radius <= 0:
        raise ValueError(f"radius must be > 0, got {radius}")
    r = float(radius)
    lcx = F.floor(F.col(x) / r).cast("long")
    lcy = F.floor(F.col(y) / r).cast("long")
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    lhs = (
        left.select(
            F.col(left_id).alias("_lid"),
            F.col(x).cast("double").alias("_lx"),
            F.col(y).cast("double").alias("_ly"),
            lcx.alias("_cx"),
            lcy.alias("_cy"),
        )
        .withColumn("_o", F.explode(offsets))
        .select(
            "_lid",
            "_lx",
            "_ly",
            (F.col("_cx") + F.col("_o.ox")).alias("_cx"),
            (F.col("_cy") + F.col("_o.oy")).alias("_cy"),
        )
    )
    rhs = right.select(
        F.col(right_id).alias("_rid"),
        F.col(x).cast("double").alias("_rx"),
        F.col(y).cast("double").alias("_ry"),
        lcx.alias("_cx"),
        lcy.alias("_cy"),
    )
    if cell_cap is not None:
        ok = (
            rhs.groupBy("_cx", "_cy")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= int(cell_cap))
            .select("_cx", "_cy")
        )
        rhs = rhs.join(ok, ["_cx", "_cy"])
    dist = F.sqrt(
        (F.col("_lx") - F.col("_rx")) * (F.col("_lx") - F.col("_rx"))
        + (F.col("_ly") - F.col("_ry")) * (F.col("_ly") - F.col("_ry"))
    )
    return (
        lhs.join(rhs, ["_cx", "_cy"])
        .select(
            F.col("_lid").alias("left_id"),
            F.col("_rid").alias("right_id"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") <= r)
    )


def radius_neighbor_counts(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    left_id: str = "id",
    right_id: str = "id",
    x: str = "x",
    y: str = "y",
    cell_cap: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-left-point neighborhood summary — the aggregate-not-emit
    production path over :func:`grid_radius_join`: ``(left_id,
    n_neighbors, min_dist)``. Left points with ZERO in-radius
    neighbors are absent (compose a left join against the left table
    for a dense readout)."""
    pairs = grid_radius_join(
        left,
        right,
        radius,
        left_id=left_id,
        right_id=right_id,
        x=x,
        y=y,
        cell_cap=cell_cap,
    )
    return pairs.groupBy("left_id").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.round(F.min("dist"), round_to).alias("min_dist"),
    )
