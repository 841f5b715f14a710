"""Graph centrality over an edge DataFrame — weighted PageRank.

Training-data pipelines form graphs constantly: near-dup pair graphs
(``operators.dedup`` emitters), citation/link graphs shipped with web
corpora, event-transition graphs. Connected components
(``operators.components``) answers "which cluster"; PageRank answers
"which node matters" — used for corpus selection (keep the central
page of a near-dup cluster rather than the min-id one) and for
Markov-chain steady states over transition graphs.

Same iterative discipline as connected components: every round is ONE
shuffle keyed by the destination node (the same hash partitioning each
round, so AQE reuses the exchange layout), out-degree totals are
computed once up front, and lineage is truncated per round with
``localCheckpoint`` so ``iterations`` rounds don't build an
``iterations``-deep recursive plan. Ranks never leave the cluster —
the driver loop is control flow only.

Semantics (documented precisely so an external SQL oracle can unroll
them): nodes = distinct(src) ∪ distinct(dst);
``rank_0 = 1/N``;
``rank_{i+1}(v) = (1-d)/N + d * Σ_{(u,v) ∈ E} rank_i(u) * w(u,v) /
out_w(u)``.
Dangling nodes (no out-edges) contribute nothing — their mass leaks,
as in the original formulation without the dangling-mass
redistribution term; total rank therefore sums to ≤ 1. Self-loops are
legal and count toward out-weight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over a directed edge list.

    Returns ``(node, rank)`` for every node appearing as a source or a
    destination. ``weight`` (optional) is an edge-weight column —
    omitted, every edge weighs 1. ``iterations`` fixed rounds (no
    convergence test: a delta-based stop costs one extra aggregate per
    round; callers wanting it can compare successive calls).

    Scale shape: the per-round job is edges ⋈ ranks on the SOURCE key
    followed by a hash aggregate on the DESTINATION key — one shuffle
    per round on each side, both partitioned the same way every round.
    The edge list (with precomputed ``w / out_w``) is checkpointed once
    and reused; only the (node, rank) frame — one row per node —
    cycles through the loop.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    # Normalize once: each edge carries its share of the source's
    # out-weight, so the per-round join multiplies rank * share and
    # never re-aggregates degrees.
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    shares = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("share"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        inflow = (
            shares.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("share")).alias("in_rank"))
        )
        ranks = (
            nodes.join(inflow, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("in_rank", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
