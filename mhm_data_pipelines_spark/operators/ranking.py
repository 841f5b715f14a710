"""Bradley-Terry strength ratings from pairwise comparisons.

No reference counterpart (north-star LLM-pipeline extension): RLHF /
arena-style evaluation pipelines reduce to "here are millions of
pairwise preferences (A beat B); rate the items" — the Bradley-Terry
model is the standard answer (Chatbot-Arena-style leaderboards, reward
-model calibration checks, annotator-quality scoring). This is the
natural consumer of :mod:`.preferences`' pair builder.

Model: ``P(i beats j) = p_i / (p_i + p_j)``. Fitted by the classic MM
update (Hunter, "MM algorithms for generalized Bradley-Terry models",
Annals of Statistics 2004):

    ``p_i ← w_i / Σ_{j≠i} n_ij / (p_i + p_j)``

where ``w_i`` is item i's total wins and ``n_ij`` the number of
comparisons between i and j; ratings are then normalized to mean 1.

Scale shape (the part that matters at 100 TB of comparisons):

* The raw comparison stream is reduced ONCE by two hash aggregates —
  per-item wins ``w_i`` and per-unordered-pair counts ``n_ij``. Those
  tables are ``O(K)`` / ``O(K²)`` for K items (models, annotators,
  policies — thousands, not billions), so every MM iteration runs on
  the reduced tables only; the comparison stream is never re-scanned.
* Each iteration is one ``O(K²)`` join (ratings attach to both ends of
  the directed pair table — AQE broadcasts the K-row ratings side) and
  one hash aggregate; the mean for normalization is a single-row
  aggregate broadcast back. The driver loop is control flow only.
* Lineage is truncated per round with ``localCheckpoint`` (same
  discipline as :mod:`.graph` / :mod:`.components`) so ``iterations``
  rounds don't build an ``iterations``-deep plan over a K-row table.

Cross-engine float determinism: each iteration's per-item denominator
and the normalization mean are float sums in engine-arbitrary order,
so ratings are QUANTIZED to ``quantize`` decimals at the end of every
iteration — per-step ordering drift (~1e-15) is absorbed and both
engines enter the next iteration from bit-identical state. The DuckDB
oracle unrolls the identical recurrence (fixed iterations, same
quantization), so agreement is value-for-value.

Semantics notes: self-comparisons (i vs i) carry no information and
are dropped; an item appearing only as a loser gets rating 0 after one
iteration (w_i = 0) and stays there — the MM fixed point for a
never-winner; items never compared at all do not appear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bradley_terry"]


def bradley_terry(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iterations: int = 8,
    quantize: int = 9,
    driver_max_pairs: int = 2_000_000,
) -> DataFrame:
    """Fit Bradley-Terry ratings over ``(winner, loser)`` rows.

    Returns ``(item, rating)`` — ratings normalized to mean 1.0 and
    rounded to ``quantize`` decimals (the per-iteration quantization
    that makes the recurrence engine-reproducible; see module doc).

    ``iterations`` is a fixed count, not a convergence test — fixed
    plans are reproducible and externally verifiable; callers wanting
    convergence run a second pass and compare.

    Execution strategy: the distributed reductions always run on the
    cluster; the MM loop itself runs DRIVER-SIDE in numpy whenever the
    directed pair table fits ``driver_max_pairs`` (a K²-bounded
    metadata collect, same contract as ``pca.fit_pca``'s d² moments —
    K is items, not rows), because 2·iterations cluster jobs over a
    K-row table are pure scheduling latency. Above the bound the loop
    stays fully distributed (one checkpoint every other round). Both
    paths quantize identically per round, so they are value-identical
    and the oracle can't tell them apart.
    """
    wn, ls = winner_col, loser_col
    cmp = comparisons.filter(
        F.col(wn).isNotNull() & F.col(ls).isNotNull() & (F.col(wn) != F.col(ls))
    ).select(F.col(wn).alias("winner"), F.col(ls).alias("loser"))

    # One-pass reductions of the (possibly huge) comparison stream.
    wins = cmp.groupBy(F.col("winner").alias("item")).agg(
        F.count("*").alias("w")
    )
    und = (
        cmp.select(
            F.least("winner", "loser").alias("i"),
            F.greatest("winner", "loser").alias("j"),
        )
        .groupBy("i", "j")
        .agg(F.count("*").alias("n"))
    )
    directed = und.select(
        F.col("i").alias("item"), F.col("j").alias("other"), "n"
    ).unionAll(
        und.select(F.col("j").alias("item"), F.col("i").alias("other"), "n")
    )
    # K-row working set; checkpoint once so every iteration re-reads a
    # materialized table instead of re-deriving the reductions.
    directed = directed.localCheckpoint(eager=False)

    spark = comparisons.sparkSession
    n_pairs = directed.count()  # metadata-sized by the K contract
    if n_pairs <= driver_max_pairs:
        rows = directed.collect()  # bounded: <= driver_max_pairs rows
        wrows = {r["item"]: r["w"] for r in wins.collect()}  # K rows
        items = sorted({r["item"] for r in rows})
        idx = {it_: i for i, it_ in enumerate(items)}
        import numpy as np

        from pyspark.sql.types import (
            DoubleType,
            StructField,
            StructType,
        )

        item_type = directed.schema["item"].dataType
        schema = StructType(
            [
                StructField("item", item_type),
                StructField("rating", DoubleType()),
            ]
        )
        k = len(items)
        if k == 0:
            return spark.createDataFrame([], schema)
        nbr: list[list[tuple[int, int]]] = [[] for _ in range(k)]
        for r in rows:
            nbr[idx[r["item"]]].append((idx[r["other"]], r["n"]))
        w = np.array([float(wrows.get(it_, 0)) for it_ in items])
        p = np.ones(k)
        for _ in range(iterations):
            raw = np.empty(k)
            for i in range(k):
                denom = sum(n / (p[i] + p[j]) for j, n in nbr[i])
                raw[i] = w[i] / denom
            p = np.round(raw / raw.mean(), quantize)
        out = [(it_, float(p[idx[it_]])) for it_ in items]
        return spark.createDataFrame(out, schema)

    ratings = directed.select("item").distinct().withColumn("p", F.lit(1.0))

    for it in range(iterations):
        denom = (
            directed.join(ratings, "item")
            .join(
                ratings.select(
                    F.col("item").alias("other"), F.col("p").alias("p_other")
                ),
                "other",
            )
            .groupBy("item")
            .agg(
                F.sum(F.col("n") / (F.col("p") + F.col("p_other"))).alias(
                    "denom"
                )
            )
        )
        raw = denom.join(wins, "item", "left").select(
            "item",
            (
                F.coalesce(F.col("w"), F.lit(0)).cast("double")
                / F.col("denom")
            ).alias("r"),
        )
        mean = raw.agg(F.avg("r").alias("_mean"))
        ratings = raw.crossJoin(F.broadcast(mean)).select(
            "item",
            F.round(F.col("r") / F.col("_mean"), quantize).alias("p"),
        )
        # Truncate lineage every OTHER round: ratings feeds both join
        # sides, so an un-checkpointed round squares the plan — one
        # inline round (4 references to a K-row checkpoint scan) is
        # cheap, but 2^iterations is not. Checkpointing half as often
        # halves the per-iteration job-scheduling latency (the tables
        # are K-row; wall time here is driver rounds, not data).
        if it % 2 == 1 or it == iterations - 1:
            ratings = ratings.localCheckpoint(eager=True)
    return ratings.select("item", F.col("p").alias("rating"))
