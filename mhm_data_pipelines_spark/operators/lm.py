"""Smoothed n-gram language-model scoring (interpolated Kneser-Ney).

The CCNet pipeline (Wenzek et al. 2020) filters web text by perplexity
under a smoothed 5-gram KenLM (Heafield 2011); the repo's earlier
``doc_lm_score`` / ``doc_bigram_lm`` stop at MLE estimates, which
assign unsmoothed probabilities and cannot score data disjoint from
the training corpus. This module adds the standard industrial scorer
in closed form: interpolated Kneser-Ney (Kneser & Ney 1995; Chen &
Goodman 1999 eq. 4.25) over bigrams —

    P_KN(w2 | w1) = max(c(w1 w2) - D, 0) / c(w1)
                    + D * N1+(w1 *) / c(w1) * P_cont(w2)
    P_cont(w2)    = N1+(* w2) / B

with discount ``D`` (0.75 classic), ``N1+(w1 *)`` = distinct followers
of ``w1``, ``N1+(* w2)`` = distinct predecessors of ``w2``, and ``B``
= distinct bigram types. Every quantity is a COUNT — the whole model
trains in one corpus pass (explode + stacked hash aggregates), and the
closed form means a DuckDB twin can replay it value-for-value, unlike
a binary KenLM artifact.

No reference counterpart (north-star extension per BASELINE.json).

Scale shape: training is one explode + one (w1,w2) hash aggregate,
from which the three marginals derive by re-aggregation of the COUNT
TABLE (vocabulary-sized, orders of magnitude smaller than the corpus
— never a second corpus pass). Scoring re-exploded documents joins
the AQE-sized count tables back; the only broadcast is the 1-row
bigram-type total. Nothing here is quadratic and no Python runs in
the row loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bigrams(df: DataFrame, id_cols: list[str], tokens_col: str) -> DataFrame:
    """Explode a token-array column to (id_cols..., w1, w2) bigram rows
    (documents with < 2 tokens contribute none)."""
    bg = F.expr(
        f"transform(sequence(0, size({tokens_col}) - 2), "
        f"i -> struct({tokens_col}[i] AS w1, {tokens_col}[i + 1] AS w2))"
    )
    return (
        df.filter(F.size(tokens_col) >= 2)
        .select(*id_cols, F.explode(bg).alias("_bg"))
        .select(*id_cols, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    )


def kn_bigram_counts(train: DataFrame, tokens_col: str = "tk") -> dict:
    """Train the KN count tables from a token-array frame. Returns a
    dict of four frames — ``bigram (w1, w2, c12)``, ``context (w1, c1,
    n1r)``, ``continuation (w2, n1l)``, ``total (_b)`` 1-row — all
    derived from the ONE (w1, w2) aggregate, so training is a single
    corpus pass regardless of corpus size."""
    big = _bigrams(train, [], tokens_col)
    bigram = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    context = bigram.groupBy("w1").agg(
        F.sum("c12").cast("double").alias("c1"),
        F.count("*").cast("double").alias("n1r"),  # N1+(w1 *)
    )
    continuation = bigram.groupBy("w2").agg(
        F.count("*").cast("double").alias("n1l")  # N1+(* w2)
    )
    total = bigram.agg(F.count("*").cast("double").alias("_b"))
    return {
        "bigram": bigram,
        "context": context,
        "continuation": continuation,
        "total": total,
    }


def kn_bigram_doc_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tk",
    train: DataFrame | None = None,
    discount: float = 0.75,
    quantize: int = 4,
) -> DataFrame:
    """Per-document interpolated-KN bigram score: ``n_bigrams``,
    ``avg_logp`` (mean natural-log ``P_KN``, rounded to ``quantize``)
    and ``ppl`` (``exp(-avg_logp)`` of the unrounded mean) — the CCNet
    filter statistic. ``train`` defaults to ``docs`` (self-scored
    corpus); pass a held-out/reference corpus for true perplexity
    filtering, where KN's smoothing is what keeps unseen bigrams
    finite:

    * bigram unseen, context known → the discount-reserved mass times
      the continuation probability (exactly the KN interpolation term);
    * context unknown (OOV ``w1``) → ``P_cont(w2)`` alone;
    * ``w2`` never seen as a continuation → floor ``D / B`` (small
      positive mass so the log stays finite; an explicit <unk> model
      is corpus policy, not engine mechanics).

    Documents with < 2 tokens have no defined bigram score and are
    absent from the output (same contract as the MLE scorer).
    """
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0,1), got {discount}")
    c = kn_bigram_counts(train if train is not None else docs, tokens_col)
    big = _bigrams(docs, [id_col], tokens_col)
    d = F.lit(float(discount))
    pc = F.coalesce(F.col("n1l") / F.col("_b"), d / F.col("_b"))
    p = F.when(
        F.col("c1").isNotNull(),
        F.greatest(F.coalesce(F.col("c12"), F.lit(0)).cast("double") - d, F.lit(0.0))
        / F.col("c1")
        + d * F.col("n1r") / F.col("c1") * pc,
    ).otherwise(pc)
    scored = (
        big.join(c["bigram"], ["w1", "w2"], "left")
        .join(c["context"], "w1", "left")
        .join(c["continuation"], "w2", "left")
        .crossJoin(F.broadcast(c["total"]))  # 1-row scalar
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg(F.log(p)).alias("_m"),
        )
    )
    # ppl derives from the QUANTIZED mean (not the raw float) so the
    # pair (avg_logp, ppl) is a deterministic function of one rounded
    # value — cross-engine hash parity never hinges on exp() of a
    # last-ulp-different double.
    return scored.select(
        id_col,
        "n_bigrams",
        F.round("_m", quantize).alias("avg_logp"),
    ).select(
        id_col,
        "n_bigrams",
        "avg_logp",
        F.round(F.exp(-F.col("avg_logp")), quantize).alias("ppl"),
    )
