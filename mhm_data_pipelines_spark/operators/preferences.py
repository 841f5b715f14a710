"""RLHF / DPO preference-pair construction from scored completions.

No reference counterpart (north-star LLM-pipeline extension): reward
-model and DPO training consume (prompt, chosen, rejected) rows built
from a pool of scored completions per prompt — the standard prep stage
after SFT data assembly (``operators.conversations``). Two shapes are
standard and both are here:

* **best-vs-worst** — one pair per prompt: the top- and bottom-scored
  completions, kept only when the score margin clears a floor. This is
  the InstructGPT-style "max-margin" pair.
* **all-pairs** — every ordered pair whose margin clears the floor,
  optionally capped per prompt (largest margins first). This is the
  full Bradley–Terry expansion used when K completions per prompt are
  cheap.

Scale shape: best-vs-worst is ONE aggregation — ``min``/``max``
over a ``struct(score, completion_id)`` gives lexicographic argmin/
argmax with a deterministic tie rule and keeps map-side partial
aggregation (Spark plans it as SortAggregate: struct buffers are
not hash-supported; the partial still combines before the
exchange). No window, no self-join. All-pairs is a self-equi-join
on the prompt key — fan-out is bounded by the completions-per-prompt
contract (documented; a prompt with m completions emits ≤ m(m-1)
pairs), and the optional cap ranks within the prompt only. Texts
re-attach by (prompt, completion) equi-join AFTER pair selection so
the wide columns never ride through the pair shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["preference_pairs", "attach_pair_texts"]


def preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    completion_col: str = "completion_id",
    score_col: str = "score",
    margin: float = 0.0,
    mode: str = "best_worst",
    max_pairs_per_prompt: int | None = None,
) -> DataFrame:
    """Build preference pairs from ``(prompt, completion, score)`` rows.

    Returns ``(prompt_col, chosen_id, rejected_id, chosen_score,
    rejected_score, score_margin)`` with ``score_margin = chosen_score -
    rejected_score`` strictly greater than ``margin`` (a zero-margin
    pair carries no preference signal, so equality never qualifies).

    Tie rules (deterministic in any engine): chosen = highest score,
    ties broken toward the LARGER completion id; rejected = lowest
    score, ties toward the SMALLER id — both fall out of lexicographic
    ``max``/``min`` over ``struct(score, completion_id)``.

    ``mode="all_pairs"`` emits every (higher, lower) scored pair over
    the margin; ``max_pairs_per_prompt`` keeps the largest margins
    (ties: smaller chosen id, then smaller rejected id). With the cap
    set, both join sides are pre-pruned to the per-prompt top/bottom-K
    completions (provably sufficient — see the inline exchange
    argument), so a hot prompt costs K², never n². WITHOUT the cap the
    self-join is inherently the full expansion — only use uncapped
    all_pairs where a completions-per-prompt contract bounds n.

    NULL scores never pair: a preference you cannot order is not a
    preference (rows with NULL score are dropped up front on both
    engines).
    """
    p, c, s = prompt_col, completion_col, score_col
    scored = df.filter(F.col(s).isNotNull()).select(
        F.col(p), F.col(c), F.col(s).cast("double").alias(s)
    )
    if mode == "best_worst":
        key = F.struct(F.col(s).alias("score"), F.col(c).alias("cid"))
        agg = scored.groupBy(p).agg(
            F.max(key).alias("_best"), F.min(key).alias("_worst")
        )
        out = agg.select(
            F.col(p),
            F.col("_best.cid").alias("chosen_id"),
            F.col("_worst.cid").alias("rejected_id"),
            F.col("_best.score").alias("chosen_score"),
            F.col("_worst.score").alias("rejected_score"),
            (F.col("_best.score") - F.col("_worst.score")).alias(
                "score_margin"
            ),
        )
        return out.filter(F.col("score_margin") > F.lit(margin))
    if mode != "all_pairs":
        raise ValueError(f"unknown mode: {mode!r}")
    chosen_side, rejected_side = scored, scored
    if max_pairs_per_prompt is not None:
        # Hot-prompt guard (found by the r7 Zipf-skewed sf1 probe: one
        # prompt holding 38% of rows made the raw self-join quadratic,
        # 200× on 10× data). The final top-K pairs under
        # (margin DESC, chosen_id ASC, rejected_id ASC) can only draw
        # chosen from the prompt's top-K completions by
        # (score DESC, id ASC) and rejected from its bottom-K by
        # (score ASC, id ASC): any pair violating that is preceded by
        # ≥ K pairs that beat it on margin or tie-break (swap the
        # out-of-candidate endpoint for a dominating one — an exchange
        # argument). So prune both sides to K rows per prompt FIRST:
        # fan-out falls from n² to K² per prompt, bit-identical output
        # (asserted by test_preferences.py against the unpruned path).
        from pyspark.sql import Window

        kk = max_pairs_per_prompt
        wc = Window.partitionBy(p).orderBy(F.col(s).desc(), F.col(c))
        wr = Window.partitionBy(p).orderBy(F.col(s).asc(), F.col(c))
        chosen_side = (
            scored.withColumn("_rk", F.row_number().over(wc))
            .filter(F.col("_rk") <= kk)
            .drop("_rk")
        )
        rejected_side = (
            scored.withColumn("_rk", F.row_number().over(wr))
            .filter(F.col("_rk") <= kk)
            .drop("_rk")
        )
    a = chosen_side.select(
        F.col(p),
        F.col(c).alias("chosen_id"),
        F.col(s).alias("chosen_score"),
    )
    b = rejected_side.select(
        F.col(p),
        F.col(c).alias("rejected_id"),
        F.col(s).alias("rejected_score"),
    )
    pairs = (
        a.join(b, on=p)
        .withColumn(
            "score_margin",
            F.col("chosen_score") - F.col("rejected_score"),
        )
        .filter(F.col("score_margin") > F.lit(margin))
    )
    if max_pairs_per_prompt is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(p).orderBy(
            F.col("score_margin").desc(),
            F.col("chosen_id"),
            F.col("rejected_id"),
        )
        pairs = (
            pairs.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_pairs_per_prompt)
            .drop("_rk")
        )
    return pairs.select(
        p,
        "chosen_id",
        "rejected_id",
        "chosen_score",
        "rejected_score",
        "score_margin",
    )


def attach_pair_texts(
    pairs: DataFrame,
    df: DataFrame,
    prompt_col: str = "prompt_id",
    completion_col: str = "completion_id",
    text_col: str = "text",
) -> DataFrame:
    """Re-attach completion texts to selected pairs: two equi-joins on
    (prompt, completion id) AFTER pair selection, so the wide text
    column never rides through the pair-building shuffle. Adds
    ``chosen_text`` / ``rejected_text``."""
    texts = df.select(
        F.col(prompt_col),
        F.col(completion_col),
        F.col(text_col).alias("_t"),
    )
    out = pairs.join(
        texts.withColumnRenamed(completion_col, "chosen_id").withColumnRenamed(
            "_t", "chosen_text"
        ),
        on=[prompt_col, "chosen_id"],
    ).join(
        texts.withColumnRenamed(
            completion_col, "rejected_id"
        ).withColumnRenamed("_t", "rejected_text"),
        on=[prompt_col, "rejected_id"],
    )
    return out
