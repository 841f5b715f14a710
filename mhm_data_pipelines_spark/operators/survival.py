"""Kaplan-Meier survival estimation over a per-subject duration table.

Domain completion of the reference's engagement reporting: the
overview/retention surface (process-overview.py's per-participant
activity span, `cohort_retention`'s triangle) answers "how many users
were active in month M"; the survival curve answers the censoring-aware
version — "what fraction of users is still active after t days,
accounting for users whose observation window simply ended" — the
standard churn/retention estimator a product-analytics consumer of the
same events table expects.

Scale design:
* One hash aggregate builds the per-subject (duration, event) row —
  the only full-data shuffle; everything after operates on one row per
  distinct (group, duration), which is bounded by the time horizon
  (days), not by row count.
* The risk set n(t) = Σ subjects with duration ≥ t is a window over
  that small per-duration table (descending cumulative sum), and the
  product-limit estimator Π(1 - d/n) is computed as
  exp(Σ ln(1 - d/n)) with an explicit zero-factor flag so d = n
  (everyone fails at the last time) yields survival exactly 0 instead
  of -inf propagation. Both windows partition by the cohort key, so
  curves for different cohorts never co-shuffle.
* No driver-side state, no Python UDFs — pure Column expressions,
  whole-stage-codegen end to end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    subjects: DataFrame,
    duration: str = "duration",
    event: str = "event",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Product-limit survival estimate from one row per subject.

    Parameters
    ----------
    subjects : one row per subject with a non-negative integer/float
        ``duration`` (time observed) and an ``event`` flag (1 = the
        terminal event was observed at that time, 0 = right-censored).
    group_cols : optional cohort keys; one independent curve per group.

    Returns one row per (group, distinct duration) with
    ``n_at_risk``, ``n_events``, ``n_censored`` and the running
    ``survival`` estimate S(t), ordered by group then time.
    """
    g = list(group_cols)
    per_t = subjects.groupBy(
        *g, F.col(duration).alias("t")
    ).agg(
        F.sum(F.col(event).cast("long")).alias("n_events"),
        F.sum(F.lit(1) - F.col(event).cast("long")).alias("n_censored"),
        F.count(F.lit(1)).alias("_n_here"),
    )
    w_risk = (
        Window.partitionBy(*g)
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_cum = (
        Window.partitionBy(*g)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    factored = per_t.withColumn(
        "n_at_risk", F.sum("_n_here").over(w_risk)
    ).withColumn(
        "_factor",
        F.lit(1.0) - F.col("n_events") / F.col("n_at_risk"),
    )
    return (
        factored.withColumn(
            "_dead", F.max((F.col("_factor") == 0).cast("int")).over(w_cum)
        )
        .withColumn(
            "survival",
            F.when(F.col("_dead") == 1, F.lit(0.0)).otherwise(
                F.exp(
                    F.sum(
                        F.log(
                            F.when(F.col("_factor") > 0, F.col("_factor"))
                        )
                    ).over(w_cum)
                )
            ),
        )
        .select(*g, "t", "n_at_risk", "n_events", "n_censored", "survival")
        .orderBy(*g, "t")
    )


def activity_spans(
    events: DataFrame,
    subject: str = "user_id",
    ts: str = "ts",
    churn_horizon_days: int = 14,
) -> DataFrame:
    """Build the per-subject (duration, event) table from a raw event
    stream: duration = days between a subject's first and last event;
    the terminal event is OBSERVED (event=1, "churned") when the last
    event predates the corpus cutoff by more than ``churn_horizon_days``
    — otherwise the subject is right-censored (still active).

    One hash aggregate per subject plus a 1-row global-cutoff broadcast;
    the cutoff crossJoin is a scalar broadcast, not a data join.
    """
    per_user = events.groupBy(subject).agg(
        F.min(ts).alias("_first"),
        F.max(ts).alias("_last"),
        F.count(F.lit(1)).alias("n_events"),
    )
    cutoff = events.agg(F.max(ts).alias("_cutoff"))
    return per_user.crossJoin(F.broadcast(cutoff)).select(
        subject,
        F.datediff(F.to_date("_last"), F.to_date("_first")).alias(
            "duration"
        ),
        (
            F.to_date("_last")
            < F.date_sub(F.to_date("_cutoff"), churn_horizon_days)
        )
        .cast("int")
        .alias("event"),
        "n_events",
    )
