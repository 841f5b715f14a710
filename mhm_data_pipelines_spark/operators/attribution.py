"""Multi-touch conversion attribution over event streams.

Growth/marketing analytics over the same per-user event timelines the
reference's overview pipeline profiles (events: user_id, ts,
event_type): for every conversion event, split credit across the
touchpoint events that preceded it inside a lookback window, then roll
credit up per channel. Four standard models come out of ONE pass:
first-touch, last-touch, linear, and position-based / U-shaped
(40/20/40 — Google Analytics' "position-based" model).

Semantics (deterministic, engine-replayable):

* A conversion is an event whose type equals ``conversion_type``;
  every conversion gets its OWN journey (touches inside overlapping
  lookbacks credit each conversion they precede — the standard
  treatment; conversions themselves are never touches).
* The journey is the user's non-conversion events with
  ``conv_ts - lookback <= ts < conv_ts`` (strict upper bound: a touch
  simultaneous with the conversion is not a cause), ordered by
  ``(ts, id_col)`` — the id tie-break makes every rank, and therefore
  every credit, deterministic.
* U-shaped credit: single touch → 1.0; first and last → ``u_weight``
  each; the middle shares ``1 - 2*u_weight`` equally. Two touches →
  0.5/0.5 (re-normalized, the standard convention, NOT u_weight —
  there is no middle to absorb the rest).
* Conversions with ZERO preceding touches are counted separately
  (``unattributed`` in the summary) rather than silently dropped.

Scale shape: one equi-join of touches to conversions on the USER key
(never a cross join — the range predicate prunes inside the join),
one (user, conversion) window for rank/size, one hash aggregate per
channel. Per-user fan-out is bounded by (events per user within the
lookback) × (conversions per user) — both naturally bounded per
subject; a pathological power user is one salted key away, same as
every per-user window in this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def position_attribution(
    df: DataFrame,
    conversion_type: str,
    time_col: str = "ts",
    user_col: str = "user_id",
    channel_col: str = "event_type",
    id_col: str = "event_id",
    lookback_days: int = 7,
    u_weight: float = 0.4,
) -> DataFrame:
    """Per-channel attribution summary.

    Returns one row per channel: ``channel``, ``touches`` (credited
    touch events), ``conversions_touched`` (distinct conversions the
    channel appears in), ``first_credit``, ``last_credit``,
    ``linear_credit``, ``u_credit`` (each model's total credit for the
    channel; every model distributes exactly 1.0 per attributed
    conversion, so each credit column sums to the attributed
    conversion count).
    """
    if not 0.0 < u_weight <= 0.5:
        raise ValueError(
            f"u_weight must be in (0, 0.5], got {u_weight}"
        )
    if lookback_days < 1:
        raise ValueError(
            f"lookback_days must be >= 1, got {lookback_days}"
        )
    is_conv = F.col(channel_col) == F.lit(conversion_type)
    conv = df.filter(is_conv).select(
        F.col(user_col).alias("_u"),
        F.col(time_col).alias("_cts"),
        F.col(id_col).alias("_cid"),
    )
    touch = df.filter(~is_conv).select(
        F.col(user_col).alias("_u"),
        F.col(time_col).alias("_tts"),
        F.col(id_col).alias("_tid"),
        F.col(channel_col).alias("channel"),
    )
    j = touch.join(conv, "_u").filter(
        (F.col("_tts") < F.col("_cts"))
        & (
            F.col("_tts")
            >= F.col("_cts")
            - F.expr(f"INTERVAL {int(lookback_days)} DAYS")
        )
    )
    w = Window.partitionBy("_u", "_cid").orderBy("_tts", "_tid")
    ws = Window.partitionBy("_u", "_cid")
    ranked = j.select(
        "channel",
        F.col("_cid"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(ws).alias("sz"),
    )
    uw = float(u_weight)
    u_credit = (
        F.when(F.col("sz") == 1, F.lit(1.0))
        .when(F.col("sz") == 2, F.lit(0.5))
        .when(
            (F.col("rn") == 1) | (F.col("rn") == F.col("sz")),
            F.lit(uw),
        )
        .otherwise(F.lit(1.0 - 2.0 * uw) / (F.col("sz") - 2))
    )
    credited = ranked.select(
        "channel",
        "_cid",
        F.when(F.col("rn") == 1, F.lit(1.0)).otherwise(F.lit(0.0))
        .alias("first_c"),
        F.when(F.col("rn") == F.col("sz"), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("last_c"),
        (F.lit(1.0) / F.col("sz")).alias("linear_c"),
        u_credit.alias("u_c"),
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("touches"),
        F.countDistinct("_cid").alias("conversions_touched"),
        F.sum("first_c").alias("first_credit"),
        F.sum("last_c").alias("last_credit"),
        F.sum("linear_c").alias("linear_credit"),
        F.sum("u_c").alias("u_credit"),
    )


def attribution_coverage(
    df: DataFrame,
    conversion_type: str,
    time_col: str = "ts",
    user_col: str = "user_id",
    channel_col: str = "event_type",
    id_col: str = "event_id",
    lookback_days: int = 7,
) -> DataFrame:
    """One-row audit: total conversions, attributed (≥1 touch in the
    lookback), unattributed, and the attribution rate (6dp) — the
    completeness check that keeps per-channel credit honest (credit
    columns sum to ``attributed``, not to all conversions)."""
    is_conv = F.col(channel_col) == F.lit(conversion_type)
    conv = df.filter(is_conv).select(
        F.col(user_col).alias("_u"),
        F.col(time_col).alias("_cts"),
        F.col(id_col).alias("_cid"),
    )
    touch = df.filter(~is_conv).select(
        F.col(user_col).alias("_u"), F.col(time_col).alias("_tts")
    )
    touched = (
        conv.join(
            touch,
            (conv["_u"] == touch["_u"])
            & (F.col("_tts") < F.col("_cts"))
            & (
                F.col("_tts")
                >= F.col("_cts")
                - F.expr(f"INTERVAL {int(lookback_days)} DAYS")
            ),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("attributed"))
    )
    total = conv.agg(F.count(F.lit(1)).alias("conversions"))
    return (
        total.crossJoin(F.broadcast(touched))
        .select(
            "conversions",
            "attributed",
            (F.col("conversions") - F.col("attributed")).alias(
                "unattributed"
            ),
            F.round(
                F.col("attributed") / F.col("conversions"), 6
            ).alias("attribution_rate"),
        )
    )
