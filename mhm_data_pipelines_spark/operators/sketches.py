"""Mergeable distinct-count sketch rollups (Apache DataSketches HLL,
built into Spark as ``hll_sketch_agg`` / ``hll_union_agg``).

The 100 TB pattern this enables: persist ONE small sketch per
fine-grained bucket (day × dimension), then answer every coarser
distinct-count question — weekly, monthly, arbitrary dimension slices
— by UNIONING sketches, never re-scanning raw data. Exact
count_distinct cannot do this (distinct counts don't add); the
reference's summary pipeline recomputes from raw per window, which is
the thing that stops scaling first.

Sketches are order-insensitive and mergeable by construction, so the
fine→coarse rollup is exactly one hash aggregate per tier — the same
mergeable-partials shape as ``operators/rollup_ts.py``, with bounded
error (default lgConfigK=12 ⇒ ~1.6% rsd) instead of bounded staleness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_distinct(
    df: DataFrame,
    bucket_cols: list,
    key: str,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch of ``key``'s distinct values per bucket — the
    fine-grained tier to persist (a sketch is ~KBs regardless of
    cardinality). ``bucket_cols`` mixes names and Column expressions."""
    cols = [
        F.col(c).alias(c) if isinstance(c, str) else c for c in bucket_cols
    ]
    return df.groupBy(*cols).agg(
        F.hll_sketch_agg(key).alias(sketch_col)
    )


def rollup_sketches(
    df: DataFrame,
    bucket_cols: list,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Coarser tier from an existing sketch table: union the sketches
    under the new (coarser) buckets. No raw data touched — this is the
    merge that exact distinct counts cannot express."""
    cols = [
        F.col(c).alias(c) if isinstance(c, str) else c for c in bucket_cols
    ]
    return df.groupBy(*cols).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def estimate(df: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Replace the sketch column with its distinct-count estimate."""
    return df.withColumn(
        sketch_col + "_estimate", F.hll_sketch_estimate(sketch_col)
    ).drop(sketch_col)


def histogram_partials(
    df: DataFrame,
    bucket_cols: list,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Fixed-bin histogram PARTIALS per bucket — the mergeable-quantile
    counterpart of :func:`sketch_distinct`: persist one ≤``n_bins``-row
    histogram per fine bucket, answer any coarser quantile question by
    SUMMING bins (:func:`merge_histograms`), never re-scanning raw
    data. Bin edges are LITERALS (``lo``/``hi`` from domain knowledge
    or a prior 1-row min/max agg), so partials built on different days
    / sites / engines are bin-compatible by construction — the
    property that makes them mergeable. Values at/below ``lo`` clamp
    to bin 0, at/above ``hi`` to bin ``n_bins-1`` (no silent drop).

    Returns ``(*bucket_cols, bin, cnt)``; estimate error after any
    merge is bounded by one bin width — checked, not assumed, in the
    gate query.
    """
    if not (hi > lo) or n_bins < 1:
        raise ValueError("need hi > lo and n_bins >= 1")
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")
        ),
    )
    return (
        df.filter(v.isNotNull())
        .groupBy(*bucket_cols, b.alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )


def merge_histograms(
    partials: DataFrame, bucket_cols: list
) -> DataFrame:
    """Merge histogram partials to a coarser bucketing: bins ADD —
    exact, order-insensitive (counts are counts). One hash agg over
    ≤ n_fine_buckets × n_bins tiny rows."""
    return partials.groupBy(*bucket_cols, "bin").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def histogram_quantile(
    hist: DataFrame,
    bucket_cols: list,
    q: float,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Quantile estimate from a merged histogram: the upper edge of
    the first bin where the cumulative count reaches ``q × n``.
    Guaranteed within one bin width of the exact quantile — the
    trade the sketch makes for mergeability. The cumulative window
    runs over ≤ ``n_bins`` rows per bucket (never the data).

    Returns ``(*bucket_cols, n, est)``.
    """
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    w = (
        Window.partitionBy(*bucket_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*bucket_cols)
    cum = F.sum("cnt").over(w)
    n = F.sum("cnt").over(wn)
    hit = hist.select(
        *bucket_cols,
        "bin",
        n.alias("n"),
        (cum >= F.lit(q) * n).alias("_reached"),
    ).filter("_reached")
    return hit.groupBy(*bucket_cols).agg(
        F.max("n").alias("n"),
        (F.lit(lo) + (F.min("bin") + 1) * F.lit(width)).alias("est"),
    )
