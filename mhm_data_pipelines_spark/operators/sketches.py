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
