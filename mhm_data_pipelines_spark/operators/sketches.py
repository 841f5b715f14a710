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

from pyspark.sql import DataFrame, Window
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


def kmv_set_ops(
    df: DataFrame,
    set_col: str,
    element_col: str,
    k: int = 256,
    seed: int = 42,
) -> DataFrame:
    """KMV/theta-sketch set algebra (Beyer et al. 2007; the Theta
    sketch of Dalvi et al. / Apache DataSketches): estimate distinct
    cardinalities, unions, and INTERSECTIONS between every pair of
    sets — the operation HLL cannot do (HLL unions, never
    intersects) — from k-minimum-value samples.

    Per set: hash each element to a unit draw (``md5_unit_draw`` —
    deterministic, engine-portable), keep the k smallest;
    ``|S| ≈ (k−1)/u_(k)``. Per pair: θ = min(θ_a, θ_b); every kept
    hash < θ is a uniform sample of the set, so
    ``|A∩B| ≈ |samples_A ∩ samples_B below θ| / θ``. The union
    estimate is inclusion-exclusion ``est_a + est_b − est_inter``
    using each set's OWN full-θ cardinality estimate — only the
    intersection term is θ-restricted. (The canonical theta-sketch
    union — count of distinct kept hashes below the pair θ across
    both samples, divided by θ — restricts all three terms and has
    lower variance; this estimator is kept because it reuses the
    already-computed per-set estimates in one pass and its bias is
    identical, and the DuckDB oracle pins these exact semantics.)

    Returns one row per (set_a < set_b) pair: ``(set_a, set_b,
    est_a, est_b, est_inter, est_union)``, estimates rounded 2dp.
    Sets with < k distinct elements are EXACT by construction
    (θ = 1 semantics: est = n when u_(k) doesn't exist → the sketch
    keeps everything; handled via the observed count).

    Scale shape: one distinct-projection + hash, one per-set top-k
    window over the hashed elements (rank ≤ k — the only shuffle
    touching element volume), then ALL pair math runs on ≤ n_sets·k
    rows: a sample-sample equi-join on the hash value + tiny
    aggregates. The corpus is never pairwise-joined.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from mhm_data_pipelines_spark.operators.sampling import (
        md5_unit_draw,
    )

    elems = (
        df.filter(F.col(element_col).isNotNull())
        .select(
            F.col(set_col).alias("s"), F.col(element_col).alias("e")
        )
        .distinct()
        .withColumn("u", md5_unit_draw(F.col("e"), seed))
    )
    w = Window.partitionBy("s").orderBy("u", "e")
    kept = (
        elems.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .localCheckpoint(eager=False)
    )
    # Per-set stats: n_kept and theta = the k-th min (1.0 when the
    # set is smaller than k — the sketch holds the whole set).
    stats = kept.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max(F.when(F.col("rn") == k, F.col("u"))).alias("u_k"),
    )
    stats = stats.select(
        "s",
        "n_kept",
        F.coalesce("u_k", F.lit(1.0)).alias("theta"),
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise((F.lit(float(k - 1))) / F.col("u_k"))
        .alias("est"),
    )
    a = stats.select(
        F.col("s").alias("set_a"),
        F.col("theta").alias("th_a"),
        F.col("est").alias("est_a"),
    )
    b = stats.select(
        F.col("s").alias("set_b"),
        F.col("theta").alias("th_b"),
        F.col("est").alias("est_b"),
    )
    pairs = a.join(b, F.col("set_a") < F.col("set_b")).withColumn(
        "theta", F.least("th_a", "th_b")
    )
    # Sample-sample equi-join on the hash: elements of BOTH sets kept
    # below the pair's theta.
    ka = kept.select(
        F.col("s").alias("set_a"), F.col("e").alias("e"),
        F.col("u").alias("u"),
    )
    kb = kept.select(
        F.col("s").alias("set_b"), F.col("e").alias("e"),
        F.col("u").alias("u2"),
    )
    common = (
        ka.join(kb, ["e"])
        .join(
            F.broadcast(pairs.select("set_a", "set_b", "theta")),
            ["set_a", "set_b"],
        )
        .filter(F.col("u") < F.col("theta"))
        .groupBy("set_a", "set_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = pairs.join(common, ["set_a", "set_b"], "left").select(
        "set_a",
        "set_b",
        F.round("est_a", 2).alias("est_a"),
        F.round("est_b", 2).alias("est_b"),
        F.round(
            F.coalesce("n_common", F.lit(0)) / F.col("theta"), 2
        ).alias("est_inter"),
        F.round(
            F.col("est_a") + F.col("est_b")
            - F.coalesce("n_common", F.lit(0)) / F.col("theta"),
            2,
        ).alias("est_union"),
    )
    return out
