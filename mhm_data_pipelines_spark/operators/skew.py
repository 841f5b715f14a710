"""Skew mitigation: salted two-stage aggregation and salted joins.

The expected skew shape in this domain is participants/users with wildly
different data volumes (one participant's sensor stream can be orders of
magnitude larger than the median — SURVEY §4.2). AQE's skew-join
splitting covers joins at runtime; these utilities cover the cases AQE
does not: a single hot *grouping* key that funnels into one reducer, and
deliberate pre-planned salting when the hot keys are known.

Scale contract: ``salted_agg`` turns ``groupBy(keys)`` into
``groupBy(keys + salt)`` → merge — the hot key's rows spread over
``buckets`` reducers in stage 1, and stage 2 only touches
``|distinct keys| × buckets`` pre-aggregated rows. Only algebraic
aggregates decompose this way (count/sum/min/max/avg); distinct-style
aggregates need a different decomposition (salt BY the distinct column)
and are rejected explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: alias -> (partial aggregate over rows, final merge over partials)
_ALGEBRA = {
    "count": (
        lambda c: F.count("*" if c == "*" else c),
        lambda p: F.sum(p).cast("long"),
    ),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-stage (salted) aggregation equivalent to
    ``df.groupBy(keys).agg(...)`` but immune to hot grouping keys.

    ``aggs`` maps output column name -> (fn, col) where fn is one of
    ``count | sum | min | max | avg`` (``avg`` decomposes into sum+count
    and re-divides at merge). The salt is a seeded ``rand`` — uniform,
    and deterministic per partition for task retries.
    """
    partials: list[Column] = []
    finals: list[Column] = []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            partials.append(F.sum(col).alias(f"__s_{name}"))
            partials.append(F.count(col).alias(f"__c_{name}"))
            finals.append(
                (F.sum(f"__s_{name}") / F.sum(f"__c_{name}")).alias(name)
            )
            continue
        if fn not in _ALGEBRA:
            raise ValueError(
                f"{fn!r} is not salt-decomposable (supported: "
                f"{sorted(_ALGEBRA)} + 'avg'; distinct-style aggregates "
                "need salting by the distinct column instead)"
            )
        partial, final = _ALGEBRA[fn]
        partials.append(partial(col).alias(f"__p_{name}"))
        finals.append(final(f"__p_{name}").alias(name))

    salt = (F.rand(seed) * buckets).cast("int")
    stage1 = df.groupBy(*keys, salt.alias("__salt")).agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Inner equi-join where ``skewed`` has hot join keys and ``small``
    is modest but above the broadcast threshold: salt the skewed side
    (random bucket per row), replicate the small side once per bucket,
    and join on ``on + [salt]`` — each hot key spreads over ``buckets``
    co-partitions. Prefer ``F.broadcast`` when the small side fits, and
    AQE skew-join when it can split; this is the manual fallback.
    """
    salt = (F.rand(seed) * buckets).cast("int")
    left = skewed.withColumn("__salt", salt)
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return left.join(right, [*on, "__salt"]).drop("__salt")


def skew_report(
    df: DataFrame, key_cols: list[str], top_k: int = 10
) -> DataFrame:
    """Pre-flight skew diagnostic for join/aggregation keys: for each
    candidate key column, the ``top_k`` heaviest keys with their row
    counts, corpus share, and mean-ratio (count ÷ mean rows-per-key) —
    the readout that decides whether a 100 TB join needs
    :func:`salted_join` / AQE skew handling BEFORE it runs, instead of
    discovering the straggler in the stage timeline. Returns
    ``(col_name, key, n_rows, rank, share, mean_ratio)`` with keys
    cast to string so heterogeneous columns union into one report.

    Scale shape per column: ONE hash aggregate (count per key), a
    TakeOrdered top-k, and a single-row stats aggregate (mean/total)
    broadcast back — nothing scales with distinct-key count except the
    hash aggregate itself. Columns are few (it's a report), so the
    per-column plans union cheaply.
    """
    if not key_cols:
        raise ValueError("key_cols is empty")
    parts = []
    for c in key_cols:
        counts = (
            df.select(F.col(c).cast("string").alias("key"))
            .groupBy("key")
            .agg(F.count("*").alias("n_rows"))
        )
        stats = counts.agg(
            F.avg("n_rows").alias("_mean"),
            F.sum("n_rows").alias("_tot"),
        )
        top = counts.orderBy(F.desc("n_rows"), "key").limit(top_k)
        w = Window.orderBy(F.desc("n_rows"), "key")
        parts.append(
            top.crossJoin(F.broadcast(stats)).select(
                F.lit(c).alias("col_name"),
                "key",
                F.col("n_rows").cast("long").alias("n_rows"),
                F.row_number().over(w).alias("rank"),
                F.round(F.col("n_rows") / F.col("_tot"), 6).alias(
                    "share"
                ),
                F.round(F.col("n_rows") / F.col("_mean"), 6).alias(
                    "mean_ratio"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col_name", "rank")


def join_size_preflight(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    top_k: int = 10,
) -> DataFrame:
    """Exact inner-join OUTPUT size without materializing the join:
    |A ⋈ B| = Σ_key cl(k)·cr(k), computed from per-key count
    aggregates — tiny rows through the same key shuffle the real join
    would pay, so the answer costs a fraction of the join it
    describes. The decide-before-you-run companion to
    :func:`skew_report`: that flags hot keys per side, this prices the
    fan-out they multiply into (the classic surprise: two modest
    inputs whose hot keys align into a billion-row output).

    Returns ONE summary row: ``(n_out_rows, n_matched_keys,
    n_left_rows, n_right_rows, max_key_fanout, top_fanout_share)`` —
    ``max_key_fanout`` the largest single-key product and
    ``top_fanout_share`` the fraction of output owed to the
    ``top_k`` hottest keys (≈1.0 ⇒ salting or a skew hint pays off).
    """
    lc = left.groupBy(*on).agg(F.count("*").alias("_cl"))
    rc = right.groupBy(*on).agg(F.count("*").alias("_cr"))
    prod = lc.join(rc, on).select(
        (F.col("_cl").cast("long") * F.col("_cr")).alias("_p")
    )
    top = prod.orderBy(F.desc("_p")).limit(top_k).agg(
        F.sum("_p").alias("_top_sum")
    )
    totals = prod.agg(
        F.sum("_p").alias("n_out_rows"),
        F.count("*").alias("n_matched_keys"),
        F.max("_p").alias("max_key_fanout"),
    )
    return (
        totals.crossJoin(F.broadcast(top))
        .crossJoin(
            F.broadcast(left.agg(F.count("*").alias("n_left_rows")))
        )
        .crossJoin(
            F.broadcast(right.agg(F.count("*").alias("n_right_rows")))
        )
        .select(
            F.coalesce("n_out_rows", F.lit(0)).alias("n_out_rows"),
            "n_matched_keys",
            "n_left_rows",
            "n_right_rows",
            F.coalesce("max_key_fanout", F.lit(0)).alias(
                "max_key_fanout"
            ),
            F.round(
                F.coalesce(
                    F.col("_top_sum") / F.col("n_out_rows"), F.lit(0.0)
                ),
                6,
            ).alias("top_fanout_share"),
        )
    )
