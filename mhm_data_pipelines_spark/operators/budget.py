"""Globally-ordered running totals and token-budget corpus selection.

No reference counterpart (north-star LLM-pipeline extension per
BASELINE.json). The motivating op: "take the best documents until the
token budget is spent" — a cumulative sum over a GLOBAL ordering, which
a naive ``Window.orderBy`` (no partition key) executes on a single task
and therefore cannot scale.

Scale design — a two-phase distributed prefix sum over DETERMINISTIC
range buckets:

1. Range boundaries are computed ONCE, driver-side, from a value-hash
   sample of the ordering key (column-pruned scan), and embedded as
   LITERALS. Each row's bucket id ``_pid`` is then a pure function of
   its key values — every job that evaluates the frame assigns
   identical buckets, so nothing needs to be checkpointed or persisted
   to keep the two phases consistent. (``repartitionByRange`` instead
   re-samples boundaries per job with partition-dependent seeds: its
   split is only safe to consume across jobs after materializing the
   frame — a full-corpus checkpoint at 100 TB. Literal boundaries make
   the split re-executable for free.)
2. A window partitioned by ``_pid`` computes the within-bucket running
   sum — fully parallel.
3. Per-bucket totals (one row per bucket — metadata-sized) come to the
   driver, turn into exclusive prefix offsets, and broadcast-join back.

Every bucket works independently; driver traffic is the boundary sample
plus ``O(num_partitions)`` total rows. At 100 TB this is the difference
between a plan that finishes and one that funnels the corpus through
one task (or rewrites it to checkpoint storage).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _split_sort_order(
    spark, order_by: list[Column | str]
) -> list[tuple[Column, bool]]:
    """(bare expression, ascending?) per ordering column — unwraps
    ``F.desc(...)``-style SortOrder columns via the ColumnNode API so
    the bare key can be projected/compared outside a sort context."""
    out: list[tuple[Column, bool]] = []
    for c in order_by:
        if isinstance(c, str):
            out.append((F.col(c), True))
            continue
        node = c._jc.node()
        if node.getClass().getSimpleName() == "SortOrder":
            bare = Column(
                spark._jvm.org.apache.spark.sql.Column(node.child())
            )
            asc = "Descending" not in node.sortDirection().toString()
            out.append((bare, asc))
        else:
            out.append((c, True))
    return out


def _sample_boundaries(
    df: DataFrame,
    pairs: list[tuple[Column, bool]],
    parts: int,
    per_part: int,
) -> list[tuple]:
    """parts-1 range cut points from a deterministic value-hash sample
    of the ordering key. The sample predicate hashes the KEY VALUES
    (``xxhash64``), not row positions, so it selects the same rows on
    any execution and any input partitioning."""
    if parts <= 1:
        return []
    keys = df.select(
        *[e.alias(f"_k{i}") for i, (e, _) in enumerate(pairs)]
    ).dropna()
    target = parts * per_part
    # Uniform sample in ONE job with no pre-count: the `target` rows with
    # the smallest key-hash values (TakeOrdered — parallel per-partition
    # top-K, driver merges K rows). Hash of VALUES, so the same rows win
    # on any execution/partitioning; bounded driver traffic by
    # construction.
    kcols = [f"_k{i}" for i in range(len(pairs))]
    rows = [
        tuple(r)[:-1]
        for r in keys.withColumn("_h", F.xxhash64(*kcols))
        .orderBy("_h")
        .limit(target)
        .collect()
    ]
    if not rows:
        return []

    def cmp(a: tuple, b: tuple) -> int:
        for i, (_, asc) in enumerate(pairs):
            if a[i] == b[i]:
                continue
            lt = a[i] < b[i]
            return (-1 if lt else 1) if asc else (1 if lt else -1)
        return 0

    rows.sort(key=functools.cmp_to_key(cmp))
    return [rows[(j * len(rows)) // parts] for j in range(1, parts)]


def _bucket_expr(
    pairs: list[tuple[Column, bool]], boundaries: list[tuple]
) -> Column:
    """Bucket id = how many boundaries this row sorts strictly AFTER
    (lexicographic compare honoring per-column direction) — a pure
    row-value expression, identical on every execution. Rows equal to a
    boundary key land in the lower bucket."""
    if not boundaries:
        return F.lit(0)
    pid: Column = F.lit(0)
    for b in boundaries:
        after = F.lit(False)
        prefix_eq = F.lit(True)
        for (e, asc), bv in zip(pairs, b):
            gt = (e > F.lit(bv)) if asc else (e < F.lit(bv))
            after = after | (prefix_eq & gt)
            prefix_eq = prefix_eq & (e == F.lit(bv))
        pid = pid + F.when(after, 1).otherwise(0)
    return pid


def running_total(
    df: DataFrame,
    order_by: list[Column | str],
    value_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
    boundary_samples_per_partition: int = 64,
) -> DataFrame:
    """``out_col`` = inclusive cumulative sum of ``value_col`` over the
    global ``order_by`` ordering, computed with the literal-boundary
    distributed prefix sum above (no single-task window, no
    materialization). ``order_by`` MUST be a total order (include a
    unique tiebreaker) with NON-NULL keys — null keys have no defined
    range bucket (boundary comparisons are null-poisoned); coalesce
    them to a sentinel first."""
    spark = df.sparkSession
    pairs = _split_sort_order(spark, order_by)
    sort_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    parts = num_partitions or spark.sparkContext.defaultParallelism
    boundaries = _sample_boundaries(
        df, pairs, parts, boundary_samples_per_partition
    )
    tagged = df.withColumn(
        "_pid", _bucket_expr(pairs, boundaries).cast("int")
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tagged.withColumn("_local_cum", F.sum(value_col).over(w))
    # One row per bucket — metadata-sized by construction. Safe to run
    # as its own job: _pid depends only on row values + literal bounds.
    totals = sorted(
        tagged.groupBy("_pid")
        .agg(F.sum(value_col).alias("_tot"))
        .collect(),
        key=lambda r: r["_pid"],
    )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["_pid"], acc))
        acc += r["_tot"] or 0
    off_df = spark.createDataFrame(offsets, "_pid int, _offset long")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, (F.col("_offset") + F.col("_local_cum")).cast("long"))
        .drop("_pid", "_local_cum", "_offset")
    )


def select_to_budget(
    df: DataFrame,
    budget: int,
    order_by: list[Column | str],
    value_col: str,
    keep_running: bool = True,
) -> DataFrame:
    """Greedy budgeted selection: walk ``df`` in ``order_by`` order and
    keep rows while the cumulative ``value_col`` stays ≤ ``budget`` —
    the "best docs until the token budget is spent" primitive. A row
    whose value would cross the budget is dropped, as is everything
    after it (inclusive-sum semantics, matching SQL's
    ``SUM(...) OVER (... ROWS UNBOUNDED PRECEDING) <= budget``)."""
    out = running_total(df, order_by, value_col)
    out = out.filter(F.col("running_total") <= budget)
    return out if keep_running else out.drop("running_total")
