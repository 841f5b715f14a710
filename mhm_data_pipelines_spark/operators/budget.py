"""Globally-ordered running totals and token-budget corpus selection.

No reference counterpart (north-star LLM-pipeline extension per
BASELINE.json). The motivating op: "take the best documents until the
token budget is spent" — a cumulative sum over a GLOBAL ordering, which
a naive ``Window.orderBy`` (no partition key) executes on a single task
and therefore cannot scale.

Scale design — the classic two-phase distributed prefix sum:

1. ``repartitionByRange`` on the full ordering key (made total by a
   unique tiebreaker, so range boundaries are deterministic) co-locates
   each key range in one partition, already sorted relative to others.
2. A window partitioned BY PARTITION ID computes the within-partition
   running sum — fully parallel.
3. Per-partition totals (one row per partition — metadata-sized, like
   the upsert operator's touched-partition list) come to the driver,
   turn into exclusive prefix offsets, and broadcast-join back.

Every partition works independently; the only driver traffic is
``O(num_partitions)`` rows. At 100 TB this is the difference between a
plan that finishes and one that funnels the corpus through one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_total(
    df: DataFrame,
    order_by: list[Column | str],
    value_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """``out_col`` = inclusive cumulative sum of ``value_col`` over the
    global ``order_by`` ordering, computed with the distributed prefix
    sum above (no single-task window). ``order_by`` MUST be a total
    order (include a unique tiebreaker) — equal keys straddling a range
    boundary would otherwise make the split nondeterministic."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint (eager) freezes the range split: repartitionByRange
    # picks boundaries by SAMPLING with partition-dependent seeds, so
    # re-executing the unpersisted frame in two jobs (the totals collect
    # below + the caller's final action) could assign boundary rows to
    # DIFFERENT _pid values — the broadcast offsets would then attach to
    # the wrong partitions and the cumulative sums would be silently
    # wrong. Materializing once also means the input is scanned once,
    # not three times. On a multi-node cluster this would be
    # ``checkpoint()`` to reliable storage; in-process the local form is
    # the same lineage cut.
    ranged = (
        df.repartitionByRange(parts, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_local_cum", F.sum(value_col).over(w))
    # One row per partition — metadata-sized by construction.
    totals = sorted(
        ranged.groupBy("_pid")
        .agg(F.sum(value_col).alias("_tot"))
        .collect(),
        key=lambda r: r["_pid"],
    )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["_pid"], acc))
        acc += r["_tot"] or 0
    off_df = df.sparkSession.createDataFrame(
        offsets, "_pid int, _offset long"
    )
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
