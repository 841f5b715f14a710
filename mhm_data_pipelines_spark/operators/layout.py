"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping writes.

The reference engine has no layout optimizer (its tables are per-metric
CSV merges, ``mdp/merge-data.py:54-96``); at 100 TB the dominant read
cost is scan I/O, and parquet row-group min/max pruning only helps when
rows that are close in *filter space* are close in *file space*. Sorting
by one column optimizes one predicate; interleaving the bits of several
quantized columns (a Z-order / Morton curve) keeps EVERY interleaved
column's min/max range small per row group, so point/range filters on
any of them prune most of the file.

Scale design:

- Quantization needs each column's global min/max — a single-row
  aggregate (metadata-sized broadcast, the scalar-subquery pattern
  whitelisted in ``tests/test_plan_properties.py``). No sort, no
  collect.
- The z-key is codegen'd Column arithmetic — full-range min-max
  scaling (IEEE binary64, bit-deterministic across engines for inputs
  under 2**53) then integer bit interleave. No UDF; ANSI-safe (the
  interleaved key is ``bits × n_cols`` bits ≤ 63, no overflow).
- The write is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``
  — one range shuffle (sampled boundaries, skew-tolerant), cluster-wide
  parallel sort, no global single-partition sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "with_zorder_key", "write_zordered"]


def _quantize(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale ``col`` onto the FULL ``[0, 2**bits)`` range:
    ``floor((x - min) * (2**bits - 1) / (max - min))``.

    Scaling up (not just bucketing down) matters: a column whose span is
    narrower than ``2**bits`` would otherwise use only its low bits, and
    the interleave would degenerate to a sort on the wider column. The
    arithmetic is IEEE binary64 (bit-deterministic across engines);
    inputs must fit 2**53 after min-subtraction (epoch micros do).
    """
    span = (col.cast("long") - cmin).cast("double")
    width = (cmax - cmin).cast("double")
    return F.when(width == 0, F.lit(0).cast("long")).otherwise(
        F.floor(span * F.lit(float(2**bits - 1)) / width)
    )


def zorder_key(quantized: list[Column], bits: int) -> Column:
    """Interleave the bits of pre-quantized columns (each in
    ``[0, 2**bits)``) into one Morton key: bit ``j`` of column ``k``
    lands at position ``j * n_cols + k``. Stays in whole-stage codegen
    (shift/mask expressions only)."""
    ncols = len(quantized)
    if bits * ncols > 63:
        raise ValueError(
            f"z-key would need {bits * ncols} bits; reduce bits or columns"
        )
    parts = []
    for k, q in enumerate(quantized):
        for j in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(q, j).bitwiseAND(F.lit(1)), j * ncols + k)
            )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("long")


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out_col: str = "zkey",
) -> DataFrame:
    """Attach a Z-order key over integer-typed ``cols``.

    Global min/max per column come from ONE single-row aggregate that is
    broadcast back (scalar-subquery realization — the plan cost is one
    extra reduction, not a sort). Non-integer columns must be cast by
    the caller (e.g. ``unix_micros(ts)``) so bucket boundaries are
    engine-exact.
    """
    bounds = df.agg(
        *[F.min(c).cast("long").alias(f"_min_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"_max_{c}") for c in cols],
    )
    joined = df.crossJoin(F.broadcast(bounds))
    qs = [
        _quantize(
            F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits
        )
        for c in cols
    ]
    out = joined.withColumn(out_col, zorder_key(qs, bits))
    drop = [f"_min_{c}" for c in cols] + [f"_max_{c}" for c in cols]
    return out.drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    format: str = "parquet",
) -> None:
    """Write ``df`` clustered along the Z-order curve of ``cols``.

    ``repartitionByRange`` on the z-key gives contiguous curve segments
    per output file (range boundaries are sampled — no global sort);
    ``sortWithinPartitions`` orders rows inside each file so row-group
    min/max stats are tight for every interleaved dimension. The key is
    dropped before writing — layout is physical, not schematic.
    """
    keyed = with_zorder_key(df, cols, bits=bits)
    if num_files:
        keyed = keyed.repartitionByRange(num_files, "zkey")
    else:
        keyed = keyed.repartitionByRange("zkey")
    keyed.sortWithinPartitions("zkey").drop("zkey").write.format(
        format
    ).mode("overwrite").save(path)


def plan_shards(
    df: DataFrame,
    size_col: str,
    shard_size: int,
    order_by: list | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Size-balanced output sharding: assign each row the shard in
    which its cumulative size STARTS, over a deterministic total order
    — the write-planning step that turns "dump the corpus" into
    equal-weight shards for trainer consumption (a shard overflows by
    at most one straddling row, same convention as
    ``packing.pack_documents`` bins). Returns the input plus
    ``shard_id`` and the inclusive ``cum_size``.

    The cumulative sum is ``budget.running_total``'s two-phase
    distributed prefix sum (literal range boundaries + per-bucket
    offsets) — NO single-task global window, so the plan is the same
    shape at 500 rows and 5 billion. ``order_by`` defaults to the id
    column and must be a total order with non-null keys (see
    ``running_total``).
    """
    from mhm_data_pipelines_spark.operators.budget import running_total

    if shard_size <= 0:
        raise ValueError("shard_size must be positive")
    order = order_by if order_by is not None else [F.col(id_col)]
    rt = running_total(df, order, size_col, out_col="cum_size")
    return rt.withColumn(
        "shard_id",
        F.floor(
            (F.col("cum_size") - F.col(size_col)) / F.lit(shard_size)
        ).cast("int"),
    )
