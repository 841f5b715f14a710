"""Table profiling: per-column statistics in ONE pass + one value scan.

The reference computes ad-hoc per-metric stats blocks
(``mhm-data-pipelines/process-overview.py:207-226``); this operator is
the engine-level generalization — the "summarize every column" utility
(dbt-profiler / DuckDB ``SUMMARIZE`` shape) a data-quality workflow
runs before trusting a 100 TB drop.

Scale design:

* The scalar stats (rows, nulls, distinct, min, max) for ALL columns
  come from ONE aggregate pass — map-side combined, no per-column scan
  fan-out — then unpivot driver-free via ``stack``.
* Top-k frequent values explode to ``(column, value)`` rows (one scan)
  → one hash-agg → per-column window top-k. Cardinality after the agg
  is Σ distinct(col) — prune wide/high-cardinality columns with the
  ``columns`` arg; ``exact_distinct=False`` swaps in
  ``approx_count_distinct`` (HLL, bounded memory) for the 100 TB path.
* Values render as strings so heterogeneous columns share one output
  schema (profiling output is for humans/monitors, not joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    top_k: int = 3,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per profiled column: ``(column, dtype, n_rows, n_nulls,
    n_distinct, min_value, max_value, top_values)`` where
    ``top_values`` is ``"v1:n1, v2:n2, ..."`` (count desc, value asc;
    NULLs excluded)."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")

    distinct_agg = (
        F.count_distinct if exact_distinct else F.approx_count_distinct
    )
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        col = F.col(f"`{c}`")
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_nulls_{c}"),
            distinct_agg(col).alias(f"_nd_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
        ]
    stats = df.agg(*aggs)
    # stack(n, label1, v1a, v1b, ..., label2, ...) unpivots the single
    # stats row to long form without touching the driver.
    parts = []
    for c in cols:
        parts += [
            f"'{c}'",
            f"_nulls_{c}",
            f"_nd_{c}",
            f"_min_{c}",
            f"_max_{c}",
        ]
    long = stats.select(
        "_rows",
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
    )

    vals = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"`{c}`").cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("cv")
    ).select("cv.column", "cv.value").filter(F.col("value").isNotNull())
    w = Window.partitionBy("column").orderBy(F.desc("n"), "value")
    top = (
        vals.groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= top_k)
        .groupBy("column")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("_rk", "value", "n")
                        )
                    ),
                    lambda s: F.concat_ws(
                        ":", s["value"], s["n"].cast("string")
                    ),
                ),
                ", ",
            ).alias("top_values")
        )
    )

    dtype_map = F.create_map(
        *[x for c in cols for x in (F.lit(c), F.lit(dtypes[c]))]
    )
    return (
        long.join(top, "column", "left")
        .select(
            "column",
            dtype_map[F.col("column")].alias("dtype"),
            F.col("_rows").alias("n_rows"),
            "n_nulls",
            "n_distinct",
            "min_value",
            "max_value",
            F.coalesce("top_values", F.lit("")).alias("top_values"),
        )
    )
