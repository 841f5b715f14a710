"""The numeric stats block and related aggregate expression builders.

Reference: ``compute_stats`` at
``mhm-data-pipelines/extract_patient_summary.py:114-118`` — count, mean,
median, std, min, max over a list of floats. Two parity traps (SURVEY §7):

* ``np.std`` is **population** std (ddof=0) → ``stddev_pop``, not the
  sample ``stddev``.
* median is exact (numpy interpolates the middle pair) → Spark ``median``
  (exact, interpolated; Spark >= 3.4), never ``percentile_approx``.

All exprs are builtin JVM aggregates — partial+final hash aggregation and
whole-stage codegen apply automatically, which is what makes the stats
block a single shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stats_agg_exprs(value: Column | str, prefix: str = "") -> list[Column]:
    """The reference's stats block as aggregate Columns:
    ``total_entries, mean, median, std_dev, min, max`` (optionally
    name-prefixed for multi-measure aggs)."""
    v = F.col(value) if isinstance(value, str) else value
    p = prefix
    return [
        F.count(v).alias(f"{p}total_entries"),
        F.avg(v).alias(f"{p}mean"),
        F.median(v).alias(f"{p}median"),
        F.stddev_pop(v).alias(f"{p}std_dev"),
        F.min(v).alias(f"{p}min"),
        F.max(v).alias(f"{p}max"),
    ]


def distinct_days(ts: Column | str, exact: bool = True, rsd: float = 0.01) -> Column:
    """Distinct calendar days with data — the reference's pervasive
    ``day_set`` (process-overview.py:120-126, data_collection.py:48-62,
    extract_patient_summary.py:111,382-388).

    ``exact=False`` switches to HyperLogLog (``approx_count_distinct``)
    for the 100 TB path where an exact distinct forces a full shuffle of
    the day column per group.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    d = F.to_date(c)
    if exact:
        return F.count_distinct(d)
    return F.approx_count_distinct(d, rsd)


def date_range_exprs(ts: Column | str) -> list[Column]:
    """Earliest/latest observation per group (process-overview.py:117-119,
    main.py:67-74)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return [F.min(c).alias("start_ts"), F.max(c).alias("end_ts")]
