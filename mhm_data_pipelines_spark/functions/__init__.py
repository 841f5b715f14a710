"""Column-expression builders (the engine's scalar/agg function surface).

Everything here returns ``pyspark.sql.Column`` so it stays JVM-side inside
whole-stage codegen — no Python UDFs in the hot path.
"""

from mhm_data_pipelines_spark.functions.timeutils import (
    coalesce_event_time,
    epoch_to_timestamp,
    iso_week_key,
    time_key,
    try_double,
)
from mhm_data_pipelines_spark.functions.stats import stats_agg_exprs

__all__ = [
    "coalesce_event_time",
    "epoch_to_timestamp",
    "iso_week_key",
    "time_key",
    "try_double",
    "stats_agg_exprs",
]
