"""Structured Streaming surface: incremental file-arrival ingest and
windowed/stateful aggregation."""

from mhm_data_pipelines_spark.streaming.ingest import (
    incremental_overview,
    sessionized_counts,
    stream_lake,
    windowed_counts,
)

__all__ = [
    "incremental_overview",
    "sessionized_counts",
    "stream_lake",
    "windowed_counts",
]
