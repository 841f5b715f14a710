"""Composed operator pipelines — each is a reference workflow re-expressed
as one declarative DataFrame plan."""

from mhm_data_pipelines_spark.operators.overview import (
    availability_long,
    availability_matrix,
    missing_data_report,
    overview_stats,
)
from mhm_data_pipelines_spark.operators.summary import patient_summary

__all__ = [
    "availability_long",
    "availability_matrix",
    "missing_data_report",
    "overview_stats",
    "patient_summary",
]
