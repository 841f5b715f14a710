"""Sources & sinks: the path-encoded data lake, the metadata catalog, and
format IO helpers."""

from mhm_data_pipelines_spark.sources.lake import (
    path_dimensions,
    read_lake,
)
from mhm_data_pipelines_spark.sources.catalog import build_catalog
from mhm_data_pipelines_spark.sources.io import union_with_drift

__all__ = ["path_dimensions", "read_lake", "build_catalog", "union_with_drift"]
