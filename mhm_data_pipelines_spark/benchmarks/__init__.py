"""Benchmark/correctness query registry — the driver-contract surface."""

from mhm_data_pipelines_spark.benchmarks.registry import (
    BENCH_QUERIES,
    ORACLES,
    QUERIES,
)

__all__ = ["QUERIES", "ORACLES", "BENCH_QUERIES"]
