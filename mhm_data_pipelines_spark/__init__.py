"""PySpark-native analytics engine with the query and data-processing
capabilities of ``MentalHealthMission/MHM-data-pipelines``.

The reference is a set of single-process pandas/boto3 CLI ETL scripts for
digital-phenotyping study data (see ``/root/reference/README.md:5-17``).
This package re-expresses its entire operator surface (SURVEY.md §2) as
idiomatic Spark DataFrame pipelines — declarative plans optimized by
Catalyst, designed for a 1000-executor / 100 TB deployment while remaining
testable on ``local[*]``.

Layout:
    session     SparkSession factory (AQE, Arrow, sane shuffle defaults)
    sources     lake reader (path-encoded dims), catalog, IO helpers
    functions   column-expression builders (time, stats, text, vectors)
    operators   composed pipelines (overview, summary, dedup, similarity)
    plans       the colon-separated extraction-spec DSL compiler
    streaming   incremental file-arrival ingest (Structured Streaming)
"""

from mhm_data_pipelines_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
