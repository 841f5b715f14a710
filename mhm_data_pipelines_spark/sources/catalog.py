"""Metadata catalog: one row per lake object, queryable with the engine.

Replaces the reference's hand-rolled object graph ``S3Bucket → {user_id:
User} → {measurement: Measurement} → [DataFile]`` built from a paginated
``list_objects_v2`` and pickled to ``summary_data.pkl``
(``mhm-data-pipelines/summary.py:14-150,266-298``; untyped duplicate
``main.py:8-153``). Catalog "queries" there are driver loops over the
graph (date ranges ``summary.py:71-78``, file counts per batch
``:56-63``, distinct measurements ``:168-186``).

Here the catalog IS a DataFrame — every reference subcommand becomes a
small aggregate query (see ``operators.catalog_queries``), the pickle
cache becomes a parquet checkpoint, and at 100 TB the listing itself is
distributed (binaryFile/FileIndex listing, or a boto3 inventory read) and
the catalog is just another partitioned table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.functions.timeutils import (
    filename_shard_index,
)
from mhm_data_pipelines_spark.sources.lake import _path_parts


def build_catalog(
    spark: SparkSession,
    root: str,
    layout: str = "flat",
    cache_path: str | None = None,
    refresh: bool = False,
) -> DataFrame:
    """List every object under ``root`` → catalog DataFrame.

    Columns (FIXTURES.md §6): ``path, user_id, measurement, filename,
    date, time, shard_index, is_schema, size``.

    Uses the ``binaryFile`` source purely as a distributed *lister*
    (``pathGlobFilter`` none, content column dropped immediately — Spark
    prunes the content read since only metadata columns are selected).
    ``cache_path`` parquet-checkpoints the catalog (pickle-cache parity,
    summary.py:266-298) — idempotent, refreshable with ``refresh=True``.
    """
    if cache_path and not refresh:
        try:
            return spark.read.parquet(cache_path)
        except Exception:
            pass  # cache miss → list

    listing = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root.rstrip("/"))
        .select("path", "length", "modificationTime")
    )
    root_depth = len([s for s in root.rstrip("/").split("://")[-1].split("/") if s])
    parts = _path_parts(F.col("path"))
    filename = F.element_at(parts, -1)
    # Filename grammar YYYYMMDD_HHMM[_i] (summary.py:24-47): date + HHMM
    # time + optional shard; unparseable → NULLs, row kept (main.py:38-41).
    catalog = listing.select(
        F.col("path"),
        F.element_at(parts, root_depth + 1).alias("user_id"),
        F.element_at(parts, root_depth + 2).alias("measurement"),
        filename.alias("filename"),
        F.try_to_date(
            F.nullif(F.regexp_extract(filename, r"^(\d{8})_\d{4}", 1), F.lit("")),
            "yyyyMMdd",
        ).alias("date"),
        F.nullif(
            F.regexp_extract(filename, r"^\d{8}_(\d{4})", 1), F.lit("")
        ).alias("time"),
        filename_shard_index(filename).alias("shard_index"),
        filename.endswith(".json").alias("is_schema"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("modification_time"),
    )

    if cache_path:
        catalog.write.mode("overwrite").parquet(cache_path)
        return spark.read.parquet(cache_path)
    return catalog


def attach_schemas(catalog: DataFrame) -> DataFrame:
    """Associate each data file with its measurement's schema document —
    the reference's key-adjacency association (summary.py:133-144) as a
    broadcast left join (J2): the schema listing is tiny by construction.
    """
    data = catalog.filter(~F.col("is_schema"))
    schemas = (
        catalog.filter(F.col("is_schema"))
        .select(
            F.col("user_id").alias("s_user_id"),
            F.col("measurement").alias("s_measurement"),
            F.col("path").alias("schema_path"),
        )
    )
    return data.join(
        F.broadcast(schemas),
        (data["user_id"] == schemas["s_user_id"])
        & (data["measurement"] == schemas["s_measurement"]),
        "left",
    ).drop("s_user_id", "s_measurement")
