"""Lake reader: glob scan + path-encoded dimension extraction.

The reference's primary "table" is a directory hierarchy

    <root>/<top-level>/<SITE>/<PARTICIPANT_ID>/<METRIC>/.../YYYYMMDD_HHMM[_i].csv.gz

with three dimensions in the *path* and the batch timestamp in the
*filename* (``mhm-data-pipelines/collect_data_metadata.py:17-63``; merged
layout ``<root>/<SITE>/<PID>/<METRIC>/<METRIC>.csv.gz`` at
``extract_patient_summary.py:158-169``). Scripts re-walk the tree with
``os.walk`` per run (S1) and parse each path in Python (S2).

Spark-native design:

* one declarative ``spark.read`` over a glob (``recursiveFileLookup``)
  replaces the walk — listing is distributed and cached by the FileIndex;
* ``F.input_file_name()`` + regex/split expressions materialize
  ``site, participant_id, metric, file_timestamp, shard_index`` as
  ordinary columns, so include/exclude predicates (P4/P5) become Catalyst
  filters — evaluated before any data-column work, and convertible to
  real partition pruning once the compaction job (operators.compact)
  rewrites the lake as a table ``PARTITIONED BY (site, participant_id,
  metric)``.

Gzip CSVs are non-splittable: one task per file is correct at the
reference's file sizes, and the compaction pass is the scale answer for
everything downstream (SURVEY §4.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from mhm_data_pipelines_spark.functions.timeutils import (
    filename_shard_index,
    filename_timestamp,
)


def _path_parts(path: Column) -> Column:
    # Normalized relative path segments; strips any URI scheme prefix
    # (file:/, s3a://bucket) so positional parsing sees only the tree.
    no_scheme = F.regexp_replace(path, r"^[a-zA-Z0-9]+:/+", "")
    return F.split(no_scheme, "/")


def path_dimensions(
    lake_root_depth: int,
    layout: str = "raw",
    path: Column | None = None,
) -> dict[str, Column]:
    """Column expressions deriving the lake dimensions from the file path.

    ``lake_root_depth`` is the number of path segments of the lake root
    itself (so dimensions are positional *after* the root — the reference
    computes ``os.path.relpath(file_path, input_dir)`` first,
    collect_data_metadata.py:24-25).

    layout='raw'    → root/<top_level>/<site>/<participant_id>/<metric>/...
                      (collect_data_metadata.py:21)
    layout='merged' → root/<site>/<participant_id>/<metric>/file
                      (extract_patient_summary.py:158-169)
    layout='flat'   → root/<participant_id>/<metric>/file
                      (data_collection.py:86-92, S3 key shape summary.py:125-128)
    """
    p = F.input_file_name() if path is None else path
    parts = _path_parts(p)
    d = lake_root_depth
    filename = F.element_at(parts, -1)
    if layout == "raw":
        dims = {
            "top_level": F.element_at(parts, d + 1),
            "site": F.element_at(parts, d + 2),
            "participant_id": F.element_at(parts, d + 3),
            "metric": F.element_at(parts, d + 4),
        }
    elif layout == "merged":
        dims = {
            "site": F.element_at(parts, d + 1),
            "participant_id": F.element_at(parts, d + 2),
            "metric": F.element_at(parts, d + 3),
        }
    elif layout == "flat":
        dims = {
            "participant_id": F.element_at(parts, d + 1),
            "metric": F.element_at(parts, d + 2),
        }
    else:
        raise ValueError(f"unknown lake layout: {layout!r}")
    dims["filename"] = filename
    dims["file_timestamp"] = filename_timestamp(filename)
    dims["shard_index"] = filename_shard_index(filename)
    return dims


def include_exclude_predicate(
    path: Column,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    substring: bool = False,
) -> Column:
    """The reference's two include/exclude semantics, kept distinct
    (SURVEY §7 watch-list #4):

    * exact path-part membership (P4, ``process-overview.py:16-33``):
      keep iff any segment ∈ include AND no segment ∈ exclude;
    * substring containment (P5, ``extract_patient_summary.py:171-176``):
      include token is a *substring* of any segment.

    Evaluated on the path column so Catalyst applies it before data-column
    work; after compaction the same predicate on site/participant columns
    is partition pruning.
    """
    parts = _path_parts(path)
    pred = F.lit(True)
    if include:
        inc = F.array([F.lit(t) for t in include])
        if substring:
            pred = pred & F.exists(
                parts,
                lambda seg: F.exists(inc, lambda tok: seg.contains(tok)),
            )
        else:
            pred = pred & F.arrays_overlap(parts, inc)
    if exclude:
        exc = F.array([F.lit(t) for t in exclude])
        pred = pred & ~F.arrays_overlap(parts, exc)
    return pred


def read_lake(
    spark: SparkSession,
    root: str,
    layout: str = "raw",
    fmt: str = "csv",
    schema: StructType | str | None = None,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    include_substring: bool = False,
    glob: str | None = None,
    corrupt_record_col: str | None = None,
) -> DataFrame:
    """Read the whole lake (or an include/exclude-pruned slice) as one
    DataFrame with dimension columns materialized.

    Equivalent reference flow: os.walk + parse_file_path + per-file
    pd.read_csv + literal annotation (merge-data.py:54-100) — here a
    single declarative scan; corrupt files are skipped at file
    granularity like the reference's try/except
    (collect_data_metadata.py:92-93) via ``ignoreCorruptFiles``.

    Row-level malformation (ragged CSV lines, bad quoting) follows
    PERMISSIVE mode; pass ``corrupt_record_col`` (requires an explicit
    ``schema`` including that string column) to capture the raw text of
    each bad row for quarantine instead of silent nulls — the
    row-granular upgrade of the reference's file-granular skip.
    """
    root = root.rstrip("/")
    reader = (
        spark.read.option("recursiveFileLookup", "true")
        .option("ignoreCorruptFiles", "true")
    )
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    if corrupt_record_col:
        if schema is None:
            raise ValueError(
                "corrupt_record_col requires an explicit schema "
                "containing that string column"
            )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_record_col
        )
    if schema is not None:
        reader = reader.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.format(fmt).load(root)

    root_depth = len([s for s in root.split("://")[-1].split("/") if s])
    dims = path_dimensions(root_depth, layout=layout)
    for name, expr in dims.items():
        df = df.withColumn(name, expr)
    if include or exclude:
        df = df.filter(
            include_exclude_predicate(
                F.input_file_name(), include, exclude, substring=include_substring
            )
        )
    return df


_DIM_COLS = (
    "top_level", "site", "participant_id", "metric",
    "filename", "file_timestamp", "shard_index",
)


def read_lake_unified(
    spark: SparkSession,
    root: str,
    layout: str = "raw",
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    include_substring: bool = False,
    schemas: dict[str, StructType | str] | None = None,
    glob: str = "*.csv.gz",
) -> DataFrame:
    """Read a *heterogeneous* lake (different header per metric) into one
    drift-tolerant DataFrame.

    A single ``spark.read.csv`` over mixed-schema files misaligns columns
    (one inferred schema for all); the reference avoids this by reading
    per metric (merge-data.py:54-100). Here: one cheap distributed listing
    pass groups files by metric, then one read per metric — with its own
    header / registry schema — drift-unioned via ``unionByName``.

    Without a registry schema, data columns are normalized to STRING: CSV
    is typeless in the reference (``pd.read_csv`` inference per file) and
    every downstream extraction try_casts explicitly, so this keeps
    null-on-error semantics identical while making the union well-typed.
    At 100 TB, pass ``schemas`` (per-metric StructType, seedable from the
    reference's S3 JSON schema docs) to skip inference, and point this at
    the compacted parquet lake instead of raw gzip CSVs.

    Scale contract: nothing file-sized ever reaches the driver. The
    distributed listing is reduced to the DISTINCT METRIC NAMES (a lake
    has dozens of metrics regardless of file count — metadata-sized),
    and each metric becomes ONE glob-scoped declarative read
    (``root/*/…/<metric>`` + ``pathGlobFilter``) whose file enumeration
    stays inside Spark's FileIndex. Driver memory and job count scale
    with metric count, never with files.
    """
    import fnmatch
    import re

    from mhm_data_pipelines_spark.sources.catalog import build_catalog

    root = root.rstrip("/")
    listing = build_catalog(spark, root)
    pred = None
    if include or exclude:
        pred = include_exclude_predicate(
            F.col("path"), include, exclude, substring=include_substring
        )
        listing = listing.filter(pred)
    # metric = path segment layout-dependent; reuse path_dimensions on the
    # listing so grouping matches read-time extraction. The filename glob
    # is applied distributed (fnmatch → anchored regex) so metrics whose
    # directories hold only non-matching files don't produce empty reads.
    root_depth = len([s for s in root.split("://")[-1].split("/") if s])
    dims = path_dimensions(root_depth, layout=layout, path=F.col("path"))
    # fnmatch.translate anchors only the END ((?s:...)\Z); rlike is a
    # substring search, so a glob like "data_*.csv" would also SUFFIX-
    # match "mydata_x.csv" at listing time while the per-metric scan's
    # pathGlobFilter full-matches — selecting a metric whose scan then
    # matches zero files (schema-less empty CSV read fails). Prepend ^
    # so listing-time and scan-time filename semantics agree.
    fname_re = "^" + fnmatch.translate(glob)
    metric_rows = (
        listing.filter(
            F.element_at(_path_parts(F.col("path")), -1).rlike(fname_re)
        )
        .select(dims["metric"].alias("metric"))
        .filter(F.col("metric").isNotNull())
        .distinct()
        .collect()  # metric names only: bounded, metadata-sized
    )
    # Metric name → one glob path selecting exactly its subtree.
    metric_depth = {"raw": 3, "merged": 2, "flat": 1}[layout]
    wild = "/".join(["*"] * metric_depth)

    parts = []
    for metric in sorted(r.metric for r in metric_rows):
        if re.search(r"[*?\[\]{}\\]", metric):  # glob metachar ≠ literal dir
            raise ValueError(
                f"metric directory name {metric!r} contains glob "
                "metacharacters; read it via read_lake(glob=...) instead"
            )
        reader = (
            spark.read.option("header", "true")
            .option("ignoreCorruptFiles", "true")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", glob)
        )
        schema = (schemas or {}).get(metric)
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.csv(f"{root}/{wild}/{metric}")
        if schema is None:
            # Typeless normalization: everything string, like raw CSV text.
            df = df.select(
                *[F.col(f"`{c}`").cast("string").alias(c) for c in df.columns]
            )
        mdims = path_dimensions(root_depth, layout=layout)
        for name, expr in mdims.items():
            df = df.withColumn(name, expr)
        if pred is not None:
            # Re-apply file-level include/exclude inside the scan: the
            # glob selects the whole metric subtree, but the predicate
            # may exclude specific sites/participants within it.
            df = df.filter(
                include_exclude_predicate(
                    F.input_file_name(), include, exclude,
                    substring=include_substring,
                )
            )
        parts.append(df)
    if not parts:
        raise ValueError(f"read_lake_unified: no files matched under {root}")
    from mhm_data_pipelines_spark.sources.io import union_with_drift

    return union_with_drift(parts)
