"""Latest-wins merge (CDC/upsert compaction) without a table format.

The reference's ingest is append-only with skip-if-exists file
semantics (merge-data.py:68-70) — it has no record-level upsert. At
100 TB with at-least-once delivery, re-sent batches and corrected
records need MERGE semantics. Delta/Iceberg provide this as a table
operation; this module provides the engine-level equivalent over plain
parquet: deterministic latest-version-wins resolution, then a
partition-scoped rewrite.

Scale notes: resolution is ONE hash aggregate on the merge keys
(``max_by`` of the whole row struct — no window sort, no join); the
rewrite targets only partitions that received updates (dynamic
partition overwrite), so a 10k-partition table with updates in 3
partitions rewrites 3.
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_wins(
    df: DataFrame,
    keys: Sequence[str],
    version: str,
) -> DataFrame:
    """One row per key: the highest-``version`` row (ties resolved by
    the full row struct ordering, so the result is deterministic even
    with duplicate versions). A single hash aggregate — map-side
    partial ``max_by`` combines before the shuffle."""
    keys = list(keys)
    payload = [c for c in df.columns if c not in keys]
    row = F.struct(F.col(version), *[F.col(c) for c in payload if c != version])
    agg = df.groupBy(*keys).agg(F.max_by(row, row).alias("_r"))
    return agg.select(
        *keys, *[F.col(f"_r.{c}") for c in [version] + [p for p in payload if p != version]]
    ).select(*df.columns)


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version: str,
) -> DataFrame:
    """MERGE: rows of ``base`` overwritten by higher-version ``updates``
    rows on the same key; new keys inserted; base rows without updates
    pass through untouched. Equivalent to Delta's
    ``MERGE WHEN MATCHED AND s.v > t.v THEN UPDATE WHEN NOT MATCHED
    THEN INSERT`` — realized as union + latest-wins, one shuffle."""
    return latest_wins(
        base.unionByName(updates, allowMissingColumns=False), keys, version
    )


def _require_jvm(spark) -> None:
    from mhm_data_pipelines_spark.session import supports_jvm_access

    if not supports_jvm_access(spark):
        raise RuntimeError(
            "partitioned rewrite needs Hadoop-FS atomic renames and "
            "Spark's partition-path escaping (py4j) — genuinely "
            "JVM-bound; run on a classic session."
        )


def _isin_with_null(col: str, values) -> F.Column:
    """``col IN values`` that also matches NULL when ``values`` contains
    None — plain ``isin`` evaluates NULL-vs-NULL to NULL and silently
    drops those rows, which for a partition-rewrite means silently
    skipping the ``__HIVE_DEFAULT_PARTITION__`` directory."""
    non_null = [v for v in values if v is not None]
    cond = F.col(col).isin(non_null) if non_null else F.lit(False)
    if any(v is None for v in values):
        cond = cond | F.col(col).isNull()
    return cond


def _touched_partition_strings(df: DataFrame, partition_col: str) -> dict:
    """Distinct partition values of ``df`` mapped to their writer-exact
    string rendering, collected in ONE bounded pass (one row per
    partition). The rendering comes from Spark's own
    ``Cast(partition_col AS string)`` — NOT Python ``str()``, which
    diverges from Cast for timestamps with trailing-zero fractional
    seconds (``...123000`` vs Spark's ``...123``) and doubles in
    scientific notation (``1e+20`` vs ``1.0E20``); a diverging name
    would publish a wrongly-named empty dir and let the real partition
    (with the data that was supposed to be retired) survive the swap."""
    rows = (
        df.select(
            F.col(partition_col).alias("v"),
            F.col(partition_col).cast("string").alias("s"),
        )
        .distinct()
        .collect()  # bounded: one row per touched partition
    )
    return {r["v"]: r["s"] for r in rows}


def _partition_dir_names(spark, partition_col: str, rendered) -> list[str]:
    """Map Cast-rendered partition value strings (from
    :func:`_touched_partition_strings`) to the exact directory names
    Spark's writer produces, using Spark's own escaping
    (``ExternalCatalogUtils``): special chars become ``%XX`` and
    NULL/empty becomes ``__HIVE_DEFAULT_PARTITION__``. Building names
    with a raw f-string instead would publish a bogus unescaped dir and
    leave the real one alive."""
    utils = (
        spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    )
    return [
        utils.getPartitionPathString(partition_col, s) for s in rendered
    ]


def _ensure_partition_dirs(spark, tmp_path: str, dir_names) -> None:
    """Create an explicit EMPTY dir under ``tmp_path`` for every expected
    partition dir the merged write produced no output for (all rows of
    that partition were deleted or moved away), so the swap still retires
    the stale on-disk data instead of silently keeping it."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(tmp_path).getFileSystem(spark._jsc.hadoopConfiguration())
    present = {
        s.getPath().getName()
        for s in fs.listStatus(hpath(tmp_path))
        if s.isDirectory()
    }
    for name in dir_names:
        if name not in present:
            fs.mkdirs(hpath(f"{tmp_path}/{name}"))


def write_upsert_partitioned(
    base_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    version: str,
    partition_col: str,
    static_partitions: bool = False,
) -> None:
    """Apply updates to a partitioned parquet table rewriting ONLY the
    touched partitions. The read is partition-pruned to the touched
    partition values, so cost scales with the update footprint, not the
    table.

    "Touched" covers BOTH sides of a partition move: the partitions the
    updates land in AND the partitions where the updated keys currently
    live (discovered by a broadcast semi-join on the merge keys, column-
    pruned to ``keys + partition_col``). Without the second set, an
    update that changes a key's ``partition_col`` would leave the stale
    base row alive in the old partition — two rows for one merge key,
    which Delta MERGE would never produce. Pass ``static_partitions=
    True`` only when the caller guarantees ``partition_col`` is
    immutable per key; that skips the discovery scan (one footer+2-col
    pass over the table) and prunes purely on the update values.

    Commit protocol (plain parquet has none, so this builds the minimal
    one): the merged partitions are fully written to a sibling temp dir
    first, then swapped into the table one directory RENAME at a time,
    and only after every swap succeeds is the temp dir (holding the
    retired partition data) deleted. Failure windows:

    * crash during the merge/write → base table untouched; an orphaned
      ``<base>__upsert_tmp_*`` dir remains (safe to delete — Spark never
      lists sibling paths).
    * crash mid-swap → no torn partitions (directory rename is atomic on
      HDFS/POSIX), but THREE per-partition states are possible:
      partitions swapped so far show the complete new version, the rest
      show the complete old version, and the one partition between its
      two renames (retire → publish) is ABSENT from the table until the
      publish rename lands. Its old data is recoverable from the temp
      dir's ``_retired_<name>`` entry and the new data from the temp
      dir's ``<name>`` entry; re-running the upsert converges.
      Partition-atomic, not table-atomic.

    On object stores without atomic rename (plain S3), rename degrades
    to copy+delete per partition — correct but with a wider window;
    genuinely table-atomic MERGE there needs a transactional format
    (Delta/Iceberg) or an S3-committer-style manifest."""
    spark = updates.sparkSession
    _require_jvm(spark)
    touched = _touched_partition_strings(updates, partition_col)
    table = spark.read.parquet(base_path)
    if not static_partitions:
        key_cols = list(keys)
        upd_keys = updates.select(*key_cols).distinct()
        touched.update(
            _touched_partition_strings(
                table.join(F.broadcast(upd_keys), key_cols, "left_semi"),
                partition_col,
            )
        )
    vals = sorted(touched, key=lambda v: (v is None, str(v)))
    base = table.filter(_isin_with_null(partition_col, vals))
    merged = merge_upsert(base, updates, keys, version)
    # Sibling path (never inside base_path: a reader listing the table
    # mid-upsert must not see half-written files).
    tmp_path = f"{base_path}__upsert_tmp_{uuid.uuid4().hex}"
    merged.write.partitionBy(partition_col).parquet(tmp_path)
    # A partition whose only rows moved away produces no output dir —
    # publish an explicit empty dir so the swap retires the stale data.
    _ensure_partition_dirs(
        spark,
        tmp_path,
        _partition_dir_names(
            spark, partition_col, [touched[v] for v in vals]
        ),
    )
    _swap_partitions(spark, base_path, tmp_path, partition_col)


def _swap_partitions(
    spark, base_path: str, tmp_path: str, partition_col: str
) -> None:
    """Swap every ``<partition_col>=*`` directory of ``tmp_path`` into
    ``base_path`` (retiring any existing one into the temp dir), then
    drop the temp dir. Partition dirs are discovered by LISTING the temp
    output — not rebuilt from values — so Spark's partition-value path
    escaping is honored verbatim. Separated from the write as the
    crash-injection seam for tests."""
    from mhm_data_pipelines_spark.session import supports_jvm_access

    if not supports_jvm_access(spark):
        raise RuntimeError(
            "partition swap needs Hadoop-FS atomic renames (py4j) — "
            "genuinely JVM-bound; run the upsert on a classic session."
        )
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(base_path).getFileSystem(spark._jsc.hadoopConfiguration())
    prefix = f"{partition_col}="
    for status in fs.listStatus(hpath(tmp_path)):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith(prefix)):
            continue  # _SUCCESS marker etc.
        dst = hpath(f"{base_path}/{name}")
        if fs.exists(dst) and not fs.rename(
            dst, hpath(f"{tmp_path}/_retired_{name}")
        ):
            raise IOError(f"upsert swap: could not retire {dst}")
        if not fs.rename(status.getPath(), dst):
            raise IOError(f"upsert swap: could not publish {name}")
    fs.delete(hpath(tmp_path), True)


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    version: str,
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 history from a change stream:
    each ``(keys, version)`` change row becomes a validity interval —
    ``valid_to`` = the NEXT change's version for the same key (NULL on
    the open, current row) plus an ``is_current`` flag. The standard
    warehouse shape for "what did this dimension row say at time T?"
    (a point-in-time lookup is then one BETWEEN predicate, or an
    as-of join via ``operators.temporal``).

    Exact duplicates per (keys, version) are an upstream contract
    violation (two versions of the truth at one instant); resolve with
    :func:`latest_wins` first. Scale shape: one window per key
    (``lead`` over the version order) — partitioned by the dimension
    key, so it scales with rows-per-key, never a global sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(version)
    nxt = F.lead(version).over(w)
    return changes.withColumn(end_col, nxt).withColumn(
        current_col, F.col(end_col).isNull()
    )


def erase_subjects(
    base_path: str,
    subjects: DataFrame,
    key: str,
    partition_col: str,
) -> dict:
    """Right-to-erasure (GDPR art. 17) over a partitioned parquet
    table: physically rewrite ONLY the partitions containing the
    subjects' rows, dropping every row whose ``key`` appears in
    ``subjects`` — an anti-join, not an overwrite of the table.

    Scale shape: the subject list broadcasts into (1) a semi-join that
    discovers touched partitions (partition-pruned to nothing if the
    subjects don't exist) and (2) the anti-join inside each rewritten
    partition; untouched partitions are never read past their
    footer/stats. The rewrite rides the same partition-atomic rename
    protocol as :func:`write_upsert_partitioned` (see its crash-window
    notes). Returns ``{"partitions_rewritten": n, "rows_erased": n}``
    — the audit record an erasure job must emit.
    """
    spark = subjects.sparkSession
    _require_jvm(spark)
    subj = subjects.select(key).distinct()
    table = spark.read.parquet(base_path)
    touched = _touched_partition_strings(
        table.join(F.broadcast(subj), key, "left_semi"), partition_col
    )
    if not touched:
        return {"partitions_rewritten": 0, "rows_erased": 0}
    vals = sorted(touched, key=lambda v: (v is None, str(v)))
    # NULL partition values land in __HIVE_DEFAULT_PARTITION__ and MUST
    # be rewritten like any other — _isin_with_null matches them where a
    # plain isin would silently skip the erasure.
    scoped = spark.read.parquet(base_path).filter(
        _isin_with_null(partition_col, vals)
    )
    # rows_erased = the semi-join match count, directly — the old
    # shape counted the touched partitions once for `before` and
    # re-ran the whole anti-join for `after` just to subtract them.
    erased = int(
        scoped.join(F.broadcast(subj), key, "left_semi").count()
    )
    kept = scoped.join(F.broadcast(subj), key, "left_anti")
    tmp_path = f"{base_path}__erase_tmp_{uuid.uuid4().hex}"
    kept.write.partitionBy(partition_col).parquet(tmp_path)
    # Partitions that lost ALL rows produce no output dir from the write
    # above — publish an explicit empty dir so the swap retires the old
    # data (erasure must not silently keep a partition). Dir names use
    # Spark's own partition-path escaping; a raw f-string would publish
    # a bogus dir for values needing %XX escapes and the real dir — with
    # the subject's data — would survive the "successful" erasure.
    expected = _partition_dir_names(
        spark, partition_col, [touched[v] for v in vals]
    )
    _ensure_partition_dirs(spark, tmp_path, expected)
    _swap_partitions(spark, base_path, tmp_path, partition_col)
    return {
        "partitions_rewritten": len(vals),
        "rows_erased": erased,
    }
