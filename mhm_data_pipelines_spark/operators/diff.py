"""Snapshot diff — keyed change detection between two table versions.

Dataset versioning at pipeline scale needs "what changed between
snapshot A and snapshot B": rows added, rows removed, rows whose
payload changed (and WHICH columns). This is the audit step before a
CDC upsert (``operators.upsert``) and the integrity check after one —
diff(old, apply(old, batch)) should equal the batch.

Scale shape: ONE co-partitioned full-outer join on the key columns —
the minimum any keyed diff can do — with per-column null-safe compare
expressions on the joined row. No window, no collect; output size is
the size of the change set plus nothing (unchanged rows are filtered
in-plan, so at 100 TB a 0.1% churn diff shuffles the two scans and
emits 0.1%).

Keys must be unique per snapshot (a snapshot is a keyed table, not a
log); duplicate keys make "changed" ill-defined and this operator does
not try to guess.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff of two snapshots.

    Returns one row per added / removed / changed key:
    ``(*keys, change, changed_cols)`` where ``change`` ∈
    {'added', 'removed', 'changed'} and ``changed_cols`` is a
    comma-joined sorted list of differing column names (empty for
    added/removed). Unchanged keys are dropped in-plan.

    ``compare_cols`` defaults to the non-key columns present in BOTH
    snapshots (schema drift: columns existing on one side only are
    ignored — they differ for every row and would drown the signal;
    diff them schema-level instead).
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c not in keys and c in new.columns
        ]
    o = old.select(
        *[F.col(c) for c in keys],
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(c) for c in keys],
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    joined = o.join(n, keys, "full_outer")
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")),
                    F.lit(c),
                )
                for c in compare_cols
            ]
        )
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *keys,
            "change",
            F.when(
                F.col("change") == "changed",
                F.array_join(F.array_sort(diffs), ","),
            )
            .otherwise(F.lit(""))
            .alias("changed_cols"),
        )
    )


def content_manifest(
    df: DataFrame,
    columns: list[str] | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Order-independent content manifest — the reproducibility audit
    for a dataset build: re-running the same pipeline on the same
    inputs must reproduce the same manifest, and two sites exchanging
    only ``n_buckets`` rows can locate WHERE replicas diverge (the
    first differing bucket narrows the search 64×) without shipping
    data. Layout-invariant by construction: repartitioning, shuffles,
    or file order never change it, only row content does.

    Each row renders canonically (``\\x1f``-joined string casts with an
    explicit NULL marker — NULL ≠ empty string), hashes to md5, and
    lands in ``pmod(hash60, n_buckets)``. Per bucket:
    ``n_rows``, ``xor_sig`` (bit_xor of the 60-bit hash — commutative,
    so partition order cannot matter), and ``min_hash`` / ``max_hash``
    hex spot-checks. Caveat of XOR: an even number of copies of the
    SAME row cancels out of ``xor_sig`` — ``n_rows`` still catches it,
    which is why both columns exist.

    Scale shape: one narrow projection + ONE hash aggregation to
    ``n_buckets`` rows; nothing else moves.
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("content_manifest needs at least one column")
    rendered = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in cols
        ],
    )
    row_hash = F.md5(rendered)
    hash60 = F.conv(F.substring(row_hash, 1, 15), 16, 10).cast("long")
    return (
        df.select(
            row_hash.alias("_h"),
            hash60.alias("_h60"),
            F.pmod(hash60, F.lit(n_buckets)).cast("int").alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.bit_xor("_h60").alias("xor_sig"),
            F.min("_h").alias("min_hash"),
            F.max("_h").alias("max_hash"),
        )
    )


def merge_manifests(partials: DataFrame) -> DataFrame:
    """Merge per-batch :func:`content_manifest` partials into the
    manifest of the union — EXACT, not approximate: counts add, XOR of
    XORs is the XOR of the union (associative + commutative), min/max
    compose. This is what makes the manifest incrementally
    maintainable by a stream or a per-partition build: arrival order
    and batch boundaries provably cannot change the result. One hash
    aggregation over (n_batches × n_buckets) tiny rows."""
    return (
        partials.groupBy("bucket")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.bit_xor("xor_sig").alias("xor_sig"),
            F.min("min_hash").alias("min_hash"),
            F.max("max_hash").alias("max_hash"),
        )
    )
