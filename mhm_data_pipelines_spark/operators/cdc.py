"""Change-data-capture apply: merge an (insert/update/delete)
changelog into a base snapshot — the MERGE INTO every lakehouse table
maintenance job runs, usable without a table format (plain parquet in,
plain parquet out).

North-star extension — no reference counterpart (the reference
re-downloads and re-merges whole CSV trees instead of applying deltas;
cf. ``mhm-data-pipelines/merge-data.py`` full-rewrite loops). At
100 TB you never rewrite the snapshot from scratch: you fold the day's
changelog in.

Semantics (Debezium-style row changelog):

* ``changes`` carries the key columns, a monotonically increasing
  ``seq`` (LSN / commit timestamp / offset), an ``op`` column with
  values ``I`` / ``U`` / ``D`` (case-insensitive), and the full new
  payload for I/U rows.
* Per key, the change with the highest ``seq`` wins; equal-``seq``
  ties (same-transaction batches) break deterministically by op
  severity ``D > U > I`` — a delete co-sequenced with an update means
  the row ends deleted.
* Winner ``D``  → the key is absent from the result (payload on a D
  row is ignored).
* Winner ``I``/``U`` → the winning payload replaces (or inserts) the
  row — UPSERT semantics, so an out-of-order U for a never-seen key
  still lands (the standard at-least-once CDC contract).
* Keys untouched by the changelog pass through unchanged.

Scale shape: ONE shuffle partitions the changelog by key for the
latest-winner window; the anti-join (untouched base rows) and the
survivor union reuse key partitioning — no broadcast assumption on
either side, so a 100 TB base with a 100 GB changelog and the inverse
both plan as co-partitioned sort-merge joins. Nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cdc_apply"]

#: Equal-seq tie precedence (higher wins): a delete beats the update
#: it ships with; an insert is the weakest claim.
_OP_RANK = {"D": 3, "U": 2, "I": 1}


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply ``changes`` to ``base`` (see module doc) and return the
    new snapshot with exactly ``base``'s columns.

    ``changes`` must carry every ``base`` column plus ``seq_col`` and
    ``op_col``. An op value outside I/U/D fails the job loudly at
    execution time (``raise_error``) rather than silently dropping the
    row — a malformed changelog must never half-apply.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    missing = [c for c in [*base.columns, seq_col, op_col]
               if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")
    payload_cols = [c for c in base.columns if c not in key_cols]

    op_norm = F.upper(F.col(op_col))
    rank_expr = F.when(op_norm == "D", F.lit(_OP_RANK["D"]))
    rank_expr = rank_expr.when(op_norm == "U", F.lit(_OP_RANK["U"]))
    rank_expr = rank_expr.when(op_norm == "I", F.lit(_OP_RANK["I"]))
    rank_expr = rank_expr.otherwise(
        F.raise_error(
            F.concat(F.lit("cdc_apply: unknown op value "), F.col(op_col))
        )
    )

    w = Window.partitionBy(*key_cols).orderBy(
        F.desc("_seq"), F.desc("_op_rank")
    )
    latest = (
        changes.select(
            *key_cols,
            *payload_cols,
            F.col(seq_col).alias("_seq"),
            op_norm.alias("_op"),
            rank_expr.alias("_op_rank"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    untouched = base.join(
        latest.select(*key_cols), key_cols, "left_anti"
    )
    survivors = latest.filter(F.col("_op") != "D").select(*base.columns)
    return untouched.unionByName(survivors)
