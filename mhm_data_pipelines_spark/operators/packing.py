"""Training-example packing: assign documents to fixed token-budget
bins (the "sequence packing" step that turns a deduped corpus into
dense fixed-length training examples).

True first-fit bin packing is inherently sequential; the distributed
form used by large-scale pipelines packs WITHIN shards: documents are
deterministically ordered inside each shard key (source here), a
running token total is kept, and a document starts a new bin whenever
the running total crosses the budget. A document that straddles a
boundary belongs to the bin where it starts — bins overflow by at most
one document, which the trainer's truncation handles.

Scale: one window pass per shard key — the same shuffle a groupBy on
the shard would cost. No global ordering, no driver loop; shard count
= natural write parallelism for the packed output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.functions.text import tokens


def pack_documents(
    df: DataFrame,
    budget_tokens: int,
    keys: Sequence[str] = ("source",),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Returns (keys..., id, n_tokens, pack_id): pack_id is the bin
    index within the shard, ``floor(tokens_before / budget)`` over the
    deterministic ``id_col`` order."""
    keys = list(keys)
    n_tok = F.size(tokens(text_col)).alias("n_tokens")
    base = df.select(*keys, F.col(id_col), n_tok)
    w = (
        Window.partitionBy(*keys)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.withColumn(
        "pack_id", F.floor(before / budget_tokens).cast("long")
    )


def pack_stats(packed: DataFrame, keys: Sequence[str] = ("source",)) -> DataFrame:
    """Per-bin fill statistics — the packing-efficiency report (docs per
    bin, token fill)."""
    keys = list(keys)
    return packed.groupBy(*keys, "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("fill_tokens"),
    )
