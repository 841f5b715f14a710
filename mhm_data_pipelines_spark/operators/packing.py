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


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-window chunking: split each document into token chunks of
    ``chunk_tokens`` with ``overlap`` tokens carried between adjacent
    chunks (stride = chunk − overlap) — the step that turns long
    documents into trainer-sized examples.

    Pure per-row explode: chunk boundaries are computed from the token
    count, ``slice`` re-materializes each chunk — no shuffle at all, so
    it scales embarrassingly. The final (short) chunk is kept; documents
    with ≤ ``chunk_tokens`` tokens yield themselves as chunk 0. Returns
    (id_col, chunk_id, n_tokens, chunk_text) with chunk token counts.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    # chunk starts: 1, 1+stride, ... while start <= n (1-indexed slice);
    # n_chunks = 1 + floor(max(n - chunk, 0) / stride), final partial
    # chunk included iff it adds tokens beyond the previous chunk's end.
    n_chunks = F.when(
        n <= chunk_tokens, F.lit(1)
    ).otherwise(
        F.lit(1) + F.ceil((n - chunk_tokens) / F.lit(stride)).cast("int")
    )
    chunk = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id")
    ex = df.select(F.col(id_col), toks.alias("_toks"), chunk)
    piece = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return ex.select(
        id_col,
        "chunk_id",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def length_bucket_stats(
    df: DataFrame,
    length_col: str,
    bucket_edges: Sequence[int],
) -> DataFrame:
    """Sequence-length bucketing report — the batch-efficiency planner
    for padded (non-packed) training: group sequences into length
    buckets, pad each bucket to its cap, and measure what fraction of
    the padded tensor is real tokens. The readout that justifies a
    bucket config (or packing instead): ``pad_efficiency`` near 1.0 ⇒
    little waste; a long tail in the overflow bucket ⇒ add an edge or
    truncate.

    ``bucket_edges`` are inclusive upper caps, strictly increasing
    (e.g. ``[128, 512, 2048]`` ⇒ buckets ≤128, ≤512, ≤2048, and an
    overflow bucket padded to its own observed max). Returns one row
    per non-empty bucket: ``(bucket, cap, n_seqs, sum_len, max_len,
    pad_efficiency)`` where ``pad_efficiency = sum_len / (n_seqs ×
    pad_to)`` and ``pad_to`` is the cap (overflow: observed max).
    NULL / negative lengths are rejected rows — counted nowhere, they
    signal an upstream bug better by absence.

    Scale shape: bucket assignment is a row-local expression over the
    (small, literal) edge list; the report is ONE hash aggregation to
    ``len(bucket_edges)+1`` rows.
    """
    edges = list(bucket_edges)
    if not edges or any(
        b <= a for a, b in zip(edges, edges[1:])
    ) or edges[0] <= 0:
        raise ValueError("bucket_edges must be positive and increasing")
    ln = F.col(length_col).cast("long")
    bucket = F.lit(0)
    for e in edges:
        bucket = bucket + F.when(ln > e, 1).otherwise(0)
    caps = F.array(*[F.lit(e).cast("long") for e in edges])
    agg = (
        df.filter(ln.isNotNull() & (ln >= 0))
        .select(bucket.cast("int").alias("bucket"), ln.alias("_len"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_seqs"),
            F.sum("_len").alias("sum_len"),
            F.max("_len").alias("max_len"),
        )
    )
    cap = F.when(
        F.col("bucket") < len(edges),
        F.element_at(caps, F.col("bucket") + 1),
    ).otherwise(F.col("max_len"))
    return agg.select(
        "bucket",
        cap.alias("cap"),
        "n_seqs",
        "sum_len",
        "max_len",
        F.round(
            F.col("sum_len")
            / (F.col("n_seqs") * F.greatest(cap, F.lit(1))),
            6,
        ).alias("pad_efficiency"),
    )
