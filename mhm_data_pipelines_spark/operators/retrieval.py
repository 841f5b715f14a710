"""BM25 full-text retrieval over the corpus — query-time scoring and
top-k, entirely with builtin expressions.

No reference counterpart (north-star LLM-pipeline extension): a
training-data engine needs corpus search for curation, eval-set
construction ("find the docs most similar to this benchmark prompt"),
and targeted decontamination beyond exact n-gram overlap. BM25 is the
standard lexical ranking function (Robertson/Spärck Jones; the Lucene
variant of the idf term).

Scale design — everything narrows *before* it moves:

* Doc tokens explode once, then are immediately filtered to the query's
  terms (a literal ``isin`` — Catalyst pushes it into the Generate), so
  the shuffled relation is ``O(docs_containing_query_terms)``, not the
  corpus token count.
* Per-term document frequencies are an aggregate over that same
  filtered relation — at most ``len(query_terms)`` rows, broadcast back.
* Corpus stats (N, avgdl) are one single-row aggregate, broadcast.
* The final top-k is a TakeOrdered (per-partition top-k, driver merges
  k), not a global sort.

Float determinism: scores involve ``ln`` (not correctly rounded across
engines), so rank/emit on ``round(score, round_scores)`` with doc-id
tie-breaks when hash-exact parity matters (same convention as
``functions.text.tfidf_top_terms``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.functions.text import tokens

__all__ = ["bm25_scores", "bm25_topk"]


def _query_terms(query: str | list[str]) -> list[str]:
    terms = query.split() if isinstance(query, str) else list(query)
    out = sorted({t.lower() for t in terms if t})
    if not out:
        raise ValueError("query has no terms")
    return out


def bm25_scores(
    df: DataFrame,
    query: str | list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_scores: int | None = None,
    share_scan: bool = False,
) -> DataFrame:
    """BM25 score of every document that matches ≥1 query term:
    ``(id_col, score, n_terms_matched)``.

    ``share_scan=True`` lazily ``localCheckpoint``\\ s the per-(doc,
    term) tf frame so the docfreq aggregate reuses it instead of
    re-running the token explode (Spark shares no subtrees without
    materialization — the plan otherwise scans + explodes twice). Same
    opt-in trade-off as ``operators.budget.running_total``: pinning the
    (term-filtered, small) frame vs pure re-executable lineage.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))      (Lucene form)

    dl = doc token count, avgdl = corpus mean. Docs matching no term
    are absent (score 0 by definition — union them back if a dense
    result is needed)."""
    terms = _query_terms(query)
    ids = df.select(id_col, F.size(tokens(text_col)).alias("_dl"))
    # One single-row corpus-stats aggregate (N docs, avg doc length).
    stats = ids.agg(
        F.count("*").alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    )
    toks = df.select(
        F.col(id_col),
        F.explode(F.transform(tokens(text_col), F.lower)).alias("term"),
    ).filter(F.col("term").isin(terms))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("_tf"))
    if share_scan:
        tf = tf.localCheckpoint(eager=False)
    # ≤ len(terms) rows by construction — broadcast back.
    docfreq = tf.groupBy("term").agg(
        F.count_distinct(id_col).alias("_df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    denom = F.col("_tf") + k1 * (
        1.0 - b + b * F.col("_dl") / F.col("_avgdl")
    )
    per_term = idf * (F.col("_tf") * (k1 + 1.0)) / denom
    out = (
        tf.join(F.broadcast(docfreq), "term")
        .join(ids, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.sum(per_term).alias("score"),
            F.count("*").alias("n_terms_matched"),
        )
    )
    if round_scores is not None:
        out = out.withColumn("score", F.round("score", round_scores))
    return out


def bm25_topk(
    df: DataFrame,
    query: str | list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_scores: int | None = 4,
    share_scan: bool = False,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25, deterministically
    (ties → smaller id). ``orderBy().limit()`` compiles to TakeOrdered —
    per-partition top-k then a k-row driver merge, no global sort."""
    scored = bm25_scores(
        df, query, id_col, text_col, k1, b, round_scores, share_scan
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
