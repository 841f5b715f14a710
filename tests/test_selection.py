"""DSIR importance weighting: hashed-ngram bucket models, log-ratio
weights, deterministic top-n selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.selection import (
    dsir_log_weights,
    dsir_select,
)


def _frames(spark):
    # Target domain: "spark" jargon. Raw pool: two spark-like docs and
    # two cooking docs.
    target = spark.createDataFrame(
        [
            (100, "spark shuffle partition executor broadcast join"),
            (101, "spark catalyst optimizer predicate pushdown plan"),
        ],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "spark executor broadcast join partition plan"),
            (2, "spark catalyst plan shuffle pushdown"),
            (3, "flour butter sugar eggs vanilla bake oven"),
            (4, "simmer onions garlic tomato basil salt"),
        ],
        "doc_id long, text string",
    )
    return raw, target


def test_dsir_weights_favor_target_like_docs(spark):
    raw, target = _frames(spark)
    w = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(raw, target, buckets=512).collect()
    }
    assert set(w) == {1, 2, 3, 4}
    assert min(w[1], w[2]) > max(w[3], w[4])


def test_dsir_select_top_n(spark):
    raw, target = _frames(spark)
    kept = sorted(
        r.doc_id
        for r in dsir_select(raw, target, n=2, buckets=512).collect()
    )
    assert kept == [1, 2]


def test_dsir_empty_docs_omitted(spark):
    target = spark.createDataFrame(
        [(100, "alpha beta")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "   ")], "doc_id long, text string"
    )
    ids = {r.doc_id for r in dsir_log_weights(raw, target).collect()}
    assert ids == {1}
