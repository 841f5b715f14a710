"""Sequence packing: deterministic bin assignment, boundary overflow
rule (a doc belongs to the bin where it starts), fill stats."""

from __future__ import annotations

from mhm_data_pipelines_spark.operators.packing import (
    pack_documents,
    pack_stats,
)


def test_pack_boundary_and_determinism(spark):
    # Tokens per doc: 3, 3, 3 with budget 5:
    #   doc 1 starts at 0 → bin 0; doc 2 starts at 3 → bin 0 (overflows);
    #   doc 3 starts at 6 → bin 1.
    df = spark.createDataFrame(
        [
            (1, "s", "a b c"),
            (2, "s", "d e f"),
            (3, "s", "g h i"),
            (10, "t", "x y"),
        ],
        "doc_id bigint, source string, text string",
    )
    got = {
        (r.source, r.doc_id): r.pack_id
        for r in pack_documents(df, budget_tokens=5).collect()
    }
    assert got == {("s", 1): 0, ("s", 2): 0, ("s", 3): 1, ("t", 10): 0}
    # stable under repartition
    got2 = {
        (r.source, r.doc_id): r.pack_id
        for r in pack_documents(df.repartition(7), budget_tokens=5).collect()
    }
    assert got == got2


def test_pack_stats_fill(spark):
    df = spark.createDataFrame(
        [(1, "s", "a b c"), (2, "s", "d e f"), (3, "s", "g h i")],
        "doc_id bigint, source string, text string",
    )
    stats = {
        (r.source, r.pack_id): (r.n_docs, r.fill_tokens)
        for r in pack_stats(pack_documents(df, budget_tokens=5)).collect()
    }
    assert stats == {("s", 0): (2, 6), ("s", 1): (1, 3)}
