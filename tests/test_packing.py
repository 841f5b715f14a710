"""Sequence packing: deterministic bin assignment, boundary overflow
rule (a doc belongs to the bin where it starts), fill stats."""

from __future__ import annotations

import pytest

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


def test_chunk_documents_coverage_and_edges(spark):
    from mhm_data_pipelines_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks -> 3 chunks
            (2, "a b c d"),                              # == chunk size
            (3, "only two"),                             # short
            (4, ""),                                     # empty
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=4, overlap=2)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # stride 2: starts 1,3,5,7 -> 10 tokens need ceil((10-4)/2)=3 extra
    assert [k for k in sorted(rows) if k[0] == 1] == [(1, i) for i in range(4)]
    assert rows[(1, 0)].chunk_text == "t0 t1 t2 t3"
    assert rows[(1, 1)].chunk_text == "t2 t3 t4 t5"
    assert rows[(1, 3)].chunk_text == "t6 t7 t8 t9"
    # every token appears in some chunk (coverage invariant)
    covered = set()
    for (d, _), r in rows.items():
        if d == 1:
            covered.update(r.chunk_text.split())
    assert covered == {f"t{i}" for i in range(10)}
    # boundary doc -> exactly one full chunk; short doc -> itself
    assert [k for k in sorted(rows) if k[0] == 2] == [(2, 0)]
    assert rows[(2, 0)].n_tokens == 4
    assert rows[(3, 0)].chunk_text == "only two"
    # empty text keeps an (empty) chunk-0 row rather than vanishing
    assert rows[(4, 0)].n_tokens == 0

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_length_bucket_stats(spark):
    from mhm_data_pipelines_spark.operators.packing import (
        length_bucket_stats,
    )

    rows = [(i, n) for i, n in enumerate([10, 100, 128, 129, 500, 3000, 4000])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.bucket: r
        for r in length_bucket_stats(
            df, "n_tokens", [128, 512, 2048]
        ).collect()
    }
    # bucket 0: <=128 -> 10, 100, 128 ; cap 128
    b0 = got[0]
    assert (b0.cap, b0.n_seqs, b0.sum_len, b0.max_len) == (128, 3, 238, 128)
    assert b0.pad_efficiency == round(238 / (3 * 128), 6)
    # bucket 1: 129, 500 ; cap 512
    assert (got[1].n_seqs, got[1].cap) == (2, 512)
    # bucket 2 empty -> absent; overflow bucket pads to observed max
    assert 2 not in got
    b3 = got[3]
    assert (b3.cap, b3.n_seqs, b3.max_len) == (4000, 2, 4000)
    assert b3.pad_efficiency == round(7000 / (2 * 4000), 6)


def test_length_bucket_stats_validation_and_nulls(spark):
    import pytest as _pytest

    from mhm_data_pipelines_spark.operators.packing import (
        length_bucket_stats,
    )

    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, -1)], "doc_id long, n_tokens long"
    )
    got = length_bucket_stats(df, "n_tokens", [10]).collect()
    # NULL and negative lengths are rejected rows
    assert len(got) == 1 and got[0].n_seqs == 1
    for bad in ([], [0, 10], [10, 10], [512, 128]):
        with _pytest.raises(ValueError, match="bucket_edges"):
            length_bucket_stats(df, "n_tokens", bad)
