"""Registry-wide physical-plan regression properties.

Every registry query's plan must be shuffle-sane at 100 TB: no
CartesianProduct anywhere, and BroadcastNestedLoopJoin only where the
broadcast side is a provably tiny scalar aggregate (single-row
broadcast — the scalar-subquery realization pattern). A new query that
accidentally plans a cross product fails here before it ever ships.
"""

from __future__ import annotations

import pytest

from mhm_data_pipelines_spark.benchmarks.registry import QUERIES

SF = "/root/testdata/sf0.001"

#: Queries whose CONSTRUCTION executes jobs (streaming drain, iterative
#: component loops) — planned-shape checks run on their building blocks'
#: own tests instead.
EXECUTES_ON_BUILD = {
    "stateful_sessions_stream",
    "stream_dedup",
    "stream_interval_join",
    "neardup_clusters",
    "neardup_dedup_keep",
    "corpus_prep",
    "tpch_q11",  # localCheckpoint of the reused per-part aggregate
}

#: Queries where a BroadcastNestedLoopJoin is EXPECTED: they cross-join
#: a single-row aggregate (scalar subquery pattern — n_docs, scalar avg,
#: global max). The broadcast side is one row; the "nested loop" is a
#: constant append. Keep this list tight — additions need justification.
SINGLE_ROW_BROADCAST_OK = {
    "tfidf_top_terms",    # crossJoin(broadcast(count_distinct n_docs))
    "doc_lm_score",       # crossJoin(broadcast(corpus token total)) — 1 row
    "tpch_q22",           # crossJoin(broadcast(avg acctbal))
    "doc_quality",        # quality normalization scalar (if planned so)
    "value_percentiles",  # scalar percentile bounds
    "summary_assembly",
    "corpus_prep",
    "balanced_classes",   # crossJoin(broadcast(min class count)) — 1 row
    "zorder_layout",      # crossJoin(broadcast(per-column min/max)) — 1 row
    "missing_data",       # distinct-participants × distinct-metrics grid:
                          # a dims×dims cross building the expected-cell
                          # universe (J3), both sides tiny aggregates
}


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - EXECUTES_ON_BUILD)
)
def test_no_cartesian_or_unexpected_nested_loop(spark, name):
    plan = (
        QUERIES[name](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name} plans a cross product"
    if name not in SINGLE_ROW_BROADCAST_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop join; if the broadcast side is a "
            "single-row scalar, whitelist it explicitly"
        )
