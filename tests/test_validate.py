"""Constraint-suite validation: one aggregate for all row-local rules,
NULL semantics per the expectations convention, exact violation counts."""

import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.validate import validate_constraints


@pytest.fixture(scope="module")
def facts(spark):
    return spark.createDataFrame(
        [
            (1, 10, "O", 5.0, "1-URGENT"),
            (2, 20, "F", -3.0, "2-HIGH"),     # range violation
            (2, 30, "X", 7.0, "9-BOGUS"),     # dup key, bad status+prio
            (4, None, "O", None, "3-MEDIUM"),  # null custkey; null price OK
            (5, 99, "P", 12.0, "4-LOW"),       # custkey 99 not in dim
        ],
        "okey long, ckey long, status string, price double, prio string",
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(10,), (20,), (30,)], "ck long")


RULES = [
    {"name": "ckey_not_null", "kind": "not_null", "col": "ckey"},
    {"name": "price_range", "kind": "range", "col": "price",
     "min": 0.0, "max": 100.0},
    {"name": "status_set", "kind": "in_set", "col": "status",
     "values": ["O", "F", "P"]},
    {"name": "prio_regex", "kind": "regex", "col": "prio",
     "pattern": "^[1-5]-"},
    {"name": "okey_unique", "kind": "unique", "cols": ["okey"]},
    {"name": "ckey_in_dim", "kind": "ref_integrity", "col": "ckey",
     "ref": "dim", "ref_col": "ck"},
]


def test_validate_counts_and_null_semantics(facts, dim):
    got = {
        r["rule"]: r
        for r in validate_constraints(
            facts, RULES, refs={"dim": dim}
        ).collect()
    }
    assert len(got) == 6
    assert all(r["total"] == 5 for r in got.values())
    assert got["ckey_not_null"]["violations"] == 1
    assert got["price_range"]["violations"] == 1   # NULL price passes
    assert got["status_set"]["violations"] == 1
    assert got["prio_regex"]["violations"] == 1
    assert got["okey_unique"]["violations"] == 1   # one surplus row
    assert got["ckey_in_dim"]["violations"] == 1   # 99; NULL passes
    assert not any(r["passed"] for r in got.values())


def test_validate_passing_suite_and_custom(spark):
    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "a long, b double")
    got = {
        r["rule"]: r
        for r in validate_constraints(
            df,
            [
                {"name": "a_nn", "kind": "not_null", "col": "a"},
                {"name": "a_uni", "kind": "unique", "cols": ["a"]},
                {"name": "b_gt_a", "kind": "custom",
                 "expr": ~(F.col("b") > F.col("a"))},
            ],
        ).collect()
    }
    assert all(r["passed"] and r["violations"] == 0 for r in got.values())


def test_validate_single_pass_plan(spark):
    """All row-local rules compile into ONE aggregate over ONE scan —
    the plan contains exactly one scan of the input."""
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("m")
    )
    rep = validate_constraints(
        df,
        [
            {"name": f"r{i}", "kind": "range", "col": "m", "min": 0,
             "max": 1}
            for i in range(8)
        ]
        + [{"name": "nn", "kind": "not_null", "col": "id"}],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 10") == 1  # one scan for 9 rules
    assert rep.count() == 9


def test_validate_rule_validation(spark, facts=None):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError, match="unique 'name'"):
        validate_constraints(
            df, [{"name": "x", "kind": "not_null", "col": "a"},
                 {"name": "x", "kind": "not_null", "col": "a"}]
        )
    with pytest.raises(ValueError, match="unknown rule kind"):
        validate_constraints(df, [{"name": "x", "kind": "nope"}])
    with pytest.raises(ValueError, match="unknown frame"):
        validate_constraints(
            df, [{"name": "x", "kind": "ref_integrity", "col": "a",
                  "ref": "missing", "ref_col": "a"}]
        )
