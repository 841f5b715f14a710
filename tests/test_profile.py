"""profile_table: per-column stats correctness on a hand-built frame."""

from __future__ import annotations

import pytest

from mhm_data_pipelines_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", None),
            (2, "b", 1.5),
            (3, "b", 2.5),
            (4, None, 2.5),
            (5, "c", 2.5),
        ],
        "id long, s string, v double",
    )


def test_profile_stats_and_top_values(spark, frame):
    out = {r.column: r for r in profile_table(frame).collect()}
    assert set(out) == {"id", "s", "v"}
    s = out["s"]
    assert (s.n_rows, s.n_nulls, s.n_distinct) == (5, 1, 3)
    assert (s.min_value, s.max_value) == ("a", "c")
    # count desc, value asc; NULLs excluded
    assert s.top_values == "b:2, a:1, c:1"
    v = out["v"]
    assert (v.n_nulls, v.n_distinct) == (1, 2)
    assert v.top_values.startswith("2.5:3")
    assert out["id"].dtype == "bigint" and v.dtype == "double"


def test_profile_column_subset_and_approx(spark, frame):
    out = profile_table(
        frame, columns=["s"], exact_distinct=False
    ).collect()
    assert len(out) == 1 and out[0].column == "s"
    # HLL on 3 values is exact
    assert out[0].n_distinct == 3


def test_profile_unknown_column_raises(spark, frame):
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(frame, columns=["nope"])
