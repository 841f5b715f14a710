"""Centroid-distance embedding outlier detection."""

import math

import pytest

from mhm_data_pipelines_spark.operators.similarity import embedding_outliers


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        # group 0: tight cluster at origin + one far point
        (0, 0, [0.0, 0.0]),
        (1, 0, [0.1, 0.0]),
        (2, 0, [0.0, 0.1]),
        (3, 0, [-0.1, 0.0]),
        (4, 0, [10.0, 10.0]),
        # group 1: zero variance in distance (both equidistant from mean)
        (5, 1, [1.0, 0.0]),
        (6, 1, [-1.0, 0.0]),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_grouped_outlier_flagged(spark, vecs):
    # NB: with n points, |z| is bounded by sqrt(n-1) ~= 2 for n=5, so
    # the test threshold sits below the default 2.0.
    got = {
        r.vec_id: r
        for r in embedding_outliers(
            vecs, group_col="label", z_threshold=1.5
        ).collect()
    }
    assert got[4].is_outlier
    assert not any(got[i].is_outlier for i in (0, 1, 2, 3, 5, 6))
    # hand-check the far point's distance to the group-0 centroid (2, 2.02)
    exp = math.sqrt((10.0 - 2.0) ** 2 + (10.0 - 2.02) ** 2)
    assert got[4].dist == pytest.approx(exp, rel=1e-6)


def test_zero_variance_group_z_is_zero(spark, vecs):
    got = embedding_outliers(vecs, group_col="label").filter(
        "group = 1"
    ).collect()
    assert {r.z_score for r in got} == {0.0}
    assert not any(r.is_outlier for r in got)


def test_global_mode_single_group(spark, vecs):
    got = embedding_outliers(vecs.drop("label"), z_threshold=1.5).collect()
    assert {r.group for r in got} == {0}
    flagged = {r.vec_id for r in got if r.is_outlier}
    assert flagged == {4}


def test_threshold_monotone(spark, vecs):
    lo = embedding_outliers(vecs, group_col="label", z_threshold=0.5)
    hi = embedding_outliers(vecs, group_col="label", z_threshold=3.0)
    n_lo = lo.filter("is_outlier").count()
    n_hi = hi.filter("is_outlier").count()
    assert n_lo >= n_hi


# --- hard-negative mining ---------------------------------------------


def test_hard_negatives_excludes_same_label(spark):
    from mhm_data_pipelines_spark.operators.similarity import hard_negatives

    corpus = spark.createDataFrame(
        [
            (10, 0, [1.0, 0.0]),   # same label as query -> excluded
            (11, 1, [0.9, 0.1]),   # close, different label -> hardest
            (12, 1, [0.0, 1.0]),   # orthogonal, different label
            (13, 2, [1.0, 0.05]),  # very close, different label
        ],
        "vec_id long, label int, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, 0, [1.0, 0.0])], "query_id long, label int, embedding array<float>"
    )
    got = hard_negatives(corpus, queries, k=2).collect()
    ids = [r.vec_id for r in got]
    assert 10 not in ids
    assert ids == [13, 11]  # ranked by cosine desc
    assert all(r.neg_label != 0 for r in got)


def test_hard_negatives_min_cosine_floor(spark):
    from mhm_data_pipelines_spark.operators.similarity import hard_negatives

    corpus = spark.createDataFrame(
        [(11, 1, [0.9, 0.1]), (12, 1, [0.0, 1.0])],
        "vec_id long, label int, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, 0, [1.0, 0.0])], "query_id long, label int, embedding array<float>"
    )
    got = hard_negatives(corpus, queries, k=5, min_cosine=0.5).collect()
    assert [r.vec_id for r in got] == [11]


def test_hard_negatives_tie_broken_by_id(spark):
    from mhm_data_pipelines_spark.operators.similarity import hard_negatives

    corpus = spark.createDataFrame(
        [(21, 1, [1.0, 0.0]), (20, 1, [1.0, 0.0]), (22, 1, [0.0, 1.0])],
        "vec_id long, label int, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, 0, [1.0, 0.0])], "query_id long, label int, embedding array<float>"
    )
    got = hard_negatives(corpus, queries, k=2).collect()
    assert [r.vec_id for r in got] == [20, 21]
