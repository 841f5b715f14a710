"""DSIR importance weighting: hashed-ngram bucket models, log-ratio
weights, deterministic top-n selection."""

from __future__ import annotations

import pytest

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


def test_quality_classifier_separates_domains(spark):
    from mhm_data_pipelines_spark.operators.selection import (
        classifier_score,
        train_quality_classifier,
    )

    raw, target = _frames(spark)
    w, b = train_quality_classifier(
        target, raw.filter(F.col("doc_id") >= 3), buckets=256, iters=10
    )
    scored = {
        r.doc_id: r.prob
        for r in classifier_score(raw, w, b, id_col="doc_id").collect()
    }
    # Spark-jargon docs score above the cooking docs.
    assert min(scored[1], scored[2]) > max(scored[3], scored[4])
    assert 0.0 < min(scored.values()) and max(scored.values()) < 1.0


def test_classifier_score_seeded_weights_deterministic(spark):
    import random

    from mhm_data_pipelines_spark.operators.selection import (
        classifier_score,
    )

    raw, _ = _frames(spark)
    rng = random.Random(3)
    w = [rng.gauss(0.0, 0.1) for _ in range(128)]
    a = {r.doc_id: r.prob for r in classifier_score(raw, w).collect()}
    b = {r.doc_id: r.prob for r in classifier_score(raw, w).collect()}
    assert a == b and len(a) == 4


def test_embedding_decontaminate(spark):
    """A training vector equal to an eval vector must flag; orthogonal
    vectors must not; every training row appears with a real cosine."""
    from mhm_data_pipelines_spark.operators.decontam import (
        embedding_decontaminate,
    )

    ev = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    tr = spark.createDataFrame(
        [
            (10, [2.0, 0.0, 0.0]),   # parallel to eval 0 -> cos 1
            (11, [0.0, 0.0, 5.0]),   # orthogonal to both -> cos 0
            (12, [1.0, 1.0, 0.0]),   # 45 deg -> cos ~0.707
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r
        for r in embedding_decontaminate(tr, ev, threshold=0.95).collect()
    }
    assert len(got) == 3
    assert got[10]["contaminated"] and got[10]["max_eval_cosine"] == 1.0
    assert not got[11]["contaminated"]
    assert got[11]["max_eval_cosine"] == 0.0
    assert not got[12]["contaminated"]
    assert abs(got[12]["max_eval_cosine"] - 0.7071067811865475) < 1e-12


def test_embedding_decontaminate_empty_eval(spark):
    """Empty eval side: every training row still appears, verdict
    false, cosine NULL (nothing to leak from)."""
    from mhm_data_pipelines_spark.operators.decontam import (
        embedding_decontaminate,
    )

    ev = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    tr = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in embedding_decontaminate(tr, ev).collect()}
    assert set(got) == {1, 2}
    assert all(not r["contaminated"] for r in got.values())
    assert all(r["max_eval_cosine"] is None for r in got.values())


def test_quantile_bucket_assign_terciles(spark):
    from mhm_data_pipelines_spark.operators.selection import (
        quantile_bucket_assign,
    )

    # group g: scores 1..9 -> q0 = percentile(1/3) interp, q1 = p(2/3).
    rows = [(i, "g", float(i)) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    out = quantile_bucket_assign(df, "score", "grp")
    got = {r.id: r.bucket for r in out.collect()}
    # exact percentile on 1..9: q0 = 1 + 8/3 = 3.667, q1 = 1 + 16/3 = 6.333
    # descending=True: top band (score > q1) = head.
    want = {
        1: "tail", 2: "tail", 3: "tail",
        4: "middle", 5: "middle", 6: "middle",
        7: "head", 8: "head", 9: "head",
    }
    assert got == want


def test_quantile_bucket_assign_boundary_ties_same_band(spark):
    from mhm_data_pipelines_spark.operators.selection import (
        quantile_bucket_assign,
    )

    # 6 equal scores: every threshold equals the value; `<=` puts ALL
    # rows in the first (ascending) band -> with descending labels all
    # land in 'tail', never split by row order.
    rows = [(i, "g", 5.0) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    out = quantile_bucket_assign(df, "score", "grp")
    assert {r.bucket for r in out.collect()} == {"tail"}


def test_quantile_bucket_assign_per_group_independent(spark):
    from mhm_data_pipelines_spark.operators.selection import (
        quantile_bucket_assign,
    )

    rows = [(i, "a", float(i)) for i in range(3)] + [
        (10 + i, "b", float(100 + i)) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    out = quantile_bucket_assign(df, "score", "grp")
    got = {r.id: r.bucket for r in out.collect()}
    # each group terciles over its OWN range: one row per band
    assert got == {
        0: "tail", 1: "middle", 2: "head",
        10: "tail", 11: "middle", 12: "head",
    }


def test_quantile_bucket_assign_validation(spark):
    import pytest

    from mhm_data_pipelines_spark.operators.selection import (
        quantile_bucket_assign,
    )

    df = spark.createDataFrame([(1, "g", 1.0)], "id long, grp string, score double")
    with pytest.raises(ValueError):
        quantile_bucket_assign(df, "score", "grp", quantiles=[0.5], labels=["a"])
    with pytest.raises(ValueError):
        quantile_bucket_assign(
            df, "score", "grp", quantiles=[0.7, 0.3], labels=["a", "b", "c"]
        )


def test_source_ngram_overlap_hand_computed(spark):
    from mhm_data_pipelines_spark.operators.decontam import (
        source_ngram_overlap,
    )

    # 3-gram vocabularies: A = {a b c, b c d}, B = {a b c, b c x},
    # C shares nothing. A∩B = {a b c} -> jaccard 1/3.
    df = spark.createDataFrame(
        [
            (1, "A", "a b c d"),
            (2, "B", "a b c x"),
            (3, "C", "q r s t"),
        ],
        "doc_id long, source string, text string",
    )
    rows = source_ngram_overlap(df).collect()
    got = {
        (r.group_a, r.group_b): (r.n_common, r.n_a, r.n_b, r.jaccard)
        for r in rows
    }
    assert got == {("A", "B"): (1, 2, 2, round(1 / 3, 6))}


def test_source_ngram_overlap_duplicate_grams_count_once(spark):
    from mhm_data_pipelines_spark.operators.decontam import (
        source_ngram_overlap,
    )

    # the shared gram appears in MANY docs of both sources; vocabulary
    # overlap still counts it once per pair.
    df = spark.createDataFrame(
        [(i, "A" if i % 2 else "B", "x y z") for i in range(10)],
        "doc_id long, source string, text string",
    )
    rows = source_ngram_overlap(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_common, r.n_a, r.n_b, r.jaccard) == (1, 1, 1, 1.0)


def test_split_leakage_reports_cross_split_fingerprints(spark):
    from mhm_data_pipelines_spark.operators.decontam import split_leakage

    rows = [
        (1, "train", "The Quick   brown fox"),
        (2, "test", "the quick brown fox"),    # normalizes equal -> leak
        (3, "train", "unique to train"),
        (4, "val", "shared three ways"),
        (5, "test", "Shared Three Ways"),
        (6, "train", "shared  three ways"),
        (7, "train", "dup inside one split"),
        (8, "train", "dup inside one split"),  # same split: NOT a leak
    ]
    df = spark.createDataFrame(rows, "doc_id long, split string, text string")
    got = sorted(
        (r.splits, r.n_splits, r.n_docs)
        for r in split_leakage(df).collect()
    )
    assert got == [("test,train", 2, 2), ("test,train,val", 3, 3)]


def test_source_divergence_hand_computed(spark):
    import math

    from mhm_data_pipelines_spark.operators.decontam import (
        source_divergence,
    )

    df = spark.createDataFrame(
        [(1, "A", "x X y"), (2, "B", "y z")],
        "doc_id long, source string, text string",
    )
    got = {r.group: r for r in source_divergence(df).collect()}
    # corpus: x2 y2 z1 (N=5); A: x 2/3, y 1/3; B: y 1/2, z 1/2
    kl_a = (2 / 3) * math.log((2 / 3) / (2 / 5)) + (1 / 3) * math.log(
        (1 / 3) / (2 / 5)
    )
    kl_b = 0.5 * math.log(0.5 / (2 / 5)) + 0.5 * math.log(0.5 / (1 / 5))
    assert got["A"].kl_vs_corpus == round(kl_a, 6)
    assert got["B"].kl_vs_corpus == round(kl_b, 6)
    assert (got["A"].n_tokens, got["A"].n_terms) == (3, 2)
    assert (got["B"].n_tokens, got["B"].n_terms) == (2, 2)


def test_source_divergence_identical_sources_zero(spark):
    from mhm_data_pipelines_spark.operators.decontam import (
        source_divergence,
    )

    df = spark.createDataFrame(
        [(1, "A", "a b c"), (2, "B", "a b c")],
        "doc_id long, source string, text string",
    )
    got = source_divergence(df).collect()
    assert all(r.kl_vs_corpus == 0.0 for r in got)


# ------------------------------------------------------------- calibration
from mhm_data_pipelines_spark.operators.selection import calibration_curve


def test_calibration_hand_computed(spark):
    # bin 0.9x: scores .95,.95 labels 1,0 -> conf .95, acc .5
    # bin 0.0x: score .05 label 0 -> conf .05, acc 0
    rows = [(0.95, 1), (0.95, 0), (0.05, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r["bin"]: r for r in calibration_curve(df, "score", "label").collect()}
    assert set(out) == {0, 9}
    assert out[9]["conf"] == 0.95 and out[9]["acc"] == 0.5
    assert out[9]["ece_term"] == round(2 / 3 * abs(0.5 - 0.95), 6)
    assert out[0]["ece_term"] == round(1 / 3 * abs(0.0 - 0.05), 6)


def test_calibration_right_edge_and_nulls(spark):
    rows = [(1.0, 1), (0.999, 1), (None, 1), (0.5, None)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r["bin"]: r for r in calibration_curve(df, "score", "label").collect()}
    assert set(out) == {9}  # score 1.0 folds into the last bin
    assert out[9]["n"] == 2


def test_calibration_perfectly_calibrated_zero_ece(spark):
    # in each bin, acc == conf exactly
    rows = [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0),
            (0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = calibration_curve(df, "score", "label", bins=4).collect()
    assert all(r["ece_term"] == 0.0 for r in out)


# ------------------------------------------------------------- novelty
from mhm_data_pipelines_spark.operators.decontam import novelty_scores


def test_novelty_hand_computed(spark):
    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),        # all 3 trigrams shared
            (2, "a totally different sentence here"), # none shared
            (3, "the quick brown cat sat down"),      # 1 of 4 shared
            (4, "too short"),                          # < n tokens -> absent
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in novelty_scores(docs, ref, n=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["novelty"] == 0.0 and out[1]["n_matched"] == 3
    assert out[2]["novelty"] == 1.0 and out[2]["n_matched"] == 0
    assert out[3]["n_ngrams"] == 4 and out[3]["n_matched"] == 1
    assert out[3]["novelty"] == 0.75


# --------------------------------------------------- split conformal


def test_conformal_threshold_is_exact_order_statistic(spark):
    from mhm_data_pipelines_spark.operators.selection import (
        conformal_report,
    )

    # 9 calibration scores 1..9; alpha=0.1 -> k = ceil(10*0.9) = 9
    # -> q_hat = 9th smallest = 9.0.
    cal = spark.createDataFrame(
        [(float(i),) for i in range(1, 10)], "residual double"
    )
    ev = spark.createDataFrame(
        [(0.5,), (9.0,), (9.5,)], "residual double"
    )
    row = conformal_report(cal, ev, alpha=0.1).collect()[0]
    assert (row["n_cal"], row["k"]) == (9, 9)
    assert row["q_hat"] == 9.0
    assert row["coverage"] == round(2 / 3, 6)  # 0.5 and 9.0 covered
    assert row["target"] == 0.9


def test_conformal_coverage_guarantee_on_exchangeable_data(spark):
    import random

    from mhm_data_pipelines_spark.operators.selection import (
        conformal_report,
    )

    random.seed(3)
    scores = [random.gauss(0, 1) ** 2 for _ in range(2000)]
    cal = spark.createDataFrame(
        [(s,) for s in scores[:1000]], "residual double"
    )
    ev = spark.createDataFrame(
        [(s,) for s in scores[1000:]], "residual double"
    )
    row = conformal_report(cal, ev, alpha=0.2).collect()[0]
    # finite-sample guarantee: coverage ~ 0.8, binomial noise band
    assert 0.74 <= row["coverage"] <= 0.88


def test_conformal_degenerate_small_cal_is_null(spark):
    from mhm_data_pipelines_spark.operators.selection import (
        conformal_report,
    )

    # n_cal = 3, alpha = 0.1 -> k = ceil(4*0.9) = 4 > 3: no finite
    # threshold can guarantee 90%.
    cal = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,)], "residual double"
    )
    ev = spark.createDataFrame([(0.5,)], "residual double")
    row = conformal_report(cal, ev, alpha=0.1).collect()[0]
    assert row["q_hat"] is None and row["coverage"] is None
    assert row["k"] is None and row["n_cal"] == 3


def test_conformal_alpha_guard(spark):
    import pytest as _pytest

    from mhm_data_pipelines_spark.operators.selection import (
        conformal_report,
    )

    df = spark.createDataFrame([(1.0,)], "residual double")
    with _pytest.raises(ValueError):
        conformal_report(df, df, alpha=0.0)


class TestTargetEncode:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "id long, cat string, y double"
        )

    def test_out_of_fold_replay(self, spark):
        import hashlib

        from mhm_data_pipelines_spark.operators.selection import (
            target_encode,
        )

        rows = [
            (i, "ab"[i % 2], float((i * 7) % 5)) for i in range(40)
        ]
        df = self._df(spark, rows)
        got = target_encode(
            df, "cat", "y", "id", folds=3, smoothing=2.0
        ).collect()

        def fold(i):
            h = int(
                hashlib.md5(f"{i}:42".encode()).hexdigest()[:15], 16
            )
            return int((h / 16**15) * 3)

        mu = sum(r[2] for r in rows) / len(rows)
        import collections

        sy = collections.defaultdict(float)
        ny = collections.defaultdict(int)
        for i, c, y in rows:
            sy[(c, fold(i))] += y
            ny[(c, fold(i))] += 1
        sy_c = collections.defaultdict(float)
        ny_c = collections.defaultdict(int)
        for (c, f), v in sy.items():
            sy_c[c] += v
        for (c, f), v in ny.items():
            ny_c[c] += v
        for r in got:
            f = fold(r["id"])
            assert r["fold"] == f
            want = (
                sy_c[r["cat"]] - sy[(r["cat"], f)] + 2.0 * mu
            ) / (ny_c[r["cat"]] - ny[(r["cat"], f)] + 2.0)
            assert r["te"] == pytest.approx(want)

    def test_no_own_label_leakage_single_fold_category(self, spark):
        from mhm_data_pipelines_spark.operators.selection import (
            target_encode,
        )

        # category "z" has one row: its own fold's stats are excluded,
        # so the encoding must be exactly the smoothed prior mu.
        rows = [(1, "z", 100.0)] + [
            (i, "a", 1.0) for i in range(2, 12)
        ]
        df = self._df(spark, rows)
        out = {
            r["id"]: r["te"]
            for r in target_encode(
                df, "cat", "y", "id", folds=5, smoothing=10.0
            ).collect()
        }
        mu = (100.0 + 10.0) / 11
        assert out[1] == pytest.approx(mu)

    def test_null_category_and_null_target(self, spark):
        from mhm_data_pipelines_spark.operators.selection import (
            target_encode,
        )

        rows = [(1, None, 5.0), (2, None, 5.0), (3, "a", None)]
        df = self._df(spark, rows)
        out = target_encode(df, "cat", "y", "id", folds=2).collect()
        assert len(out) == 3  # NULL-target row still encoded
        assert all(r["te"] is not None for r in out)

    def test_guards(self, spark):
        from mhm_data_pipelines_spark.operators.selection import (
            target_encode,
        )

        df = self._df(spark, [(1, "a", 1.0)])
        with pytest.raises(ValueError, match="folds"):
            target_encode(df, "cat", "y", "id", folds=1)
        with pytest.raises(ValueError, match="smoothing"):
            target_encode(df, "cat", "y", "id", smoothing=0.0)


class TestSkyline:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "id long, x double, y double"
        )

    @staticmethod
    def _brute(rows, maximize=True):
        s = 1 if maximize else -1
        pts = [(i, s * x, s * y) for i, x, y in rows
               if x is not None and y is not None]
        out = []
        for i, x, y in pts:
            dominated = any(
                (a >= x and b >= y and (a > x or b > y))
                for j, a, b in pts if j != i
            )
            if not dominated:
                out.append(i)
        return sorted(out)

    def test_matches_bruteforce_random(self, spark):
        import random

        from mhm_data_pipelines_spark.operators.selection import skyline

        rng = random.Random(7)
        rows = [
            (i, round(rng.uniform(0, 10), 2), round(rng.uniform(0, 10), 2))
            for i in range(300)
        ]
        got = sorted(
            r["id"]
            for r in skyline(
                self._df(spark, rows).repartition(8), ["x", "y"], ["id"]
            ).collect()
        )
        assert got == self._brute(rows)

    def test_minimize_and_duplicates_survive_together(self, spark):
        from mhm_data_pipelines_spark.operators.selection import skyline

        rows = [(1, 1.0, 1.0), (2, 1.0, 1.0), (3, 2.0, 2.0),
                (4, 0.5, 3.0)]
        got = sorted(
            r["id"]
            for r in skyline(
                self._df(spark, rows), ["x", "y"], ["id"],
                maximize=False,
            ).collect()
        )
        # minimizing: (1,1) duplicates both survive (equal points
        # don't dominate), (0.5,3) survives, (2,2) dominated by (1,1)
        assert got == [1, 2, 4]

    def test_null_metrics_dropped_and_guard(self, spark):
        import pytest as _pytest

        from mhm_data_pipelines_spark.operators.selection import skyline

        rows = [(1, 5.0, None), (2, 1.0, 1.0)]
        got = [r["id"] for r in
               skyline(self._df(spark, rows), ["x", "y"], ["id"]).collect()]
        assert got == [2]
        with _pytest.raises(ValueError, match="metric_cols"):
            skyline(self._df(spark, rows), [], ["id"])

    def test_three_dims(self, spark):
        import random

        from mhm_data_pipelines_spark.operators.selection import skyline

        rng = random.Random(11)
        rows = [
            (i, float(rng.randint(0, 5)), float(rng.randint(0, 5)),
             float(rng.randint(0, 5)))
            for i in range(200)
        ]
        df = spark.createDataFrame(
            rows, "id long, x double, y double, z double"
        ).repartition(6)
        got = sorted(
            r["id"] for r in skyline(df, ["x", "y", "z"], ["id"]).collect()
        )
        s = 1
        pts = [(i, x, y, z) for i, x, y, z in rows]
        brute = sorted(
            i for i, x, y, z in pts
            if not any(
                a >= x and b >= y and c >= z and (a > x or b > y or c > z)
                for j, a, b, c in pts if j != i
            )
        )
        assert got == brute
