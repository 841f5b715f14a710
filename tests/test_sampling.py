"""Deterministic sampling/splits: stability under repartition, fraction
bounds, group-leakage-free splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.sampling import (
    deterministic_sample,
    train_val_test_split,
)


@pytest.fixture(scope="module")
def rows(spark):
    return spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("grp")
    )


def test_sample_stable_under_repartition(rows):
    a = {r.id for r in deterministic_sample(rows, 0.2, "id").collect()}
    b = {
        r.id
        for r in deterministic_sample(rows.repartition(13), 0.2, "id").collect()
    }
    assert a == b
    assert 0.15 < len(a) / 10_000 < 0.25


def test_sample_fraction_monotone(rows):
    small = {r.id for r in deterministic_sample(rows, 0.1, "id").collect()}
    big = {r.id for r in deterministic_sample(rows, 0.3, "id").collect()}
    assert small <= big  # nested samples: bucket < f1*B implies < f2*B


def test_split_proportions_and_no_group_leakage(rows):
    out = train_val_test_split(rows, key="grp").collect()
    by_split = {}
    grp_splits = {}
    for r in out:
        by_split[r.split] = by_split.get(r.split, 0) + 1
        grp_splits.setdefault(r.grp, set()).add(r.split)
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split["train"] / 10_000 > 0.6
    # every group lands wholly in one split (97 groups hashed)
    assert all(len(s) == 1 for s in grp_splits.values())


def test_split_weights_validation(rows):
    with pytest.raises(ValueError, match="sum to 1"):
        train_val_test_split(rows, key="id", weights={"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(rows, 1.5, "id")


def test_stratified_exact_quota_and_determinism(rows, spark):
    from mhm_data_pipelines_spark.operators.sampling import stratified_sample

    # 97 strata of ~103 rows; quota 10 → exactly 10 each.
    s = stratified_sample(rows, ["grp"], 10, "id")
    counts = {r.grp: r.n for r in s.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert set(counts.values()) == {10}
    a = {(r.grp, r.id) for r in s.collect()}
    b = {
        (r.grp, r.id)
        for r in stratified_sample(rows.repartition(17), ["grp"], 10, "id").collect()
    }
    assert a == b


def test_stratified_small_stratum_passthrough(spark):
    from mhm_data_pipelines_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id bigint, s string"
    )
    assert stratified_sample(df, ["s"], 5, "id").count() == 3


def test_balance_classes_to_minority(spark):
    from mhm_data_pipelines_spark.operators.sampling import balance_classes

    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") < 700, "big").otherwise(
            F.when(F.col("id") < 900, "mid").otherwise("small")
        ).alias("label"),
    )
    out = balance_classes(df, "label", "id")
    counts = {
        r.label: r.n
        for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"big": 100, "mid": 100, "small": 100}


def test_mix_sources_quotas_and_determinism(spark):
    from mhm_data_pipelines_spark.operators.sampling import mix_sources

    df = spark.createDataFrame(
        [(i, f"src{i % 4}") for i in range(100)],
        "doc_id long, source string",
    )
    weights = {"src0": 0.5, "src1": 0.25, "src2": 0.25}
    out = mix_sources(df, weights, total=40, key="doc_id")
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # exact quotas: floor(w * total); src3 absent from weights -> dropped
    assert counts == {"src0": 20, "src1": 10, "src2": 10}
    # deterministic under repartition (content-hash rank, not df.sample)
    again = mix_sources(df.repartition(13), weights, total=40, key="doc_id")
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
    # source smaller than quota passes through whole
    small = mix_sources(df, {"src0": 1.0}, total=999, key="doc_id")
    assert small.count() == 25


def test_running_total_matches_single_window(spark):
    from pyspark.sql import Window
    from mhm_data_pipelines_spark.operators.budget import running_total

    df = spark.createDataFrame(
        [(i, (i * 37) % 11 + 1) for i in range(500)], "id long, v long"
    )
    got = {
        r.id: r.running_total
        for r in running_total(
            df, order_by=[F.desc("v"), F.col("id")], value_col="v",
            num_partitions=7,
        ).collect()
    }
    w = (
        Window.orderBy(F.desc("v"), F.col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r.id: r.rt
        for r in df.withColumn("rt", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_select_to_budget_greedy_prefix(spark):
    from mhm_data_pipelines_spark.operators.budget import select_to_budget

    df = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (4, 4)], "id long, v long"
    )
    out = select_to_budget(
        df, budget=10, order_by=["id"], value_col="v"
    ).collect()
    # 4+4=8 fits, third row would hit 12 > 10 -> exactly two rows
    assert sorted((r.id, r.running_total) for r in out) == [(1, 4), (2, 8)]
    empty = select_to_budget(df, budget=3, order_by=["id"], value_col="v")
    assert empty.count() == 0


def test_running_total_deterministic_buckets_no_materialization(
    spark, tmp_path
):
    """Range buckets are literal-boundary value functions: re-executing
    the returned frame (two collects, offsets job vs final job) must
    assign identical _pid per row with NO checkpoint/persist in the plan
    — the 100 TB contract is 'no full-corpus materialization'. Also
    pins the boundary-tie semantics: duplicate keys around a cut point
    must not split nondeterministically (total order via tiebreaker)."""
    from mhm_data_pipelines_spark.operators.budget import running_total

    src = str(tmp_path / "rt_src")
    spark.createDataFrame(
        [(i, (i * 13) % 7 + 1) for i in range(300)], "id long, v long"
    ).write.parquet(src)
    df = spark.read.parquet(src)
    out = running_total(df, order_by=["id"], value_col="v", num_partitions=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The plan reads the parquet source directly (cheap, parallel, column
    # pruning intact) instead of frozen checkpoint blocks — determinism
    # comes from the literal boundaries. (The broadcast offsets frame is
    # a driver-local ExistingRDD; the SOURCE must stay a FileScan.)
    assert "Scan parquet" in plan or "FileScan" in plan
    a = sorted((r.id, r.running_total) for r in out.collect())
    b = sorted((r.id, r.running_total) for r in out.collect())
    assert a == b
    last = max(r[1] for r in a)
    assert last == sum((i * 13) % 7 + 1 for i in range(300))
    # heavy ties + tiebreaker: correctness must survive equal keys
    # straddling any boundary
    dup = spark.createDataFrame(
        [(i, i % 3, 1) for i in range(400)], "id long, k long, v long"
    )
    got = running_total(
        dup, order_by=["k", "id"], value_col="v", num_partitions=8
    )
    rows = {(r.k, r.id): r.running_total for r in got.collect()}
    want_order = sorted(rows, key=lambda t: (t[0], t[1]))
    for rank, key in enumerate(want_order, start=1):
        assert rows[key] == rank, (key, rows[key], rank)


def test_mix_sources_decimal_exact_quotas(spark):
    """float repr must not shave quotas: 0.29*100 is 28.999... in binary
    float; the decimal-exact quota is 29."""
    from mhm_data_pipelines_spark.operators.sampling import mix_sources

    df = spark.createDataFrame(
        [(i, "a" if i < 60 else "b") for i in range(120)],
        "doc_id long, source string",
    )
    out = mix_sources(df, {"a": 0.29, "b": 0.07}, total=100, key="doc_id")
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a": 29, "b": 7}


def test_temperature_mix_integer_exact_quotas(spark):
    from math import isqrt

    from mhm_data_pipelines_spark.operators.sampling import temperature_mix

    # sources with very skewed sizes: T=2 upweights the small ones
    sizes = {"big": 400, "mid": 100, "small": 25}
    rows = [
        (f"{s}-{i}", s) for s, n in sizes.items() for i in range(n)
    ]
    df = spark.createDataFrame(rows, "key string, source string")
    total = 300
    out = temperature_mix(df, total=total, key="key")
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    ws = {s: isqrt(n) for s, n in sizes.items()}
    sw = sum(ws.values())
    want = {s: min((total * w) // sw, sizes[s]) for s, w in ws.items()}
    assert counts == want
    # sqrt weighting: small source share (≈14%) beats natural (~4.8%)
    assert counts["small"] / total > sizes["small"] / sum(sizes.values())

    # deterministic under repartition
    a = {r.key for r in out.collect()}
    b = {
        r.key
        for r in temperature_mix(
            df.repartition(7), total=total, key="key"
        ).collect()
    }
    assert a == b


def test_temperature_mix_validates_temperature(spark):
    from mhm_data_pipelines_spark.operators.sampling import temperature_mix

    df = spark.createDataFrame([("a", "s")], "key string, source string")
    with pytest.raises(ValueError):
        temperature_mix(df, total=1, key="key", temperature=0.0)


def test_running_total_decimal_ordering_key(spark):
    from decimal import Decimal

    from mhm_data_pipelines_spark.operators.budget import running_total

    rows = [(i, Decimal(f"{i}.25"), 1) for i in range(1, 9)]
    df = spark.createDataFrame(
        rows, "id long, price decimal(10,2), v long"
    ).repartition(4)
    out = running_total(
        df, order_by=["price", "id"], value_col="v", num_partitions=3
    ).collect()
    got = {r.id: r.running_total for r in out}
    assert got == {i: i for i in range(1, 9)}


def test_weighted_sample_statistical_bias(spark):
    """Heavy-weight rows must be selected far more often: with weights
    100 vs 1 at a 50% sampling rate, the heavy group should be nearly
    exhausted while the light group stays clearly below it."""
    from mhm_data_pipelines_spark.operators.sampling import weighted_sample

    rows = [(i, 100.0 if i < 200 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = weighted_sample(df, n=200, weight_col="w", key="id").collect()
    assert len(got) == 200
    heavy = sum(1 for r in got if r["id"] < 200)
    assert heavy > 180  # P[this failing by chance] is astronomically small


def test_weighted_sample_deterministic_across_partitionings(spark):
    from mhm_data_pipelines_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "w"])
    a = {r["id"] for r in weighted_sample(df, 50, "w", "id").collect()}
    b = {
        r["id"]
        for r in weighted_sample(df.repartition(13), 50, "w", "id").collect()
    }
    assert a == b
    # Different seed -> (almost surely) different sample.
    c = {
        r["id"]
        for r in weighted_sample(df, 50, "w", "id", seed=7).collect()
    }
    assert a != c


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from mhm_data_pipelines_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "id int, w double",
    )
    got = {r["id"] for r in weighted_sample(df, 10, "w", "id").collect()}
    assert got == {1, 5}


def test_weighted_sample_n_validation(spark):
    import pytest as _pytest

    from mhm_data_pipelines_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(1, 1.0)], ["id", "w"])
    with _pytest.raises(ValueError):
        weighted_sample(df, 0, "w", "id")


def test_curriculum_order_bands_and_determinism(spark):
    from mhm_data_pipelines_spark.operators.sampling import curriculum_order

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc_id long, difficulty double"
    )
    got = curriculum_order(df, "difficulty", n_bands=4).collect()
    by_band = {}
    for r in got:
        by_band.setdefault(r.band, []).append(r.difficulty)
    # quartile bands of 0..99: 25 rows each, easy band holds low scores
    assert {b: len(v) for b, v in by_band.items()} == {
        0: 25, 1: 25, 2: 25, 3: 25
    }
    assert max(by_band[0]) < min(by_band[1])
    assert max(by_band[2]) < min(by_band[3])
    # order_key deterministic across invocations
    again = curriculum_order(df, "difficulty", n_bands=4).collect()
    assert {(r.doc_id, r.order_key) for r in got} == {
        (r.doc_id, r.order_key) for r in again
    }
    # a different seed reshuffles within bands
    other = curriculum_order(df, "difficulty", n_bands=4, seed=7).collect()
    assert {(r.doc_id, r.order_key) for r in got} != {
        (r.doc_id, r.order_key) for r in other
    }


def test_curriculum_order_null_scores_dropped_and_validation(spark):
    import pytest as _pytest

    from mhm_data_pipelines_spark.operators.sampling import curriculum_order

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "doc_id long, difficulty double"
    )
    got = curriculum_order(df, "difficulty", n_bands=2).collect()
    assert sorted(r.doc_id for r in got) == [1, 3]
    with _pytest.raises(ValueError, match="n_bands"):
        curriculum_order(df, "difficulty", n_bands=1)


def test_curriculum_cutpoint_ties_go_to_lower_band(spark):
    from mhm_data_pipelines_spark.operators.sampling import curriculum_order

    # scores 1,1,2,2 with n_bands=2: median is 1.5; exact-integer
    # scores never straddle ambiguously. With 1,2,2,2 median is 2.0 and
    # the rows AT the cut must land in band 0.
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 2.0), (4, 2.0)],
        "doc_id long, difficulty double",
    )
    got = {r.doc_id: r.band for r in curriculum_order(
        df, "difficulty", n_bands=2
    ).collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 0}


def test_mix_rates_closed_form_and_cap(spark):
    from mhm_data_pipelines_spark.operators.sampling import mix_rates

    rows = (
        [(i, "big") for i in range(100)]
        + [(100 + i, "small") for i in range(10)]
        + [(200 + i, "unlisted") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r.group: r for r in mix_rates(
        df, "source", {"big": 0.5, "small": 0.5, "ghost": 1.0}, total=40
    ).collect()}
    # big: 0.5*40/100 = 0.2 ; small wants 20 of 10 -> capped at 1.0
    assert got["big"].rate == 0.2 and not got["big"].capped
    assert got["big"].expected_rows == 20.0
    assert got["small"].rate == 1.0 and got["small"].capped
    assert got["small"].expected_rows == 10.0
    # unlisted source -> share 0, dropped; ghost absent from data
    assert got["unlisted"].rate == 0.0
    assert "ghost" not in got


def test_apply_mix_deterministic_and_proportional(spark):
    from mhm_data_pipelines_spark.operators.sampling import (
        apply_mix,
        mix_rates,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)],
        "doc_id long, source string",
    )
    rates = mix_rates(df, "source", {"a": 0.25, "b": 0.75}, total=1000)
    kept = apply_mix(df, rates, "source", "doc_id")
    n_a = kept.filter("source = 'a'").count()
    n_b = kept.filter("source = 'b'").count()
    # expected 250 / 750 within sampling tolerance
    assert abs(n_a - 250) < 60 and abs(n_b - 750) < 60
    again = apply_mix(df, rates, "source", "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_mix_rates_validation(spark):
    import pytest as _pytest

    from mhm_data_pipelines_spark.operators.sampling import mix_rates

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with _pytest.raises(ValueError, match="total"):
        mix_rates(df, "source", {"a": 1.0}, total=0)
    with _pytest.raises(ValueError, match="negative"):
        mix_rates(df, "source", {"a": -0.1}, total=10)


# ---------------------------------------------------------- grouped k-fold
from mhm_data_pipelines_spark.operators.sampling import grouped_kfold


def test_grouped_kfold_group_integrity_and_range(spark):
    rows = [(i, f"g{i % 7}") for i in range(100)]
    df = spark.createDataFrame(rows, "rid long, grp string")
    out = grouped_kfold(df, "grp", k=3).collect()
    folds = {}
    for r in out:
        assert 0 <= r["fold"] < 3
        folds.setdefault(r["grp"], set()).add(r["fold"])
    assert all(len(s) == 1 for s in folds.values())  # no group spans folds


def test_grouped_kfold_deterministic_and_seed_sensitive(spark):
    df = spark.createDataFrame(
        [(i, f"g{i}") for i in range(50)], "rid long, grp string"
    )
    a = {r["grp"]: r["fold"] for r in grouped_kfold(df, "grp", k=5).collect()}
    b = {r["grp"]: r["fold"] for r in grouped_kfold(df, "grp", k=5).collect()}
    c = {r["grp"]: r["fold"] for r in grouped_kfold(df, "grp", k=5, seed=7).collect()}
    assert a == b
    assert a != c
    import pytest as _pt
    with _pt.raises(ValueError):
        grouped_kfold(df, "grp", k=1)


# ---------------------------------------------------- temporal embargo split
from mhm_data_pipelines_spark.operators.sampling import (
    temporal_embargo_split,
)


def test_embargo_split_hand_computed(spark):
    # 10 daily rows 2024-01-01..10; test_frac .2 -> cutoff at the exact
    # .8 quantile of epoch-us; embargo 2 days carves the gap below it.
    rows = [(i, f"2024-01-{i + 1:02d} 00:00:00") for i in range(10)]
    df = spark.createDataFrame(rows, "rid long, ts string").select(
        "rid", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r["rid"]: r["split"]
           for r in temporal_embargo_split(df, "ts", 0.2, "2 days").collect()}
    # quantile .8 of 10 points interpolates between the 8th and 9th
    # (0-idx 7.2): cutoff inside Jan 8..9 -> test = {9,10}? exact:
    # positions 1..10, q = 1 + .8*9 = 8.2 -> between Jan 8 and Jan 9.
    # cutoff = Jan 8 04:48 (position 8.2); gap floor = Jan 6 04:48.
    assert [out[i] for i in range(10)] == [
        "train", "train", "train", "train", "train",
        "train",               # Jan 6 00:00 < Jan 6 04:48 gap floor
        "embargo", "embargo",  # Jan 7-8: inside the 2-day gap
        "test", "test",        # Jan 9-10 >= cutoff
    ]


def test_embargo_split_nulls_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, None)], "rid long, ts string"
    ).select("rid", F.col("ts").cast("timestamp").alias("ts"))
    out = {r["rid"]: r["split"]
           for r in temporal_embargo_split(df, "ts", 0.5, "1 hours").collect()}
    assert out[2] is None
    import pytest as _pt
    with _pt.raises(ValueError):
        temporal_embargo_split(df, "ts", 1.5)
    with _pt.raises(ValueError):
        temporal_embargo_split(df, "ts", 0.5, "2 fortnights")


class TestPopularityNegativeSamples:
    def _base(self, spark):
        rows = [
            (u, it)
            for u in range(40)
            for it in (["hot"] * 1 + (["warm"] if u % 2 else [])
                       + (["cold"] if u % 10 == 0 else []))
        ]
        return spark.createDataFrame(rows, "u long, it string")

    def test_deterministic_and_popularity_biased(self, spark):
        from mhm_data_pipelines_spark.operators.sampling import (
            popularity_negative_samples,
        )

        df = self._base(spark)
        out1 = sorted(
            (r.u, r.it, r.draw, r.neg_item)
            for r in popularity_negative_samples(
                df, "u", "it", k=3
            ).collect()
        )
        out2 = sorted(
            (r.u, r.it, r.draw, r.neg_item)
            for r in popularity_negative_samples(
                df, "u", "it", k=3
            ).collect()
        )
        assert out1 == out2  # fully deterministic
        counts = {}
        for _, _, _, neg in out1:
            counts[neg] = counts.get(neg, 0) + 1
        # hot (40 interactions) must be drawn more than cold (4)
        assert counts.get("hot", 0) > counts.get("cold", 0)

    def test_exclude_positive_and_k(self, spark):
        from mhm_data_pipelines_spark.operators.sampling import (
            popularity_negative_samples,
        )

        df = self._base(spark)
        out = popularity_negative_samples(
            df, "u", "it", k=2, exclude_positive=True
        ).collect()
        assert all(r.neg_item != r.it for r in out)
        per_pair = {}
        for r in out:
            per_pair.setdefault((r.u, r.it), []).append(r.draw)
        assert all(len(v) <= 2 for v in per_pair.values())
        with_pos = popularity_negative_samples(
            df, "u", "it", k=2, exclude_positive=False
        ).count()
        # without the filter every (pair, draw) yields exactly one row
        n_pairs = df.distinct().count()
        assert with_pos == 2 * n_pairs

    def test_guard(self, spark):
        from mhm_data_pipelines_spark.operators.sampling import (
            popularity_negative_samples,
        )

        df = self._base(spark)
        with pytest.raises(ValueError, match="k must"):
            popularity_negative_samples(df, "u", "it", k=0)


class TestHtEstimate:
    def test_hand_computed_poisson_design(self, spark):
        from mhm_data_pipelines_spark.operators.sampling import (
            ht_estimate,
        )

        rows = [(2.0, 0.5), (4.0, 0.5), (6.0, 0.25)]
        df = spark.createDataFrame(rows, "y double, p double")
        r = ht_estimate(df, "y", "p").collect()[0]
        assert r.n_sample == 3
        assert r.est_total == pytest.approx(2 / 0.5 + 4 / 0.5 + 6 / 0.25)
        assert r.est_population == pytest.approx(2 + 2 + 4)
        assert r.ht_mean == pytest.approx(36.0 / 8.0)
        want_var = (0.5 / 0.25) * 4 + (0.5 / 0.25) * 16 + (
            0.75 / 0.0625
        ) * 36
        assert r.se_total == pytest.approx(want_var**0.5, abs=1e-6)

    def test_invalid_probabilities_dropped(self, spark):
        from mhm_data_pipelines_spark.operators.sampling import (
            ht_estimate,
        )

        rows = [(2.0, 0.5), (9.0, 0.0), (9.0, 1.5), (None, 0.5),
                (9.0, None)]
        df = spark.createDataFrame(rows, "y double, p double")
        r = ht_estimate(df, "y", "p").collect()[0]
        assert r.n_sample == 1
        assert r.est_total == pytest.approx(4.0)
