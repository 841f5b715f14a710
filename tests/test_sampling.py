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
