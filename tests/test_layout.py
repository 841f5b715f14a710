"""Z-order layout: key math properties and the actual data-skipping
payoff — after `write_zordered`, parquet row-group min/max stats are
tight on EVERY interleaved dimension, so a point filter on either
column prunes most row groups (the 100 TB scan-I/O argument)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.benchmarks.registry import load_table
from mhm_data_pipelines_spark.operators.layout import (
    with_zorder_key,
    write_zordered,
    zorder_key,
)

SF = "/root/testdata/sf0.001"


def test_zorder_key_interleaves_bits(spark):
    # bits=2, two columns: z(qx=0b10, qy=0b01) = x bits at even
    # positions, y bits at odd → 0b0110 = 6.
    df = spark.range(1).select(
        zorder_key([F.lit(2).cast("long"), F.lit(1).cast("long")], 2).alias("z")
    )
    assert df.first().z == 0b0110


def test_zorder_key_is_monotone_in_locality(spark):
    # Points close in both dimensions are close on the curve: the key
    # of (q, q) is strictly increasing in q (diagonal monotonicity).
    qs = spark.range(16).select(
        F.col("id"),
        zorder_key([F.col("id"), F.col("id")], 4).alias("z"),
    ).orderBy("id")
    zs = [r.z for r in qs.collect()]
    assert zs == sorted(zs) and len(set(zs)) == 16


def test_with_zorder_key_bounds(spark):
    df = load_table(spark, SF, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    out = with_zorder_key(df, ["user_id", "ts_us"], bits=8)
    row = out.agg(
        F.min("zkey").alias("lo"), F.max("zkey").alias("hi"),
        F.count("*").alias("n"),
    ).first()
    assert row.lo >= 0 and row.hi < 2**16 and row.n == df.count()
    # original columns intact, helper bounds columns dropped
    assert set(out.columns) == set(df.columns) | {"zkey"}


def _rowgroup_prune_fraction(path: str, col: str, needle) -> float:
    """Fraction of row groups whose [min,max] CANNOT contain needle —
    exactly what parquet predicate pushdown skips."""
    total, pruned = 0, 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is not None and (needle < st.min or needle > st.max):
                pruned += 1
    assert total > 0
    return pruned / total


@pytest.mark.parametrize("col", ["user_id", "ts_us"])
def test_write_zordered_prunes_both_dimensions(spark, tmp_path, col):
    # sf0.01: enough rows (10k) and users for row-group stats to show
    # the curve's locality; sf0.001's 15 users are too coarse a grid.
    df = (
        load_table(spark, "/root/testdata/sf0.01", "events")
        .withColumn("ts_us", F.unix_micros("ts"))
        .drop("ts", "props")
    )
    zpath = str(tmp_path / "z")
    # enough files+row groups for pruning stats to be meaningful
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    # repartitionByRange samples boundaries with RDD-id-dependent seeds,
    # so file layout shifts with session history; a bigger sample makes
    # boundaries near-exact → the prune fractions below reproducible.
    spark.conf.set(
        "spark.sql.execution.rangeExchange.sampleSizePerPartition", "2000"
    )
    write_zordered(df, zpath, ["user_id", "ts_us"], bits=8, num_files=16)

    # an unclustered (single-column-sorted) layout for contrast: sorting
    # by user_id leaves ts row-group ranges wide and vice versa
    other = "ts_us" if col == "user_id" else "user_id"
    upath = str(tmp_path / f"u_{col}")
    df.repartitionByRange(16, other).sortWithinPartitions(other).write.parquet(
        upath
    )

    # Mean prune fraction over three probe points: repartitionByRange
    # samples boundaries with RDD-id-dependent seeds, so the exact file
    # layout varies with session history — a single median probe sat on
    # a knife-edge margin and flaked ~1 in 5 full-suite runs.
    needles = [
        int(df.select(
            F.expr(f"percentile(CAST({col} AS DOUBLE), {p}D)")
        ).first()[0])
        for p in (0.1, 0.25, 0.5, 0.75, 0.9)
    ]
    z_frac = sum(
        _rowgroup_prune_fraction(zpath, col, n) for n in needles
    ) / len(needles)
    u_frac = sum(
        _rowgroup_prune_fraction(upath, col, n) for n in needles
    ) / len(needles)
    # z-order prunes meaningfully on this dimension; the layout sorted
    # by the OTHER column prunes (near) nothing
    assert z_frac >= 0.45, f"z-order pruned only {z_frac:.0%} on {col}"
    assert z_frac > u_frac + 0.25, (
        f"z-order ({z_frac:.0%}) should beat other-column sort "
        f"({u_frac:.0%}) on {col}"
    )


def test_zorder_key_too_wide_raises():
    with pytest.raises(ValueError):
        zorder_key([F.lit(1)] * 8, 8)


def test_plan_shards_balanced_and_deterministic(spark):
    from mhm_data_pipelines_spark.operators.layout import plan_shards

    df = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, n_bytes long"
    )
    got = plan_shards(df, "n_bytes", shard_size=250).collect()
    by_shard = {}
    for r in got:
        by_shard.setdefault(r.shard_id, []).append(r.doc_id)
    # 100 rows x 10 bytes / 250 = exactly 4 shards of 25 rows
    assert {k: len(v) for k, v in sorted(by_shard.items())} == {
        0: 25, 1: 25, 2: 25, 3: 25
    }
    # deterministic order: doc 0..24 -> shard 0, etc.
    assert sorted(by_shard[0]) == list(range(25))
    # repeat run identical
    again = plan_shards(df, "n_bytes", shard_size=250).collect()
    assert {(r.doc_id, r.shard_id) for r in got} == {
        (r.doc_id, r.shard_id) for r in again
    }


def test_plan_shards_straddler_starts_in_prior_shard(spark):
    from mhm_data_pipelines_spark.operators.layout import plan_shards

    df = spark.createDataFrame(
        [(1, 6), (2, 6), (3, 6)], "doc_id long, n_bytes long"
    )
    got = {r.doc_id: r.shard_id for r in plan_shards(
        df, "n_bytes", shard_size=10
    ).collect()}
    # cum: 6, 12, 18 -> starts at 0, 6, 12 -> shards 0, 0, 1
    assert got == {1: 0, 2: 0, 3: 1}


def test_plan_shards_validation(spark):
    import pytest as _pytest

    from mhm_data_pipelines_spark.operators.layout import plan_shards

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_bytes long")
    with _pytest.raises(ValueError, match="shard_size"):
        plan_shards(df, "n_bytes", shard_size=0)
