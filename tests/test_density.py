"""grid_density_clusters — hand-laid-out point clouds."""

import pytest

from mhm_data_pipelines_spark.operators.density import (
    grid_density_clusters,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, x double, y double")


class TestGridDensityClusters:
    def test_two_blobs_and_noise(self, spark):
        # blob A: 4 points in cell (0,0); blob B: 4 points in cell
        # (5,5); one lone point in cell (9,9) -> noise
        rows = [(i, 0.01 + i * 0.001, 0.01) for i in range(4)]
        rows += [(10 + i, 0.51 + i * 0.001, 0.51) for i in range(4)]
        rows += [(99, 0.95, 0.95)]
        out = grid_density_clusters(
            _df(spark, rows), "x", "y", "id",
            cell_size=0.1, min_pts=3,
        ).collect()
        by_id = {r["id"]: r["cluster"] for r in out}
        a = {by_id[i] for i in range(4)}
        b = {by_id[10 + i] for i in range(4)}
        assert len(a) == 1 and len(b) == 1 and a != b
        assert by_id[99] is None  # sparse cell -> noise

    def test_adjacent_dense_cells_merge(self, spark):
        # two dense cells sharing a corner (diagonal 8-neighborhood)
        rows = [(i, 0.05, 0.05) for i in range(3)]
        rows += [(10 + i, 0.15, 0.15) for i in range(3)]
        out = grid_density_clusters(
            _df(spark, rows), "x", "y", "id",
            cell_size=0.1, min_pts=3,
        ).collect()
        labels = {r["cluster"] for r in out}
        assert len(labels) == 1 and None not in labels

    def test_separated_by_sparse_gap_stay_apart(self, spark):
        # dense at (0,0) and (3,0) with nothing between
        rows = [(i, 0.05, 0.05) for i in range(3)]
        rows += [(10 + i, 0.35, 0.05) for i in range(3)]
        out = grid_density_clusters(
            _df(spark, rows), "x", "y", "id",
            cell_size=0.1, min_pts=3,
        ).collect()
        labels = {r["cluster"] for r in out}
        assert len(labels) == 2

    def test_negative_coords_and_nulls(self, spark):
        rows = [(i, -0.25 - i * 0.001, -0.25) for i in range(3)]
        df = spark.createDataFrame(
            rows + [(9, None, 0.1)], "id long, x double, y double"
        )
        out = grid_density_clusters(
            df, "x", "y", "id", cell_size=0.1, min_pts=3
        ).collect()
        assert len(out) == 3  # NULL row dropped
        assert all(r["cluster"] is not None for r in out)
        assert out[0]["cx"] == -3

    def test_guards(self, spark):
        df = _df(spark, [(1, 0.0, 0.0)])
        with pytest.raises(ValueError, match="cell_size"):
            grid_density_clusters(df, "x", "y", "id", cell_size=0.0)
        with pytest.raises(ValueError, match="min_pts"):
            grid_density_clusters(df, "x", "y", "id", min_pts=0)

    def test_cc_modes_agree(self, spark):
        import random

        from mhm_data_pipelines_spark.operators.density import (
            grid_density_clusters,
        )

        rng = random.Random(9)
        rows = [
            (i, rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3))
            for i in range(400)
        ]
        df = _df(spark, rows)
        a = sorted(
            (r["id"], r["cluster"])
            for r in grid_density_clusters(
                df, "x", "y", "id", 0.1, 3, cc_mode="local"
            ).collect()
        )
        b = sorted(
            (r["id"], r["cluster"])
            for r in grid_density_clusters(
                df, "x", "y", "id", 0.1, 3, cc_mode="iterative"
            ).collect()
        )
        assert a == b
        with pytest.raises(ValueError, match="cc_mode"):
            grid_density_clusters(df, "x", "y", "id", cc_mode="bogus")
