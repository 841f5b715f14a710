"""Grid-cell-blocked radius join: exactness within the radius,
adjacency coverage across cell borders, cap semantics."""

from __future__ import annotations

import pytest


class TestGridRadiusJoin:
    def _pairs(self, spark, left_rows, right_rows, r, **kw):
        from mhm_data_pipelines_spark.operators.spatial import (
            grid_radius_join,
        )

        left = spark.createDataFrame(
            left_rows, "id long, x double, y double"
        )
        right = spark.createDataFrame(
            right_rows, "id long, x double, y double"
        )
        return {
            (p.left_id, p.right_id): p.dist
            for p in grid_radius_join(left, right, r, **kw).collect()
        }

    def test_exact_filter_and_adjacent_cells(self, spark):
        got = self._pairs(
            spark,
            [(1, 0.0, 0.0)],
            [
                (10, 0.5, 0.0),    # same cell, dist .5 -> in
                (11, -0.5, -0.5),  # adjacent cell, dist ~.707 -> in
                (12, 0.9, 0.9),    # adjacent cell, dist ~1.27 -> out
                (13, 3.0, 0.0),    # far cell -> never a candidate
            ],
            1.0,
        )
        assert set(got) == {(1, 10), (1, 11)}
        assert got[(1, 10)] == pytest.approx(0.5)
        assert got[(1, 11)] == pytest.approx(0.5**0.5)

    def test_boundary_pair_across_cells_found(self, spark):
        # dist exactly r, one cell apart: must be found (<=)
        got = self._pairs(
            spark, [(1, 0.95, 0.0)], [(2, 1.95, 0.0)], 1.0
        )
        assert got == {(1, 2): pytest.approx(1.0)}

    def test_no_duplicate_pairs(self, spark):
        from mhm_data_pipelines_spark.operators.spatial import (
            grid_radius_join,
        )

        left = spark.createDataFrame(
            [(1, 0.0, 0.0)], "id long, x double, y double"
        )
        right = spark.createDataFrame(
            [(2, 0.1, 0.1)], "id long, x double, y double"
        )
        out = grid_radius_join(left, right, 1.0).collect()
        assert len(out) == 1

    def test_cell_cap_drops_dense_cells(self, spark):
        dense = [(i, 0.1 * 0, 0.0) for i in range(5)]
        got = self._pairs(
            spark,
            [(1, 0.0, 0.0)],
            dense + [(99, 5.0, 5.0)],
            1.0,
            cell_cap=4,
        )
        assert got == {}  # the only nearby cell was over cap

    def test_radius_guard(self, spark):
        from mhm_data_pipelines_spark.operators.spatial import (
            grid_radius_join,
        )

        df = spark.createDataFrame(
            [(1, 0.0, 0.0)], "id long, x double, y double"
        )
        with pytest.raises(ValueError, match="radius"):
            grid_radius_join(df, df, 0.0)


class TestRadiusNeighborCounts:
    def test_counts_and_min_dist(self, spark):
        from mhm_data_pipelines_spark.operators.spatial import (
            radius_neighbor_counts,
        )

        left = spark.createDataFrame(
            [(1, 0.0, 0.0), (2, 100.0, 100.0)],
            "id long, x double, y double",
        )
        right = spark.createDataFrame(
            [(10, 0.3, 0.0), (11, 0.0, 0.4), (12, 50.0, 50.0)],
            "id long, x double, y double",
        )
        out = {
            r.left_id: r
            for r in radius_neighbor_counts(left, right, 1.0).collect()
        }
        assert out[1].n_neighbors == 2
        assert out[1].min_dist == pytest.approx(0.3)
        assert 2 not in out  # zero-neighbor points absent
