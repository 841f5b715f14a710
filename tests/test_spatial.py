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


class TestMobilityFeatures:
    def test_hand_computed(self, spark):
        import datetime as dt

        from mhm_data_pipelines_spark.operators.spatial import (
            mobility_features,
        )

        t0 = dt.datetime(2025, 1, 1)
        rows = [
            (1, t0, 0.0, 0.0),
            (1, t0 + dt.timedelta(minutes=1), 3.0, 4.0),
            (1, t0 + dt.timedelta(minutes=2), 3.0, 4.0),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, x double, y double"
        )
        r = mobility_features(df, cell_size=1.0).collect()[0]
        assert r.n_points == 3
        assert r.total_distance == pytest.approx(5.0)
        # var(x)=2, var(y)=32/9 -> rog = sqrt(50/9)
        assert r.radius_of_gyration == pytest.approx(
            (50 / 9) ** 0.5, abs=1e-6
        )
        assert r.n_cells == 2
        import math

        assert r.cell_entropy == pytest.approx(
            math.log(3) - 2 * math.log(2) / 3, abs=1e-6
        )

    def test_single_point_zero_features(self, spark):
        import datetime as dt

        from mhm_data_pipelines_spark.operators.spatial import (
            mobility_features,
        )

        df = spark.createDataFrame(
            [(1, dt.datetime(2025, 1, 1), 2.0, 2.0)],
            "user_id long, ts timestamp, x double, y double",
        )
        r = mobility_features(df).collect()[0]
        assert r.total_distance == pytest.approx(0.0)
        assert r.radius_of_gyration == pytest.approx(0.0)
        assert (r.n_cells, r.cell_entropy) == (1, pytest.approx(0.0))


class TestStayPoints:
    def test_runs_and_filters(self, spark):
        import datetime as dt

        from mhm_data_pipelines_spark.operators.spatial import (
            stay_points,
        )

        t0 = dt.datetime(2025, 1, 1)
        pts = [
            (0.1, 0.1), (0.2, 0.3), (0.4, 0.2),  # cell (0,0) x3
            (5.0, 5.0),                           # cell (5,5) x1
            (0.3, 0.3),                           # back to (0,0) x1
        ]
        rows = [
            (1, t0 + dt.timedelta(minutes=i), x, y)
            for i, (x, y) in enumerate(pts)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, x double, y double"
        )
        out = stay_points(df, cell_size=1.0, min_points=3).collect()
        assert len(out) == 1
        sp = out[0]
        assert (sp.cell_x, sp.cell_y, sp.n_points) == (0, 0, 3)
        assert sp.duration_s == pytest.approx(120.0)
        assert sp.enter_ts == t0

    def test_min_duration_filter(self, spark):
        import datetime as dt

        from mhm_data_pipelines_spark.operators.spatial import (
            stay_points,
        )

        t0 = dt.datetime(2025, 1, 1)
        rows = [
            (1, t0 + dt.timedelta(seconds=i), 0.1, 0.1)
            for i in range(3)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, x double, y double"
        )
        assert (
            stay_points(df, min_points=3, min_duration_s=60).count()
            == 0
        )
        assert (
            stay_points(df, min_points=3, min_duration_s=2).count()
            == 1
        )


class TestGeoRadiusJoin:
    def _pairs(self, spark, left_rows, right_rows, r, band=60.0, **kw):
        from mhm_data_pipelines_spark.operators.spatial import (
            geo_radius_join,
        )

        schema = "id long, lat double, lon double"
        left = spark.createDataFrame(left_rows, schema)
        right = spark.createDataFrame(right_rows, schema)
        return {
            (p.left_id, p.right_id): p.dist_km
            for p in geo_radius_join(
                left, right, r, band, **kw
            ).collect()
        }

    def test_known_city_distance(self, spark):
        # Paris (48.8566, 2.3522) -> London (51.5074, -0.1278):
        # haversine ~343.5 km on the mean sphere
        got = self._pairs(
            spark,
            [(1, 48.8566, 2.3522)],
            [(2, 51.5074, -0.1278), (3, 40.7128, -74.006)],
            400.0,
        )
        assert set(got) == {(1, 2)}
        assert got[(1, 2)] == pytest.approx(343.5, abs=1.0)

    def test_cross_cell_neighbors_found(self, spark):
        # ~55.6 km apart at lat 45 (0.5 deg lat): radius 60 must find
        # it even across cell borders; radius 50 must not.
        a, b = (1, 45.0, 10.0), (2, 45.5, 10.0)
        assert set(self._pairs(spark, [a], [b], 60.0)) == {(1, 2)}
        assert self._pairs(spark, [a], [b], 50.0) == {}

    def test_out_of_band_dropped_and_guards(self, spark):
        from mhm_data_pipelines_spark.operators.spatial import (
            geo_radius_join,
        )

        got = self._pairs(
            spark,
            [(1, 70.0, 0.0)],  # outside the declared 60-degree band
            [(2, 70.0, 0.1)],
            50.0,
        )
        assert got == {}
        df = spark.createDataFrame(
            [(1, 0.0, 0.0)], "id long, lat double, lon double"
        )
        with pytest.raises(ValueError, match="radius_km"):
            geo_radius_join(df, df, 0.0, 60.0)
        with pytest.raises(ValueError, match="max_abs_lat"):
            geo_radius_join(df, df, 10.0, 90.0)
