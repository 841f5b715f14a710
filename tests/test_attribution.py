"""Multi-touch attribution: hand journeys, per-model credit
conservation, window edges, coverage audit."""

from __future__ import annotations

import datetime as dt

import pytest

from mhm_data_pipelines_spark.operators.attribution import (
    attribution_coverage,
    position_attribution,
)

T0 = dt.datetime(2024, 1, 10, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(hours=h), u, t, 0.0)
            for i, (h, u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )


class TestPositionAttribution:
    def test_hand_journey_u_shape(self, spark):
        # user 1: click, view, click, error -> buy (4 touches)
        rows = [
            (-30, 1, "click"),
            (-20, 1, "view"),
            (-10, 1, "click"),
            (-5, 1, "error"),
            (0, 1, "buy"),
        ]
        out = {
            r["channel"]: r.asDict()
            for r in position_attribution(_ev(spark, rows), "buy")
            .collect()
        }
        # U-shape: first click 0.4, view 0.1, click 0.1, error(last) 0.4
        assert out["click"]["u_credit"] == pytest.approx(0.5)
        assert out["view"]["u_credit"] == pytest.approx(0.1)
        assert out["error"]["u_credit"] == pytest.approx(0.4)
        # first/last are indicator sums
        assert out["click"]["first_credit"] == pytest.approx(1.0)
        assert out["error"]["last_credit"] == pytest.approx(1.0)
        # linear: 0.25 each touch
        assert out["click"]["linear_credit"] == pytest.approx(0.5)
        # every model conserves exactly 1.0 for the one conversion
        for m in ("first_credit", "last_credit", "linear_credit",
                  "u_credit"):
            assert sum(v[m] for v in out.values()) == pytest.approx(1.0)

    def test_single_and_double_touch(self, spark):
        rows = [
            (-1, 1, "view"), (0, 1, "buy"),          # single touch
            (-2, 2, "view"), (-1, 2, "click"), (0, 2, "buy"),  # double
        ]
        out = {
            r["channel"]: r.asDict()
            for r in position_attribution(_ev(spark, rows), "buy")
            .collect()
        }
        # single touch 1.0 + double-touch first 0.5
        assert out["view"]["u_credit"] == pytest.approx(1.5)
        assert out["click"]["u_credit"] == pytest.approx(0.5)

    def test_window_edges_and_multiple_conversions(self, spark):
        rows = [
            (-24 * 8, 1, "view"),   # outside 7-day lookback
            (0, 1, "click"),        # simultaneous with buy: excluded
            (0, 1, "buy"),
            (-1, 2, "view"),
            (0, 2, "buy"),
            (5, 2, "buy"),          # second conversion, same touch
        ]
        out = {
            r["channel"]: r.asDict()
            for r in position_attribution(_ev(spark, rows), "buy")
            .collect()
        }
        assert "click" not in out  # ts == conv_ts is not a cause
        # user 2's view credits BOTH conversions
        assert out["view"]["u_credit"] == pytest.approx(2.0)
        assert out["view"]["conversions_touched"] == 2

    def test_tie_break_is_id_deterministic(self, spark):
        # two touches at the identical timestamp: event_id orders them
        df = spark.createDataFrame(
            [
                (1, T0, 1, "a", 0.0),
                (2, T0, 1, "b", 0.0),
                (9, T0 + dt.timedelta(hours=1), 1, "buy", 0.0),
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        out = {
            r["channel"]: r["first_credit"]
            for r in position_attribution(df, "buy").collect()
        }
        assert out["a"] == pytest.approx(1.0)
        assert out["b"] == pytest.approx(0.0)

    def test_guards(self, spark):
        df = _ev(spark, [(0, 1, "buy")])
        with pytest.raises(ValueError, match="u_weight"):
            position_attribution(df, "buy", u_weight=0.6)
        with pytest.raises(ValueError, match="lookback_days"):
            position_attribution(df, "buy", lookback_days=0)


class TestAttributionCoverage:
    def test_counts(self, spark):
        rows = [
            (-1, 1, "view"), (0, 1, "buy"),   # attributed
            (0, 2, "buy"),                     # no touches at all
        ]
        got = attribution_coverage(_ev(spark, rows), "buy").collect()[0]
        assert got["conversions"] == 2
        assert got["attributed"] == 1
        assert got["unattributed"] == 1
        assert got["attribution_rate"] == pytest.approx(0.5)
