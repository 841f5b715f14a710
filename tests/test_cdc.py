"""cdc_apply — hand-built changelogs against tiny snapshots."""

import pytest

from mhm_data_pipelines_spark.operators.cdc import cdc_apply


def _base(spark, rows):
    return spark.createDataFrame(rows, "k long, status string, total double")


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "k long, status string, total double, seq long, op string"
    )


class TestCdcApply:
    def test_upsert_delete_passthrough(self, spark):
        base = _base(
            spark, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]
        )
        # update 1, delete 2, insert 9, leave 3 untouched
        ch = _changes(
            spark,
            [
                (1, "a2", 11.0, 5, "U"),
                (2, None, None, 5, "D"),
                (9, "n", 90.0, 5, "I"),
            ],
        )
        got = {
            r["k"]: (r["status"], r["total"])
            for r in cdc_apply(base, ch, ["k"]).collect()
        }
        assert got == {
            1: ("a2", 11.0),
            3: ("c", 30.0),
            9: ("n", 90.0),
        }

    def test_latest_seq_wins_and_delete_ties_win(self, spark):
        base = _base(spark, [(1, "a", 10.0), (2, "b", 20.0)])
        ch = _changes(
            spark,
            [
                (1, "x", 1.0, 1, "U"),
                (1, "y", 2.0, 3, "U"),   # newest -> wins
                (1, "z", 9.9, 2, "U"),
                (2, "u", 5.0, 7, "U"),
                (2, None, None, 7, "D"),  # same seq: D outranks U
            ],
        )
        got = {
            r["k"]: (r["status"], r["total"])
            for r in cdc_apply(base, ch, ["k"]).collect()
        }
        assert got == {1: ("y", 2.0)}

    def test_update_for_unknown_key_upserts(self, spark):
        base = _base(spark, [(1, "a", 10.0)])
        ch = _changes(spark, [(5, "late", 50.0, 1, "u")])  # lowercase op
        got = {r["k"] for r in cdc_apply(base, ch, ["k"]).collect()}
        assert got == {1, 5}

    def test_unknown_op_fails_loudly(self, spark):
        base = _base(spark, [(1, "a", 10.0)])
        ch = _changes(spark, [(1, "a", 1.0, 1, "Z")])
        with pytest.raises(Exception, match="unknown op"):
            cdc_apply(base, ch, ["k"]).collect()

    def test_guards(self, spark):
        base = _base(spark, [(1, "a", 10.0)])
        with pytest.raises(ValueError, match="key_cols"):
            cdc_apply(base, base, [])
        with pytest.raises(ValueError, match="missing columns"):
            cdc_apply(base, base, ["k"])  # no seq/op in changes
