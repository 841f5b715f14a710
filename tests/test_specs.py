"""Spec-DSL compiler: grammar parity (arity errors), extraction semantics,
answer-family unpivot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.plans.specs import (
    FeatureSpec,
    HistogramSpec,
    QuestionnaireSpec,
    SliderSpec,
    melt_answers_nested,
)
from mhm_data_pipelines_spark.sources.lake import read_lake_unified

# The reference's own example specs (extract_patient_summary.py:9-15).
STEPS = "steps:android_health_connect_typed_data:value.time:value.key:Steps:value.intVal"
SCREEN = "screen_usage:device_app_log:timestamp:usage_duration:hours"
SLIDER = "emotions:questionnaire_response:value.answers:negative_emotions_:.value:.startTime"
HIST = "sleep:questionnaire_response:value.answers:sleep_5:.value:.startTime"


def test_parse_grammars():
    f6 = FeatureSpec.parse(STEPS)
    assert f6.filter_field == "value.key" and f6.filter_value == "Steps"
    assert f6.extraction_field == "value.intVal" and f6.unit is None
    f5 = FeatureSpec.parse(SCREEN)
    assert f5.unit == "hours" and f5.filter_field is None
    with pytest.raises(ValueError):
        FeatureSpec.parse("a:b:c")
    with pytest.raises(ValueError):
        QuestionnaireSpec.parse("only_one_part")
    with pytest.raises(ValueError):
        SliderSpec.parse("a:b:c:d:e")
    with pytest.raises(ValueError):
        HistogramSpec.parse("a:b:c:d:e:f:g")


@pytest.fixture(scope="module")
def lake(spark, lake_root):
    return read_lake_unified(spark, lake_root, layout="raw")


def test_feature_rows_filtered(spark, lake):
    rows = FeatureSpec.parse(STEPS).rows(lake)
    got = rows.collect()
    # Steps rows only: (2/day × 3 days + 1 sharded) × 2 participants = 14.
    assert len(got) == 14
    assert all(r.feature == "steps" for r in got)
    assert {r.value for r in got} >= {1000.0, 2000.0, 5000.0}


def test_feature_rows_5part_unit_and_coerce(spark, lake):
    rows = FeatureSpec.parse(SCREEN).rows(lake)
    got = rows.collect()
    # 4 parseable rows ("oops" usage_duration coerced→null→dropped), incl.
    # the notadate.csv.gz file (content is valid even if filename is not).
    assert len(got) == 4
    assert all(r.unit == "hours" for r in got)


def test_questionnaire_rows(spark, lake):
    q = QuestionnaireSpec.parse("questionnaire_response:value.timeCompleted")
    assert q.rows(lake).count() == 2


def test_slider_melt_prefix_and_numeric_skip(spark, lake):
    rows = SliderSpec.parse(SLIDER).rows(lake)
    got = rows.collect()
    # 2 rows × 2 negative_emotions answers − 1 non-numeric "N/A" = 3.
    assert len(got) == 3
    assert sorted(r.value for r in got) == [3.0, 4.0, 5.0]


def test_histogram_exact_questionid(spark, lake):
    rows = HistogramSpec.parse(HIST).rows(lake)
    got = rows.collect()
    assert sorted(r.response for r in got) == ["good", "poor"]


def test_melt_answers_nested(spark):
    df = spark.createDataFrame(
        [("p1", "LON", [("q1", "3", 10.0), ("q2", "x", 11.0)])],
        "participant_id string, site string, "
        "answers array<struct<questionId string, value string, startTime double>>",
    )
    out = melt_answers_nested(df).select("questionId", "answer").collect()
    assert {(r.questionId, r.answer) for r in out} == {("q1", "3"), ("q2", "x")}
