"""Plan layer: the declarative extraction-spec DSL and its compiler."""

from mhm_data_pipelines_spark.plans.specs import (
    FeatureSpec,
    HistogramSpec,
    QuestionnaireSpec,
    SliderSpec,
)

__all__ = ["FeatureSpec", "QuestionnaireSpec", "SliderSpec", "HistogramSpec"]
