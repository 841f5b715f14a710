"""The colon-separated extraction-spec mini-DSL.

This IS the reference's query language — its only user-facing
extensibility mechanism (``mhm-data-pipelines/extract_patient_summary.py``):

* ``--feature``  ``name:source:time_field:filter_field:filter_value:extraction_field``
  (6-part) or ``name:source:time_field:extraction_field:unit`` (5-part) —
  ``parse_feature_flag`` at ``:34-57``, applied ``:264-284``.
* ``--questionnaire``  ``file_filter:time_field`` — ``:59-63``, applied
  ``:286-304``.
* ``--questionnaire-slider``
  ``domain:file_filter:answers_base:target_prefix:value_suffix:time_suffix``
  — ``:65-77``, applied ``:306-343``.
* ``--questionnaire-histogram``
  ``domain:file_filter:answers_base:target_questionid:value_suffix:time_suffix``
  — ``:79-91``, applied ``:344-377``.

Arity mismatches raise ``ValueError`` exactly like the reference.

Compilation target: each spec produces (route predicate, time Column,
value Column) over the unified lake DataFrame — the reference's
quadratic file×spec dispatch loop (``:264-266``) collapses into ordinary
Catalyst filters, and its per-row ``iterrows`` accumulation (``:275-282``)
into hash aggregates (see operators.summary).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.functions.timeutils import (
    epoch_to_timestamp,
    try_double,
)


def _route(df_or_col, token: str) -> Column:
    """Source routing: spec applies iff its source/file_filter token is a
    substring of the file path / metric name (P8,
    extract_patient_summary.py:266,287). On the unified table the metric
    column carries the path's metric segment."""
    col = df_or_col if isinstance(df_or_col, Column) else F.col("metric")
    return col.contains(token)


def _q(name: str) -> Column:
    # Dotted CSV column names ("value.time") need backtick quoting.
    return F.col(f"`{name}`")


@dataclass(frozen=True)
class FeatureSpec:
    """A numeric feature extraction (D1)."""

    name: str
    source: str
    time_field: str
    extraction_field: str
    filter_field: str | None = None
    filter_value: str | None = None
    unit: str | None = None

    @classmethod
    def parse(cls, flag: str) -> "FeatureSpec":
        parts = flag.split(":")
        if len(parts) == 6:
            name, source, tf, ff, fv, ef = parts
            return cls(name, source, tf, ef, filter_field=ff, filter_value=fv)
        if len(parts) == 5:
            name, source, tf, ef, unit = parts
            return cls(name, source, tf, ef, unit=unit)
        raise ValueError(
            f"feature spec must have 5 or 6 colon-separated parts, got "
            f"{len(parts)}: {flag!r}"
        )

    def route(self) -> Column:
        return _route(None, self.source)

    def rows(self, df: DataFrame) -> DataFrame:
        """participant_id, ts, value rows for this feature — filter +
        coerce + null-drop (extract_patient_summary.py:120-140)."""
        out = df.filter(self.route())
        if self.filter_field is not None:
            out = out.filter(_q(self.filter_field) == F.lit(self.filter_value))
        out = out.select(
            F.col("participant_id"),
            F.col("site"),
            epoch_to_timestamp(_q(self.time_field)).alias("ts"),
            try_double(_q(self.extraction_field)).alias("value"),
            F.lit(self.name).alias("feature"),
            F.lit(self.unit).cast("string").alias("unit"),
        )
        return out.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())


@dataclass(frozen=True)
class QuestionnaireSpec:
    """Simple questionnaire response counting (D2)."""

    file_filter: str
    time_field: str

    @classmethod
    def parse(cls, flag: str) -> "QuestionnaireSpec":
        parts = flag.split(":")
        if len(parts) != 2:
            raise ValueError(
                f"questionnaire spec must be file_filter:time_field, got {flag!r}"
            )
        return cls(*parts)

    def rows(self, df: DataFrame) -> DataFrame:
        out = df.filter(_route(None, self.file_filter)).select(
            F.col("participant_id"),
            F.col("site"),
            epoch_to_timestamp(_q(self.time_field)).alias("ts"),
        )
        return out.filter(F.col("ts").isNotNull())


def melt_answers(
    df: DataFrame,
    answers_base: str,
    value_suffix: str = ".value",
    time_suffix: str = ".startTime",
) -> DataFrame:
    """Wide→long unpivot of the repeated-answer column families
    ``<answers_base>.<i>.questionId`` / ``.value`` / ``.startTime``
    (A12; discovery-by-prefix scan extract_patient_summary.py:313-318).

    The column family is *dynamic*: indices discovered from the schema at
    plan time (driver-side, cheap), then a single ``stack``-style
    explode-of-structs — no Python in the row path.
    """
    idxs = sorted(
        {
            c[len(answers_base) + 1 :].split(".")[0]
            for c in df.columns
            if c.startswith(answers_base + ".") and c.endswith(".questionId")
        },
        key=int,
    )
    if not idxs:
        return df.select(
            "*",
            F.lit(None).cast("string").alias("questionId"),
            F.lit(None).cast("string").alias("answer"),
            F.lit(None).cast("double").alias("answer_time"),
        ).limit(0)
    entries = [
        F.struct(
            _q(f"{answers_base}.{i}.questionId").cast("string").alias("questionId"),
            _q(f"{answers_base}.{i}{value_suffix}").cast("string").alias("answer"),
            (
                try_double(_q(f"{answers_base}.{i}{time_suffix}"))
                if f"{answers_base}.{i}{time_suffix}" in df.columns
                else F.lit(None).cast("double")
            ).alias("answer_time"),
        )
        for i in idxs
    ]
    exploded = df.select(
        "*", F.explode(F.array(*entries)).alias("_ans")
    )
    return exploded.select(
        "*",
        F.col("_ans.questionId").alias("questionId"),
        F.col("_ans.answer").alias("answer"),
        F.col("_ans.answer_time").alias("answer_time"),
    ).drop("_ans").filter(F.col("questionId").isNotNull())


def melt_answers_nested(df: DataFrame, answers_col: str = "answers") -> DataFrame:
    """Nested-ingestion twin of :func:`melt_answers`: when answers are a
    real ``ARRAY<STRUCT<questionId,value,startTime>>`` column the dynamic
    column scan disappears — plain explode (SURVEY §1.1c)."""
    return (
        df.withColumn("_ans", F.explode(F.col(answers_col)))
        .withColumn("questionId", F.col("_ans.questionId").cast("string"))
        .withColumn("answer", F.col("_ans.value").cast("string"))
        .withColumn("answer_time", try_double(F.col("_ans.startTime")))
        .drop("_ans")
        .filter(F.col("questionId").isNotNull())
    )


@dataclass(frozen=True)
class SliderSpec:
    """Numeric slider answers → stats block per domain (D3)."""

    domain: str
    file_filter: str
    answers_base: str
    target_prefix: str
    value_suffix: str
    time_suffix: str

    @classmethod
    def parse(cls, flag: str) -> "SliderSpec":
        parts = flag.split(":")
        if len(parts) != 6:
            raise ValueError(
                "slider spec must be domain:file_filter:answers_base:"
                f"target_prefix:value_suffix:time_suffix, got {flag!r}"
            )
        return cls(*parts)

    def rows(self, df: DataFrame, time_col: str = "StartTime") -> DataFrame:
        """(participant, ts, value) for answers whose questionId starts
        with ``target_prefix``; non-numeric answers skipped, not failed
        (float-coerce, extract_patient_summary.py:334-337)."""
        routed = df.filter(_route(None, self.file_filter))
        long = melt_answers(
            routed, self.answers_base, self.value_suffix, self.time_suffix
        )
        ts = (
            epoch_to_timestamp(_q(time_col))
            if time_col in df.columns
            else F.coalesce(
                epoch_to_timestamp(F.col("answer_time")),
                F.col("file_timestamp"),
            )
        )
        return (
            long.filter(F.col("questionId").startswith(self.target_prefix))
            .select(
                "participant_id",
                "site",
                ts.alias("ts"),
                try_double(F.col("answer")).alias("value"),
                F.lit(self.domain).alias("domain"),
            )
            .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        )


@dataclass(frozen=True)
class HistogramSpec:
    """Categorical answers → response-frequency histogram (D4)."""

    domain: str
    file_filter: str
    answers_base: str
    target_questionid: str
    value_suffix: str
    time_suffix: str

    @classmethod
    def parse(cls, flag: str) -> "HistogramSpec":
        parts = flag.split(":")
        if len(parts) != 6:
            raise ValueError(
                "histogram spec must be domain:file_filter:answers_base:"
                f"target_questionid:value_suffix:time_suffix, got {flag!r}"
            )
        return cls(*parts)

    def rows(self, df: DataFrame, time_col: str = "StartTime") -> DataFrame:
        routed = df.filter(_route(None, self.file_filter))
        long = melt_answers(
            routed, self.answers_base, self.value_suffix, self.time_suffix
        )
        ts = (
            epoch_to_timestamp(_q(time_col))
            if time_col in df.columns
            else F.coalesce(
                epoch_to_timestamp(F.col("answer_time")),
                F.col("file_timestamp"),
            )
        )
        return (
            long.filter(F.col("questionId") == F.lit(self.target_questionid))
            .select(
                "participant_id",
                "site",
                ts.alias("ts"),
                F.col("questionId"),
                F.col("answer").alias("response"),
                F.lit(self.domain).alias("domain"),
            )
            .filter(F.col("response").isNotNull() & F.col("ts").isNotNull())
        )
