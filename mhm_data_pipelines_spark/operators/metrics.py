"""Zero-cost pipeline observability via ``df.observe``.

The reference prints progress counts by re-counting frames between
steps (process-overview.py's per-stage prints) — every print is an
extra pass over the data. ``Observation`` metrics piggyback on the ONE
action that materializes the result: aggregates are accumulated per
task alongside the real work and surfaced on the driver afterwards.
At 100 TB, "how many rows did the quality filter drop" must not cost a
second scan.

Usage::

    stage, obs = observed(filtered_df, "post_quality")
    stage.write.parquet(out)          # the real action
    obs.get["rows"]                   # counts, for free
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame,
    name: str,
    *extra: Column,
) -> tuple[DataFrame, Observation]:
    """Attach an Observation carrying row count (always) plus any
    ``extra`` aggregate Columns. Returns (df, observation); read
    ``observation.get`` AFTER an action has run on the returned df."""
    obs = Observation(name)
    out = df.observe(obs, F.count(F.lit(1)).alias("rows"), *extra)
    return out, obs


def funnel_counts(stages: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Instrument a pipeline funnel: each named stage gets an
    Observation; returns {name: instrumented_df}. Observations are
    attached to the DataFrames' ``_observation`` attribute for retrieval
    after the terminal action."""
    out: dict[str, DataFrame] = {}
    for name, df in stages.items():
        inst, obs = observed(df, name)
        inst._observation = obs  # type: ignore[attr-defined]
        out[name] = inst
    return out
