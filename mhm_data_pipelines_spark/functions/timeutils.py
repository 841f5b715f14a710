"""Time parsing and calendar-bucketing expressions.

Reference behaviors reproduced (citations into /root/reference/):

* fractional epoch-seconds → timestamp with null-on-error coercion
  (``mhm-data-pipelines/process-overview.py:71-78``,
  ``extract_patient_summary.py:133-135`` — ``pd.to_datetime(...,
  errors='coerce')`` then dropna).
* first-parseable-of-candidate-time-columns
  (``mhm-data-pipelines/data_collection.py:48-59,108``).
* tumbling calendar keys ``get_time_key(dt, resolution)`` → ``"2024-07"``
  / ``"2024-W31"`` (ISO) / ``"2024"``
  (``mhm-data-pipelines/extract_patient_summary.py:93-102``).
* filename-timestamp grammar ``YYYYMMDD_HHMM[_i]``
  (``mhm-data-pipelines/collect_data_metadata.py:40-53``).

All are pure Column expressions — Catalyst folds/pushes them; none break
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Candidate time columns tried in order by the reference
#: (mhm-data-pipelines/data_collection.py:108).
DEFAULT_TIME_CANDIDATES = (
    "timestamp",
    "value.time",
    "value.startTime",
    "value.timeCompleted",
    "time",
    "timeReceived",
)


def try_double(col: Column | str) -> Column:
    """Null-on-error numeric coercion — pandas ``to_numeric(errors='coerce')``
    / ``float()``-try (process-overview.py:71-78,
    extract_patient_summary.py:106-110)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def epoch_to_timestamp(col: Column | str) -> Column:
    """Fractional epoch-seconds (e.g. ``1729146600.70951``) → timestamp,
    preserving sub-second precision; unparseable → NULL.

    ``timestamp_seconds`` on DOUBLE keeps microseconds — matches
    ``pd.to_datetime(unit='s')`` (process-overview.py:73).
    """
    return F.timestamp_seconds(try_double(col))


def coalesce_event_time(
    df_columns: list[str],
    candidates: tuple[str, ...] = DEFAULT_TIME_CANDIDATES,
) -> Column:
    """First-parseable among candidate time columns present in the schema
    (data_collection.py:48-59). Columns are matched by exact (possibly
    dotted/flattened) name; pass ``df.columns``.
    """
    present = [c for c in candidates if c in df_columns]
    if not present:
        return F.lit(None).cast("timestamp")
    return F.coalesce(*[epoch_to_timestamp(F.col(f"`{c}`")) for c in present])


def iso_week_year(ts: Column | str) -> Column:
    """ISO week-based year. Spark's ``weekofyear`` is ISO, but there is no
    ISO week-year builtin (the ``'Y'`` datetime pattern is rejected in
    Spark >= 3.0): derive it as the calendar year of the Thursday of the
    ISO week — ``date_trunc('week', ts)`` is the ISO Monday, +3 days is
    Thursday, whose year is the ISO week-year by definition.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.year(F.date_add(F.date_trunc("week", c), 3))


def iso_week_key(ts: Column | str) -> Column:
    """``"2024-W31"`` ISO week label, matching python
    ``dt.isocalendar()`` (extract_patient_summary.py:97-98) across year
    boundaries (2024-12-30 → ``2025-W01``)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.concat_ws(
        "-W",
        iso_week_year(c).cast("string"),
        F.lpad(F.weekofyear(c).cast("string"), 2, "0"),
    )


def time_key(ts: Column | str, resolution: str = "monthly") -> Column:
    """Tumbling calendar key ``get_time_key`` parity
    (extract_patient_summary.py:93-102): monthly → ``YYYY-MM``, weekly →
    ISO ``YYYY-Www``, yearly → ``YYYY``, daily → ``YYYY-MM-DD``."""
    c = F.col(ts) if isinstance(ts, str) else ts
    if resolution in ("monthly", "month"):
        return F.date_format(c, "yyyy-MM")
    if resolution in ("weekly", "week"):
        return iso_week_key(c)
    if resolution in ("yearly", "year"):
        return F.date_format(c, "yyyy")
    if resolution in ("daily", "day"):
        return F.date_format(c, "yyyy-MM-dd")
    raise ValueError(f"unknown time resolution: {resolution!r}")


#: Filename-timestamp grammar of the lake:  YYYYMMDD_HHMM[_i].csv.gz
#: (collect_data_metadata.py:40; shard suffix summary.py:36-38).
FILENAME_TS_PATTERN = r"(\d{8}_\d{4})(?:_(\d+))?\.(?:csv\.gz|csv|parquet|json)$"


def filename_timestamp(filename: Column | str) -> Column:
    """Parse the batch timestamp out of a lake filename; malformed or
    out-of-range names (``notadate.csv.gz``, ``20241399_9999``) → NULL
    (main.py:38-41 catch-and-skip parity via try_to_timestamp)."""
    c = F.col(filename) if isinstance(filename, str) else filename
    raw = F.regexp_extract(c, FILENAME_TS_PATTERN, 1)
    return F.try_to_timestamp(F.nullif(raw, F.lit("")), F.lit("yyyyMMdd_HHmm"))


def filename_shard_index(filename: Column | str) -> Column:
    """Optional ``_i`` shard suffix → int, NULL when absent
    (summary.py:36-38)."""
    c = F.col(filename) if isinstance(filename, str) else filename
    return F.nullif(
        F.regexp_extract(c, FILENAME_TS_PATTERN, 2), F.lit("")
    ).cast("int")
