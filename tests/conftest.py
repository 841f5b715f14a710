"""Shared fixtures: one local SparkSession per test session, plus a
FIXTURES.md-shaped miniature lake on disk."""

from __future__ import annotations

import gzip
import os
from pathlib import Path

import pytest

from mhm_data_pipelines_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    extra = {}
    if os.environ.get("SPARK_GRAFT_TEST_NO_UI"):
        extra["spark.ui.enabled"] = "false"
    if os.environ.get("SPARK_GRAFT_TEST_CODEGEN") == "off":
        extra["spark.sql.codegen.wholeStage"] = "false"
    spark = get_spark(
        app_name="mhm-tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"),
        shuffle_partitions=8,
        extra_conf=extra or None,
    )
    yield spark


def _write_csv_gz(path: Path, header: list[str], rows: list[list]) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(path, "wt") as f:
        f.write(",".join(header) + "\n")
        for r in rows:
            f.write(",".join("" if v is None else str(v) for v in r) + "\n")


# Epoch anchors (UTC): 2024-12-28 12:00 and 2025-01-02 12:00 — spans the
# 2024→2025 ISO year boundary (FIXTURES.md §0).
DEC = 1735387200.0
JAN = 1735819200.0
DAY = 86400.0


@pytest.fixture(scope="session")
def lake_root(tmp_path_factory) -> str:
    """Raw lake: <root>/<top>/<SITE>/<PID>/<METRIC>/YYYYMMDD_HHMM[_i].csv.gz
    with typed sensor data, app logs, sleep, questionnaires, and malformed
    filenames (must be skipped by parsers, not fail)."""
    root = tmp_path_factory.mktemp("lake")
    top = root / "study-data"

    hc_header = [
        "key.projectId", "key.userId", "value.time", "value.key",
        "value.intVal", "value.floatVal", "device",
    ]
    for site, pid in (("LON", "ABC-123-XYZ"), ("MAN", "DEF-456-UVW")):
        base = DEC if site == "LON" else JAN
        rows = []
        for d in range(3):
            t = base + d * DAY
            rows.append(["proj", pid, t + 0.70951, "Steps", 1000 + d, None, "pixel-7"])
            rows.append(["proj", pid, t + 100.5, "Steps", 2000 + d, None, "galaxy-watch"])
            rows.append(["proj", pid, t + 200.25, "HeartRate", None, 60.5 + d, "pixel-7"])
        _write_csv_gz(
            top / site / pid / "android_health_connect_typed_data" / "20241228_1200.csv.gz",
            hc_header, rows,
        )
        # A second (sharded) batch file exercising the _i suffix.
        _write_csv_gz(
            top / site / pid / "android_health_connect_typed_data" / "20250102_1200_1.csv.gz",
            hc_header,
            [["proj", pid, JAN + 4 * DAY, "Steps", 5000, None, "pixel-7"]],
        )

    # device_app_log: 5-part spec target, schema drift (extra "app" col in
    # one file only).
    _write_csv_gz(
        top / "LON" / "ABC-123-XYZ" / "device_app_log" / "20241228_1300.csv.gz",
        ["timestamp", "usage_duration"],
        [[DEC + 3600, 2.5], [DEC + DAY + 3600, 3.5], [DEC + DAY + 7200, "oops"]],
    )
    _write_csv_gz(
        top / "LON" / "ABC-123-XYZ" / "device_app_log" / "20250102_1300.csv.gz",
        ["timestamp", "usage_duration", "app"],
        [[JAN + 3600, 1.0, "maps"]],
    )

    # questionnaire_response: wide repeated answers family, one non-numeric
    # slider value (skipped), one sleep_5 histogram target.
    q_header = ["value.timeCompleted", "StartTime"]
    for i in range(3):
        q_header += [
            f"value.answers.{i}.questionId",
            f"value.answers.{i}.value",
            f"value.answers.{i}.startTime",
        ]
    _write_csv_gz(
        top / "LON" / "ABC-123-XYZ" / "questionnaire_response" / "20241229_0900.csv.gz",
        q_header,
        [
            [DEC + 500, DEC + 400,
             "negative_emotions_1", 3, DEC + 410,
             "negative_emotions_2", 4, DEC + 420,
             "sleep_5", "poor", DEC + 430],
            [DEC + DAY + 500, DEC + DAY + 400,
             "negative_emotions_1", 5, DEC + DAY + 410,
             "negative_emotions_2", "N/A", DEC + DAY + 420,
             "sleep_5", "good", DEC + DAY + 430],
        ],
    )

    # Malformed filenames: parseable content, unparseable batch timestamp.
    _write_csv_gz(
        top / "LON" / "ABC-123-XYZ" / "device_app_log" / "notadate.csv.gz",
        ["timestamp", "usage_duration"], [[DEC, 9.9]],
    )
    return str(root)
