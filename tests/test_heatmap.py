"""S12 heatmap sink: distributed pivot → bounded collect → image file
(data_collection.py:64-73 parity, zero-dependency PPM fallback)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.heatmap import (
    heatmap_array,
    render_heatmap,
    write_ppm,
)
from mhm_data_pipelines_spark.operators.overview import availability_matrix


@pytest.fixture(scope="module")
def events(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            F.col("user_id").cast("string").alias("participant_id"), "ts"
        )
    )


def test_heatmap_array_matches_groupby(spark, events):
    ids, dates, counts = heatmap_array(
        availability_matrix(events, ts="ts")
    )
    truth = {
        (str(r.participant_id), str(r.d)): r.n
        for r in events.groupBy(
            "participant_id", F.to_date("ts").alias("d")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts.shape == (len(ids), len(dates))
    assert counts.sum() == events.count()
    for (pid, d), n in truth.items():
        assert counts[ids.index(pid), dates.index(d)] == n
    # 0-fill everywhere no data exists
    assert (counts >= 0).all()


def test_render_heatmap_writes_image(spark, events, tmp_path):
    out = str(tmp_path / "avail.ppm")
    ids, dates = render_heatmap(events, out)
    with open(out, "rb") as f:
        data = f.read()
    assert data.startswith(b"P6\n")
    w, h = (int(x) for x in data.split(b"\n")[1].split())
    cell, grid = 12, 1
    assert w == len(dates) * cell + (len(dates) + 1) * grid
    assert h == len(ids) * cell + (len(ids) + 1) * grid
    # P6 body is w*h*3 bytes after the 3-line header
    header_len = len(b"P6\n") + data.split(b"\n", 3)[1].__len__() + 1 + 4
    assert len(data) == header_len + w * h * 3


def test_write_ppm_colormap_monotone(tmp_path):
    # Higher counts must map to darker (lower-luminance) YlGnBu colors.
    counts = np.array([[0, 1, 2, 4, 8]])
    p = str(tmp_path / "ramp.ppm")
    write_ppm(counts, p, cell=1, grid=0)
    body = open(p, "rb").read().split(b"\n", 3)[3]
    px = np.frombuffer(body, dtype=np.uint8).reshape(1, 5, 3).astype(int)
    lum = px.sum(axis=2)[0]
    assert list(lum) == sorted(lum, reverse=True)
    with pytest.raises(ValueError):
        write_ppm(np.zeros((0, 0)), p)


def test_render_heatmap_nonppm_requires_matplotlib(spark, events, tmp_path):
    try:
        import matplotlib  # noqa: F401
        pytest.skip("matplotlib present: the PNG path would succeed")
    except ImportError:
        pass
    with pytest.raises(ValueError, match="matplotlib"):
        render_heatmap(events, str(tmp_path / "x.png"))
