"""S12 — availability heatmap image sink.

Reference: ``mhm-data-pipelines/data_collection.py:64-73``
(``render_heatmap``) — pandas ``pivot_table(index=participant, columns=
date, values=metric, aggfunc='count', fill_value=0)`` rendered with a
seaborn ``YlGnBu`` heatmap and saved to file.

Engine split (SURVEY §2.1 S12): the *data* path — the participant×date
count pivot — is the distributed ``overview.availability_matrix``; only
the rendered image is presentation-side, on the collected (bounded:
participants × days, kilobytes at any corpus size) matrix. This module
is that presentation step, so a reference user keeps their one-call
``render_heatmap(df, file)`` workflow.

Rendering: matplotlib/seaborn are soft imports (not bundled in this
container). The always-available fallback is a pure-numpy rasterizer
writing binary PPM (P6) — the same zero-dependency image strategy as
``operators.multimodal`` — with a hand-sampled YlGnBu ramp, per-cell
pixel blocks, and grid lines, matching the reference's visual layout
(participants on Y, dates on X, darker = more rows).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame

from mhm_data_pipelines_spark.operators.overview import availability_matrix

__all__ = ["heatmap_array", "render_heatmap", "write_ppm"]

#: YlGnBu anchors sampled from the colormap (light yellow → dark blue),
#: linearly interpolated. RGB uint8.
_YLGNBU = np.array(
    [
        (255, 255, 217),
        (199, 233, 180),
        (65, 182, 196),
        (34, 94, 168),
        (8, 29, 88),
    ],
    dtype=np.float64,
)


def _colormap(norm: np.ndarray) -> np.ndarray:
    """norm in [0,1] → (..., 3) uint8 via piecewise-linear YlGnBu."""
    pos = np.clip(norm, 0.0, 1.0) * (len(_YLGNBU) - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, len(_YLGNBU) - 1)
    frac = (pos - lo)[..., None]
    rgb = _YLGNBU[lo] * (1 - frac) + _YLGNBU[hi] * frac
    # floor(x+0.5), not np.round: banker's rounding differs from SQL
    # round() on .5 ties — half-up is reproducible in any engine (the
    # DuckDB heatmap oracle recomputes these exact bytes).
    return np.floor(rgb + 0.5).astype(np.uint8)


def heatmap_array(
    matrix: DataFrame, id_col: str = "participant_id"
) -> tuple[list[str], list[str], np.ndarray]:
    """Collect an ``availability_matrix`` output (id + one column per
    date, 0-filled) into ``(row_ids, date_cols, counts)`` with rows
    sorted by id and date columns in name order — the deterministic
    presentation frame. Bounded by construction: participants × days."""
    date_cols = sorted(c for c in matrix.columns if c != id_col)
    rows = sorted(matrix.collect(), key=lambda r: str(r[id_col]))
    ids = [str(r[id_col]) for r in rows]
    counts = np.array(
        [[int(r[c] or 0) for c in date_cols] for r in rows],
        dtype=np.int64,
    )
    return ids, date_cols, counts


def write_ppm(
    counts: np.ndarray,
    path: str,
    cell: int = 12,
    grid: int = 1,
) -> None:
    """Rasterize a 2-D count matrix to a binary PPM (P6): ``cell``-pixel
    square per matrix cell, ``grid``-pixel gray separators (the
    reference draws ``linewidths=0.5, linecolor='gray'``)."""
    if counts.ndim != 2 or counts.size == 0:
        raise ValueError("counts must be a non-empty 2-D array")
    peak = counts.max()
    norm = counts / peak if peak > 0 else np.zeros_like(counts, float)
    rgb = _colormap(norm)
    ny, nx = counts.shape
    h = ny * cell + (ny + 1) * grid
    w = nx * cell + (nx + 1) * grid
    img = np.full((h, w, 3), 128, dtype=np.uint8)  # gray grid backdrop
    for i in range(ny):
        y0 = grid + i * (cell + grid)
        for j in range(nx):
            x0 = grid + j * (cell + grid)
            img[y0 : y0 + cell, x0 : x0 + cell] = rgb[i, j]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(img.tobytes())


def render_heatmap(
    df: DataFrame,
    heatmap_file: str,
    ts: Column | str = "ts",
    id_col: str = "participant_id",
    cell: int = 12,
) -> tuple[list[str], list[str]]:
    """One-call parity with the reference's ``render_heatmap(df, file)``
    (data_collection.py:64-73): distributed pivot → collected bounded
    matrix → image file. Returns ``(row_ids, date_columns)`` so callers
    can emit axis legends (PPM carries no text).

    The output FORMAT follows the file extension, deterministically —
    never the environment: a ``.ppm`` path always uses the built-in
    numpy rasterizer (matplotlib cannot write PPM, and silently
    switching format by environment would break byte-level consumers
    like the pixel-oracle gate query); any other extension renders a
    titled-axes matplotlib figure (reference visual parity,
    data_collection.py:64-73) and raises a clear error if matplotlib is
    unavailable. The input is the *event-level* frame (one row per
    observation), exactly like the reference — the pivot happens here,
    in the engine, not in pandas."""
    matrix = availability_matrix(df, ts=ts, id_col=id_col)
    ids, dates, counts = heatmap_array(matrix, id_col=id_col)
    ext = heatmap_file.rsplit(".", 1)[-1].lower()
    if ext == "ppm":
        write_ppm(counts, heatmap_file, cell=cell)
        return ids, dates
    try:  # pragma: no cover - matplotlib absent in this container
        import matplotlib
    except ImportError as exc:
        raise ValueError(
            f"rendering {heatmap_file!r} requires matplotlib; use a "
            ".ppm path for the built-in zero-dependency rasterizer"
        ) from exc
    matplotlib.use("Agg")  # pragma: no cover
    import matplotlib.pyplot as plt  # pragma: no cover

    fig, ax = plt.subplots(figsize=(20, 10))
    im = ax.imshow(counts, aspect="auto", cmap="YlGnBu")
    ax.set_title("Data Availability Heatmap")
    ax.set_xlabel("Date")
    ax.set_ylabel("Participant")
    ax.set_xticks(range(len(dates)), dates, rotation=90, fontsize=6)
    ax.set_yticks(range(len(ids)), ids, fontsize=6)
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(heatmap_file)
    plt.close(fig)
    return ids, dates
