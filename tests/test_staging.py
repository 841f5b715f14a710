"""S5 staging escape hatch: distributed lake mirror with
include/exclude and skip-if-exists parity (download_data.py:83-145)."""

from __future__ import annotations

import os

from mhm_data_pipelines_spark.sources.staging import stage_objects


def _statuses(df):
    return {r.rel_key: r for r in df.collect()}


def test_stage_copies_tree_and_skips_existing(spark, lake_root, tmp_path):
    dest = str(tmp_path / "mirror")
    out = _statuses(stage_objects(spark, lake_root, dest))
    assert out, "listing found no objects"
    assert all(r.action == "copied" for r in out.values())
    # rel_key is relative to src_root, not an absolute-path echo.
    assert all(k.startswith("study-data/") for k in out)
    # Byte-identical mirror under dest/<rel_key>.
    for rel, r in out.items():
        assert r.dest_path == f"{dest}/{rel}"
        assert os.path.getsize(r.dest_path) == r.bytes
        src_local = r.src_path.replace("file:", "", 1)
        with open(src_local, "rb") as a, open(r.dest_path, "rb") as b:
            assert a.read() == b.read()

    # Second run: everything exists → skipped, nothing re-copied
    # (download_data.py:110-113 skip-if-exists).
    again = _statuses(stage_objects(spark, lake_root, dest))
    assert set(again) == set(out)
    assert all(r.action == "skipped" for r in again.values())

    # skip_file_check forces the copy even when the file exists (:111).
    forced = _statuses(
        stage_objects(spark, lake_root, dest, skip_file_check=True)
    )
    assert all(r.action == "copied" for r in forced.values())


def test_stage_include_exclude_path_parts(spark, lake_root, tmp_path):
    dest = str(tmp_path / "lon_only")
    out = _statuses(stage_objects(spark, lake_root, dest, include=["LON"]))
    assert out and all("/LON/" in f"/{k}" for k in out)

    dest2 = str(tmp_path / "no_lon")
    out2 = _statuses(stage_objects(spark, lake_root, dest2, exclude=["LON"]))
    assert out2 and not any("/LON/" in f"/{k}" for k in out2)
    # include/exclude partition the lake (exclude wins on overlap —
    # here disjoint, so the two mirrors union to the full listing).
    full = _statuses(stage_objects(spark, lake_root, str(tmp_path / "all")))
    assert set(out) | set(out2) == set(full)


def test_stage_errors_are_rows_not_raises(spark, lake_root, tmp_path):
    dest = str(tmp_path / "errdest")
    # Sabotage: pre-create one dest path as a DIRECTORY so the copy
    # fails for that file only (parity with log-and-continue :71-80).
    rels = sorted(
        os.path.relpath(os.path.join(d, f), lake_root)
        for d, _, files in os.walk(lake_root)
        for f in files
    )
    victim = rels[0]
    os.makedirs(f"{dest}/{victim}")
    out = _statuses(stage_objects(spark, lake_root, dest))
    assert out[victim].action == "error"
    assert out[victim].error
    others = [r for k, r in out.items() if k != victim]
    assert others and all(r.action == "copied" for r in others)
