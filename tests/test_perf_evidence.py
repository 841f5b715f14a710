"""Perf-evidence closure (VERDICT r5 #2): every registry key must carry
a BENCH entry, an sf1 scale probe, or a one-line documented exclusion
— and the three sets must not silently overlap in the exclusion table
(an excluded key that IS benched means the rationale is stale)."""

from __future__ import annotations

import importlib.util
import os

from mhm_data_pipelines_spark.benchmarks.registry import (
    BENCH_QUERIES,
    PERF_EVIDENCE_EXCLUSIONS,
    QUERIES,
)

_SP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "scale_probe.py",
)


def _probe_heavy() -> set[str]:
    spec = importlib.util.spec_from_file_location("scale_probe", _SP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return set(mod.HEAVY)


def test_every_query_has_perf_evidence_or_rationale():
    covered = (
        set(BENCH_QUERIES) | _probe_heavy() | set(PERF_EVIDENCE_EXCLUSIONS)
    )
    missing = sorted(set(QUERIES) - covered)
    assert not missing, (
        f"{len(missing)} registry keys have neither a bench entry, an "
        f"sf1 probe, nor a documented exclusion: {missing}"
    )


def test_exclusions_are_not_stale():
    evid = set(BENCH_QUERIES) | _probe_heavy()
    stale = sorted(set(PERF_EVIDENCE_EXCLUSIONS) & evid)
    assert not stale, (
        f"excluded keys that now have bench/probe evidence — delete the "
        f"stale rationale: {stale}"
    )
    unknown = sorted(set(PERF_EVIDENCE_EXCLUSIONS) - set(QUERIES))
    assert not unknown, f"exclusions for non-existent keys: {unknown}"


def test_bench_and_gate_keys_exist():
    unknown = sorted(set(BENCH_QUERIES) - set(QUERIES))
    assert not unknown, f"bench entries for non-existent keys: {unknown}"


def test_heavy_keys_have_committed_probe_results():
    """HEAVY membership alone is not evidence — the committed
    SCALE_PROBE.json must actually hold an sf0.1 AND sf1 result for
    every HEAVY key (VERDICT r6 #1: two r6 keys sat in HEAVY for a
    round with no committed probe, invisible to CI)."""
    import json

    sp_path = os.path.join(os.path.dirname(_SP), "..", "SCALE_PROBE.json")
    with open(sp_path) as f:
        probed = json.load(f)
    missing = sorted(
        k
        for k in _probe_heavy()
        if k not in probed
        or "sf0.1" not in probed[k]
        or "sf1" not in probed[k]
    )
    assert not missing, (
        f"HEAVY keys with no committed sf0.1+sf1 probe result in "
        f"SCALE_PROBE.json — re-run scripts/scale_probe.py and commit: "
        f"{missing}"
    )
