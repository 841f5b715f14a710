"""Gate-rotation staleness invariant (VERDICT r8 #4): rotation is a
CI-enforced contract, not a per-verdict reminder. Every registry key
must carry a driver-green row no older than ``MAX_STALE_ROUNDS``
rounds, or sit in the CURRENT window (it re-gates at the next driver
run). The two-round window plan that keeps this satisfiable is in
SURVEY.md §8 and the GATE_PRIORITY comment block."""

from __future__ import annotations

import glob
import json
import os
import re

#: A key's newest driver-green may trail the newest committed round by
#: at most this many rounds before CI demands it be re-windowed.
MAX_STALE_ROUNDS = 6

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _row_green(rec: dict) -> bool:
    return (
        rec.get("err") is None
        and rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match") is not False
    )


def _last_green() -> tuple[dict[str, int], int]:
    """(key -> newest green round, newest committed driver round).

    Same green sources as scripts/gate_ledger.py: driver
    CORRECTNESS_r{N}.json rows, plus two-scale
    CORRECTNESS_multiscale_r{N}.json greens (the accepted evidence
    path for keys added after a round's rotation commit — see
    test_oracle_parity.test_never_driver_verified_keys_are_gate_
    windowed). max_round counts DRIVER artifacts only, so the
    staleness floor is anchored to driver runs.
    """
    from mhm_data_pipelines_spark.benchmarks.registry import QUERIES

    out = {k: 0 for k in QUERIES}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        max_round = max(max_round, rnd)
        with open(path) as f:
            rows = json.load(f)
        for key, rec in rows.items():
            if key not in out:
                continue
            if _row_green(rec):
                out[key] = max(out[key], rnd)
    for path in sorted(
        glob.glob(os.path.join(ROOT, "CORRECTNESS_multiscale_r*.json"))
    ):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            per_scale = json.load(f)
        if len(per_scale) < 2:
            continue
        green_sets = [
            {k for k, rec in rows.items() if _row_green(rec)}
            for rows in per_scale.values()
        ]
        for key in set.intersection(*green_sets):
            if key in out:
                out[key] = max(out[key], rnd)
    return out, max_round


def test_no_key_staler_than_limit_unless_windowed():
    """Every key is either driver-green within the last
    MAX_STALE_ROUNDS rounds or queued in the upcoming window."""
    from mhm_data_pipelines_spark.benchmarks.registry import GATE_PRIORITY

    greens, max_round = _last_green()
    assert max_round > 0, "no committed CORRECTNESS_r*.json found"
    window = set(GATE_PRIORITY)
    floor = max_round - MAX_STALE_ROUNDS
    stale = sorted(
        k for k, r in greens.items() if r < floor and k not in window
    )
    assert not stale, (
        f"{len(stale)} keys have no driver-green newer than round "
        f"{floor} and are NOT in the upcoming gate window — rotate "
        f"them into GATE_PRIORITY: {stale}"
    )


def test_keys_breaching_next_round_are_windowed():
    """Forward guard: a key that will breach the staleness limit after
    the NEXT driver run must already be in that run's window, so the
    invariant above can never fail between rounds by construction."""
    from mhm_data_pipelines_spark.benchmarks.registry import GATE_PRIORITY

    greens, max_round = _last_green()
    window = set(GATE_PRIORITY)
    next_floor = (max_round + 1) - MAX_STALE_ROUNDS
    breaching = sorted(
        k for k, r in greens.items() if r < next_floor and k not in window
    )
    assert not breaching, (
        f"{len(breaching)} keys breach the {MAX_STALE_ROUNDS}-round "
        f"staleness limit after round {max_round + 1} and must lead "
        f"the upcoming window: {breaching}"
    )
