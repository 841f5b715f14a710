"""Gate-staleness ledger: for every registry key, the LAST round with
a driver-green row (union of the committed CORRECTNESS_r*.json files,
plus the current GATE_PRIORITY window as the upcoming round) — the
input the rotation policy ranks on. Run it when composing the next
round's window; the stalest keys lead.

Usage:
  python scripts/gate_ledger.py [--limit N]      # stalest-first text
  python scripts/gate_ledger.py --json           # write GATE_LEDGER.json

Text mode prints ``last_green_round  key`` sorted stalest-first. Keys
inside the CURRENT window rank as the upcoming round (they'll be gated
at the next driver run), so the list head is exactly what the next
rotation should window. A never-gated key OUTSIDE the window prints as
r0 at the very top and exits non-zero — the structural tripwire in
tests/test_oracle_parity.py forbids that state.

``--json`` emits the machine-readable coverage ledger (VERDICT r7 #4)
to ``GATE_LEDGER.json`` at the repo root: per key the registry builder
location, newest committed driver-green round, current-window
membership, oracle kind (full-value vs rows-only), and the
perf-evidence classification (bench warm seconds / sf1 probe ratio /
documented exclusion). ``tests/test_perf_evidence.py`` asserts the
committed file is fresh against the live registry, so the JSON is the
auditable source of the SURVEY §8 coverage prose.
"""

from __future__ import annotations

import argparse
import glob
import importlib.util
import inspect
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from mhm_data_pipelines_spark.benchmarks.registry import (  # noqa: E402
    BENCH_QUERIES,
    GATE_PRIORITY,
    ORACLES,
    PERF_EVIDENCE_EXCLUSIONS,
    QUERIES,
)


def _row_green(rec: dict) -> bool:
    return (
        rec.get("err") is None
        and rec.get("rows_match")
        and rec.get("schema_match")
        # hash_match is None for rows-only keys — accept.
        and rec.get("hash_match") is not False
    )


def last_green() -> dict[str, int]:
    """key -> last round with a fully-green driver row (0 = never).

    Two sources count, per the contract in
    tests/test_oracle_parity.py::test_never_driver_verified_keys_are_
    gate_windowed (accepted by the r8 verdict): the driver's own
    ``CORRECTNESS_r{N}.json``, and a committed two-scale
    ``CORRECTNESS_multiscale_r{N}.json`` green (same checker —
    scripts/run_correctness.py — at sf0.01, the driver's scale, PLUS
    sf0.001); the latter is how keys added AFTER a round's rotation
    commit are verified without re-stranding a windowed stale key.
    """
    out = {k: 0 for k in QUERIES}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            rows = json.load(f)
        for key, rec in rows.items():
            if key not in out:
                continue  # renamed/retired keys don't count
            if _row_green(rec):
                out[key] = max(out[key], rnd)
    for path in sorted(
        glob.glob(os.path.join(ROOT, "CORRECTNESS_multiscale_r*.json"))
    ):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            per_scale = json.load(f)
        if len(per_scale) < 2:
            continue  # single-scale records are not multiscale evidence
        green_sets = [
            {k for k, rec in rows.items() if _row_green(rec)}
            for rows in per_scale.values()
        ]
        for key in set.intersection(*green_sets):
            if key in out:
                out[key] = max(out[key], rnd)
    return out


def _probe_heavy() -> list[str]:
    sp = os.path.join(ROOT, "scripts", "scale_probe.py")
    spec = importlib.util.spec_from_file_location("scale_probe", sp)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.HEAVY)


def build_ledger() -> dict:
    """The full machine-readable ledger (see module docstring)."""
    greens = last_green()
    window = set(GATE_PRIORITY)
    heavy = set(_probe_heavy())
    benched = set(BENCH_QUERIES)
    probes = {}
    sp_path = os.path.join(ROOT, "SCALE_PROBE.json")
    if os.path.exists(sp_path):
        with open(sp_path) as f:
            probes = json.load(f)
    bench_warm = {}
    bl_path = os.path.join(ROOT, "BENCH_local.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            doc = json.load(f)
        bench_warm = doc.get("queries_warm") or {}

    keys = {}
    for key in sorted(QUERIES):
        src_file = inspect.getsourcefile(QUERIES[key])
        src_line = inspect.getsourcelines(QUERIES[key])[1]
        ev_kinds = []
        if key in benched:
            ev_kinds.append("bench")
        if key in heavy:
            ev_kinds.append("probe")
        if key in PERF_EVIDENCE_EXCLUSIONS:
            ev_kinds.append("exclusion")
        entry = {
            "builder": f"{os.path.relpath(src_file, ROOT)}:{src_line}",
            "last_green_round": greens[key],
            "windowed_r_next": key in window,
            "oracle": "full-value" if ORACLES.get(key) else "rows-only",
            "perf_evidence": ev_kinds,
        }
        if key in bench_warm:
            entry["bench_warm_sec"] = bench_warm[key]
        if key in probes:
            entry["probe_ratio_10x_data"] = probes[key].get("ratio_10x_data")
        if key in PERF_EVIDENCE_EXCLUSIONS:
            entry["exclusion_rationale"] = PERF_EVIDENCE_EXCLUSIONS[key]
        keys[key] = entry
    return {
        "n_keys": len(keys),
        "window_size": len(GATE_PRIORITY),
        "note": (
            "last_green_round is the newest committed CORRECTNESS_r*.json "
            "with a fully-green row; windowed keys re-gate at the next "
            "driver run. Every key is additionally hash-checked each CI "
            "run by tests/test_oracle_parity.py regardless of window."
        ),
        "keys": keys,
    }


def main() -> int:
    ap = argparse.ArgumentParser(
        description="Gate-staleness ledger (text) / coverage ledger (--json)"
    )
    ap.add_argument(
        "--limit", type=int, default=None, metavar="N",
        help="show only the N stalest keys (text mode)",
    )
    ap.add_argument(
        "--json", action="store_true",
        help="write the machine-readable ledger to GATE_LEDGER.json",
    )
    args = ap.parse_args()

    if args.json:
        ledger = build_ledger()
        out = os.path.join(ROOT, "GATE_LEDGER.json")
        with open(out, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=False)
            f.write("\n")
        print(f"wrote {out}: {ledger['n_keys']} keys")
        return 0

    greens = last_green()
    window = set(GATE_PRIORITY)
    # Keys in the CURRENT window will be gated at the next driver run:
    # rank them as the UPCOMING round (max committed round + 1), so the
    # stalest-first list reflects the state the next rotation composes
    # against — the list head is what the next round should window, and
    # windowed keys sink to the bottom instead of re-surfacing at their
    # old round. The tripwire check below still uses COMMITTED rounds.
    upcoming = max(greens.values(), default=0) + 1
    ranked = sorted(
        ((k, upcoming if k in window else r) for k, r in greens.items()),
        key=lambda kv: (kv[1], kv[0]),
    )
    for key, rnd in ranked[: args.limit]:
        tag = "  [windowed]" if key in window else ""
        print(f"r{rnd}  {key}{tag}")
    never = [k for k, r in greens.items() if r == 0 and k not in window]
    if never:
        print(
            f"\nERROR: {len(never)} never-gated keys OUTSIDE the window: "
            f"{sorted(never)}",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
