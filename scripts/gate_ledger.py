"""Gate-staleness ledger: for every registry key, the LAST round with
a driver-green row (union of the committed CORRECTNESS_r*.json files,
plus the current GATE_PRIORITY window as the upcoming round) — the
input the rotation policy ranks on. Run it when composing the next
round's window; the stalest keys lead.

Usage: python scripts/gate_ledger.py [--limit N]
Prints `last_green_round  key` sorted stalest-first. Keys inside the
CURRENT window rank as the upcoming round (they'll be gated at the
next driver run), so the list head is exactly what the next rotation
should window. A never-gated key OUTSIDE the window prints as r0 at
the very top and exits non-zero — the structural tripwire in
tests/test_oracle_parity.py forbids that state.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from mhm_data_pipelines_spark.benchmarks.registry import (  # noqa: E402
    GATE_PRIORITY,
    QUERIES,
)


def last_green() -> dict[str, int]:
    """key -> last round with a fully-green driver row (0 = never)."""
    out = {k: 0 for k in QUERIES}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            rows = json.load(f)
        for key, rec in rows.items():
            if key not in out:
                continue  # renamed/retired keys don't count
            ok = (
                rec.get("err") is None
                and rec.get("rows_match")
                and rec.get("schema_match")
                # hash_match is None for rows-only keys — accept.
                and rec.get("hash_match") is not False
            )
            if ok:
                out[key] = max(out[key], rnd)
    return out


def main() -> int:
    limit = None
    if "--limit" in sys.argv:
        limit = int(sys.argv[sys.argv.index("--limit") + 1])
    greens = last_green()
    window = set(GATE_PRIORITY)
    # Keys in the CURRENT window will be gated at the next driver run:
    # rank them as the UPCOMING round (max committed round + 1), so the
    # stalest-first list reflects the state the next rotation composes
    # against — the list head is what r8 should window, and windowed
    # keys sink to the bottom instead of re-surfacing at their old
    # round. The tripwire check below still uses the COMMITTED rounds.
    upcoming = max(greens.values(), default=0) + 1
    ranked = sorted(
        (
            (k, upcoming if k in window else r)
            for k, r in greens.items()
        ),
        key=lambda kv: (kv[1], kv[0]),
    )
    shown = 0
    for key, rnd in ranked:
        if limit is not None and shown >= limit:
            break
        tag = "  [windowed]" if key in window else ""
        print(f"r{rnd}  {key}{tag}")
        shown += 1
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
