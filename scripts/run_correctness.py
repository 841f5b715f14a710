"""Driver-style correctness gate, runnable standalone: every registry
query side-by-side with its DuckDB oracle (value-hash compare via
tests.oracle_utils), rows-only for the hash-based/approximate ops.

Usage: python scripts/run_correctness.py [sf_dir] [--keys k1,k2,...]
(default sf0.01, all keys). Exit code 0 iff zero failures.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

from oracle_utils import check_query  # noqa: E402

from mhm_data_pipelines_spark.benchmarks.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
)
from mhm_data_pipelines_spark.session import get_spark  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    only: set[str] | None = None
    if "--keys" in argv:
        i = argv.index("--keys")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
        unknown = only - set(QUERIES)
        if unknown:
            print(f"unknown keys: {sorted(unknown)}")
            return 2
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    spark = get_spark(app_name="correctness-gate")
    spark.sparkContext.setLogLevel("ERROR")
    fails = 0
    for name in sorted(QUERIES):
        if only is not None and name not in only:
            continue
        if name not in ORACLES:
            try:
                n = QUERIES[name](spark, sf).count()
                print(f"ROWS  {name}: {n}")
            except Exception as e:  # noqa: BLE001
                fails += 1
                print(f"FAIL  {name}: {str(e)[:200]}")
            continue
        try:
            check_query(spark, sf, name)
            print(f"OK    {name}")
        except Exception as e:  # noqa: BLE001
            fails += 1
            print(f"FAIL  {name}: {str(e)[:200]}")
    print(
        f"summary: {len(QUERIES)} queries, {len(ORACLES)} oracle-checked, "
        f"{fails} failures"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
