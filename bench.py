"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (round-4 fix for BENCH_r03 ``parsed: null``): the final
stdout line is a COMPACT JSON object — metric/"value" (cold total)/
unit/warm_total/sf plus the per-query WARM map under "queries" (warm is
the regression-hunting signal; 2-decimal rounding keeps the line inside
the driver's tail-capture window). The full record (cold AND warm
per-query maps, 3-decimal) is written to ``BENCH_local.json`` next to
this file; that file is what ``python scripts/bench_diff.py`` should
read for regression hunting.

Every query runs TWICE: the first (cold) run includes plan + codegen
compile — that's what "queries"/"value" report, keeping round-over-round
totals comparable — and the second (warm) run isolates execution time
(cold is typically 3-5× warm on sub-second queries; memory-noted). The
"queries_warm" map is what regression hunting should read:
``python scripts/bench_diff.py BENCH_rA.json BENCH_rB.json`` names
per-query movers. Each run fully materializes via count() — nothing but
the count reaches the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mhm_data_pipelines_spark.benchmarks.registry import (  # noqa: E402
    BENCH_QUERIES,
    QUERIES,
    release_query_resources,
)
from mhm_data_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="mhm-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + file listing so per-query numbers measure the query,
    # not session startup: one trivial scan (codegen bootstrap) and one
    # small aggregate (hash-agg + shuffle machinery). No headline query's
    # own plan is pre-run.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .groupBy("n_regionkey")
        .count()
        .count()
    )
    # Python-worker warmup: the PQ/IVF-PQ/multimodal queries run Arrow
    # mapInPandas stages; daemon + worker spawn (~1 s) should be paid
    # here, not inside the first such query's cold number.
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    region.mapInPandas(
        lambda it: it, schema=region.schema
    ).count()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        n = df.count()
        cold[name] = round(time.perf_counter() - t0, 3)
        # Fresh build so caches/persists internal to the query function
        # are re-created too; plan + codegen are now JIT-warm.
        t1 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        warm[name] = round(time.perf_counter() - t1, 3)
        # Deterministic, scoped release of builder-owned resources
        # (persisted index frames, mkdtemp sink/stream scratch) — the
        # r4 blanket clearCache() hid which queries leaked (ADVICE r4).
        release_query_resources()
        print(
            f"# {name}: cold {cold[name]:.3f}s / warm {warm[name]:.3f}s"
            f" ({n} rows)",
            file=sys.stderr,
        )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    full = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(cold.values()), 3),
        "unit": "sec",
        "queries": cold,
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 3),
        "sf": float(sf) if sf else None,
    }
    # Full record (cold + warm maps, 3-dec) for scripts/bench_diff.py.
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"
    )
    with open(local_path, "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    # Final stdout line stays compact (driver tail-capture window is
    # ~2 KB): totals + the warm per-query map at 2 decimals, no cold map.
    print(
        json.dumps(
            {
                "metric": full["metric"],
                "value": full["value"],
                "unit": "sec",
                "warm_total": full["warm_total"],
                "sf": full["sf"],
                "queries": {k: round(v, 2) for k, v in warm.items()},
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
