"""Deterministic single-session probe for named bench keys: one COLD
run per key (driver-conditions shape: fresh plans, JIT-warm JVM) plus an
optional warm run, with the per-key job/stage/task/shuffle counts read
from the status REST API — the metrics that are exactly reproducible on
this host while single-run walls swing ±30-50% (r9 measurement note).

Usage:
  SPARK_GRAFT_CPUS=32 python scripts/probe_query.py \
      [--sf-dir /root/testdata/sf0.1] [--warm] [--out FILE.json] key...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from mhm_data_pipelines_spark.benchmarks.registry import (  # noqa: E402
    QUERIES,
    release_query_resources,
)
from mhm_data_pipelines_spark.session import get_spark  # noqa: E402


def _api(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def _snapshot(spark) -> dict:
    stages = _api(spark, "stages?status=complete")
    jobs = _api(spark, "jobs?status=succeeded")
    return {
        "jobs": len(jobs),
        "stages": len(stages),
        "tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="mhm-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Same session warmup as bench.py: codegen + shuffle machinery +
    # Python worker spawn are paid here, not in the first key's number.
    sf = args.sf_dir
    spark.read.parquet(f"{sf}/region.parquet").count()
    (
        spark.read.parquet(f"{sf}/nation.parquet")
        .groupBy("n_regionkey").count().count()
    )
    region = spark.read.parquet(f"{sf}/region.parquet")
    region.mapInPandas(lambda it: it, schema=region.schema).count()

    out: dict[str, dict] = {}
    for key in args.keys:
        if key not in QUERIES:
            raise SystemExit(f"unknown query key: {key}")
        import gc

        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        before = _snapshot(spark)
        spark.sparkContext.setJobDescription(f"probe:{key}")
        t0 = time.perf_counter()
        n = QUERIES[key](spark, sf).count()
        cold = time.perf_counter() - t0
        after = _snapshot(spark)
        rec = {
            "cold_sec": round(cold, 3),
            "rows": n,
            **{
                k: after[k] - before[k]
                for k in ("jobs", "stages", "tasks")
            },
            "shuffle_write_mb": round(
                (after["shuffle_write"] - before["shuffle_write"]) / 1e6, 2
            ),
            "shuffle_read_mb": round(
                (after["shuffle_read"] - before["shuffle_read"]) / 1e6, 2
            ),
        }
        if args.warm:
            t1 = time.perf_counter()
            QUERIES[key](spark, sf).count()
            rec["warm_sec"] = round(time.perf_counter() - t1, 3)
        spark.sparkContext.setJobDescription(None)
        release_query_resources()
        out[key] = rec
        print(f"# {key}: {json.dumps(rec)}", file=sys.stderr)
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
