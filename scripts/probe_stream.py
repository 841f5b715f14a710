"""Streaming-key measurement harness (VERDICT r9 item 5): drain the
stream_holt / stream_anomaly shapes with the SAME operators and trigger
the gate keys use, capturing per-micro-batch progress — batch count,
rows, addBatch/getBatch/commit durations, and state-store metrics — so
streaming optimizations are decided on the micro-batch ledger instead
of end-to-end walls (drain-wait flakiness measured 1.8-11.5 s on
identical code in r9).

Usage:
  SPARK_GRAFT_CPUS=32 python scripts/probe_stream.py [--sf-dir ...] \
      [--out FILE.json] [--state-partitions N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from mhm_data_pipelines_spark.session import get_spark  # noqa: E402


def drain(out, name: str) -> dict:
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.perf_counter()
    q.awaitTermination(300)
    wall = time.perf_counter() - t0
    batches = []
    for p in q.recentProgress:
        d = p.get("durationMs", {})
        st = p.get("stateOperators", [])
        batches.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "addBatch_ms": d.get("addBatch"),
                "getBatch_ms": d.get("getBatch"),
                "latestOffset_ms": d.get("latestOffset"),
                "commitOffsets_ms": d.get("commitOffsets"),
                "walCommit_ms": d.get("walCommit"),
                "triggerExecution_ms": d.get("triggerExecution"),
                "state_commit_ms": sum(
                    s.get("allUpdatesTimeMs", 0)
                    + s.get("commitTimeMs", 0)
                    for s in st
                ),
                "state_rows": sum(
                    s.get("numRowsTotal", 0) for s in st
                ),
            }
        )
    return {"wall_sec": round(wall, 3), "n_batches": len(batches),
            "batches": batches}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--state-partitions", type=int, default=None)
    args = ap.parse_args()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = (
        args.state_partitions
        if args.state_partitions is not None
        else int(cpus)
    )
    spark = get_spark(
        app_name="mhm-probe-stream",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from mhm_data_pipelines_spark.benchmarks import registry as R
    from mhm_data_pipelines_spark.streaming.stateful import (
        ewma_anomaly_stream,
        holt_stream,
    )

    results: dict[str, dict] = {}
    stream = R._event_stream(spark, args.sf_dir)
    results["stream_holt"] = drain(
        holt_stream(stream), f"_probe_holt_{shuffle}"
    )
    stream2 = R._event_stream(spark, args.sf_dir)
    results["stream_anomaly"] = drain(
        ewma_anomaly_stream(stream2, alpha=0.25, threshold=3.0),
        f"_probe_anom_{shuffle}",
    )
    results["conf"] = {
        "shuffle_partitions": shuffle,
        "cpus": cpus,
        "sf_dir": args.sf_dir,
    }
    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
