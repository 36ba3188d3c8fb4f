"""Per-batch cost breakdown for streaming keys (r19, VERDICT item 1).

Runs a registered streaming key N times in ONE session (the single-session
discipline from CLAUDE.md) and dumps, per run, the micro-batch progress
the framework itself reports: batchId, rows, triggerExecution /
addBatch / getBatch breakdown, and the state operator's commit/update
metrics (RocksDB custom metrics included).  This is the evidence layer
the r17 floor audit lacked: it attributes each batch's wall time to
planning vs state-commit vs Python exec instead of inferring from totals.

Usage:
    python scripts/stream_probe.py --key stateful_sessionize_tws \
        [--sf /root/testdata/sf0.1] [--n 3] [--parts N] [--conf k=v ...]

--parts monkeypatches queries._parts (the state-partition count) for the
probe only; --conf sets session confs before each run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreamingstateful_spark import registry, session  # noqa: E402
from sparkstreamingstateful_spark.streaming import queries, runner  # noqa: E402


def summarize_progress(progress: list[dict]) -> list[dict]:
    out = []
    for p in progress:
        d = p.get("durationMs") or {}
        row = {
            "batchId": p.get("batchId"),
            "numInputRows": p.get("numInputRows"),
            "triggerExecution": d.get("triggerExecution"),
            "addBatch": d.get("addBatch"),
            "getBatch": d.get("getBatch"),
            "queryPlanning": d.get("queryPlanning"),
            "walCommit": d.get("walCommit"),
            "commitOffsets": d.get("commitOffsets"),
        }
        ops = p.get("stateOperators") or []
        if ops:
            so = ops[0]
            row["state"] = {
                k: so.get(k)
                for k in (
                    "operatorName",
                    "numRowsTotal",
                    "numRowsUpdated",
                    "allUpdatesTimeMs",
                    "numRowsRemoved",
                    "allRemovalsTimeMs",
                    "commitTimeMs",
                )
            }
            cm = so.get("customMetrics") or {}
            row["state"]["custom"] = {
                k: v
                for k, v in cm.items()
                if v and k in (
                    "rocksdbCommitCheckpointLatency",
                    "rocksdbCommitCompactLatency",
                    "rocksdbCommitFileSyncLatencyMs",
                    "rocksdbCommitFlushLatency",
                    "rocksdbCommitWriteBatchLatency",
                    "rocksdbTotalBytesRead",
                    "rocksdbTotalBytesWritten",
                    "numValueStateVars",
                    "numListStateVars",
                    "numMapStateVars",
                    "numRegisteredTimers",
                    "numDeletedTimers",
                    "numExpiredTimers",
                    "numValueStateGetCalls",
                    "numValueStateUpdateCalls",
                )
            }
        out.append(row)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--key", required=True)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--parts", type=int, default=None)
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    if args.parts is not None:
        queries._parts = lambda sf_dir, _p=args.parts: _p  # probe-only patch

    spark = session.get_spark(app_name=f"stream-probe-{args.key}")
    for kv in args.conf:
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)

    fns, _ = registry.collect()
    fn = fns[args.key]
    results = []
    for i in range(args.n):
        spark.sparkContext.setJobDescription(f"probe:{args.key}:{i}")
        t0 = time.monotonic()
        df = fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        batches = summarize_progress(runner.LAST_QUERY_PROGRESS)
        results.append({"run": i, "wall_s": round(wall, 2), "batches": batches})
        print(json.dumps(results[-1]), flush=True)
    walls = [r["wall_s"] for r in results]
    print(json.dumps({"key": args.key, "walls": walls,
                      "median": sorted(walls)[len(walls) // 2],
                      "parts": args.parts,
                      "confs": args.conf}), flush=True)


if __name__ == "__main__":
    main()
