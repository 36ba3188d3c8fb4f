"""Streaming-query runner: execute a streaming DataFrame to completion
(``availableNow`` trigger) into a memory sink and hand back the materialized
result table.

The memory sink is the test/driver surface; production sinks (foreachBatch →
parquet with exactly-once via checkpoint, console) are exercised in
tests/test_streaming.py (S5, ST11).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame

# Progress snapshots of the most recent run_stream() execution (list of
# per-micro-batch progress dicts, driver-side metadata only — a few KB).
# Tests read state-operator metrics from here (e.g. asserting
# dropDuplicatesWithinWatermark actually EVICTS state rows) without the
# queries having to thread a query handle through their return value.
LAST_QUERY_PROGRESS: list[dict] = []


def require_no_data_batches(spark) -> None:
    """The single-sentinel feed design (feeder.py) relies on the no-data
    flush micro-batch to apply the final watermark and evict remaining
    state; it is on by default, but pin it so a cluster-side override
    can't silently turn sentinel feeds into never-emitting streams.
    Explicit raise (not assert — stripped under python -O) and
    case-insensitive (Spark parses boolean confs case-insensitively).
    Every sentinel-fed streaming execution must call this — including
    queries that drive their own writeStream instead of run_stream
    (stream_topk_per_window's foreachBatch pipeline)."""
    no_data = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    if str(no_data).lower() != "true":
        raise RuntimeError(
            "single-sentinel feeds require "
            "spark.sql.streaming.noDataMicroBatches.enabled=true "
            f"(found {no_data!r}); see streaming/feeder.py"
        )


def run_stream_drain(
    df: DataFrame,
    *,
    done,
    output_mode: str = "complete",
    state_partitions: int = 4,
    timeout_s: float = 120.0,
) -> DataFrame:
    """Run a streaming DataFrame until ``done(end_offset)`` says the
    source is exhausted, then stop and return the memory table.

    Exists for custom Python micro-batch sources
    (``sources/pyds.ParquetDirStreamDataSource``): the availableNow
    trigger snapshots "latest" ONCE at start, but a Python source's
    ``latestOffset`` is also its rate limiter (it advances per call), so
    availableNow would consume exactly one micro-batch and declare
    victory (measured). Instead: continuous trigger + poll the committed
    end offset from query progress until the caller's predicate holds.
    ``done`` receives the parsed ``endOffset`` dict of source 0.
    """
    import json
    import time

    spark = df.sparkSession
    name = "sss_mem_" + uuid.uuid4().hex[:12]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="sss_ckpt_"))
            .start()
        )
        try:
            deadline = time.monotonic() + timeout_s
            while True:
                if q.exception() is not None:
                    raise q.exception()
                p = q.lastProgress
                if p:
                    end = (p.get("sources") or [{}])[0].get("endOffset")
                    if isinstance(end, str):
                        # Python-source offsets surface in progress as the
                        # dict's repr (single quotes), not JSON — measured
                        # "{'split': 1}". Accept both.
                        try:
                            end = json.loads(end)
                        except json.JSONDecodeError:
                            import ast

                            end = ast.literal_eval(end)
                    if end is not None and done(end):
                        break
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"stream not drained after {timeout_s}s; "
                        f"last progress: {p}"
                    )
                time.sleep(0.05)
        finally:
            # the timeout/exception paths must not leak a forever-running
            # query (it would keep polling latestOffset and hold executor
            # slots against every later query in the session)
            q.stop()
        q.awaitTermination()
        global LAST_QUERY_PROGRESS
        LAST_QUERY_PROGRESS = [dict(pr) for pr in (q.recentProgress or [])]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def run_stream(
    df: DataFrame, *, output_mode: str = "append", state_partitions: int = 4
) -> DataFrame:
    """Run a streaming DataFrame to completion; return the memory table.

    ``state_partitions`` caps the stateful-operator partition count for
    this query (picked up from the session conf at query start and then
    pinned in the checkpoint). Stateful micro-batches pay a
    Python-worker/state-store round-trip per partition per batch, so the
    right count tracks rows-per-batch: small feeds want few, fuller
    partitions (fixed cost dominates), large feeds want more (real work
    dominates) — registered queries size it via ``queries._parts`` (r4
    sweep in its docstring). A production deployment with real key
    cardinality would pin O(cores) once for the checkpoint's lifetime.
    """
    spark = df.sparkSession
    require_no_data_batches(spark)
    name = "sss_mem_" + uuid.uuid4().hex[:12]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="sss_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        global LAST_QUERY_PROGRESS
        LAST_QUERY_PROGRESS = [dict(p) for p in (q.recentProgress or [])]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
