"""Streaming-specific tests beyond the oracle gate (SURVEY.md §5.2.2-3):
checkpoint recovery (ST11), watermark late-drop (ST10), rate source (S4),
foreachBatch parquet sink (S5), and sink output-mode coverage."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from sparkstreamingstateful_spark import registry
from sparkstreamingstateful_spark.catalog import load_table, read_stream_events
from sparkstreamingstateful_spark.streaming.feeder import chunked_events_dir

from .conftest import SF_UNIT

QUERIES, _ = registry.collect()


def test_late_data_dropped(spark):
    """ST10: a chunk held back past the watermark loses its rows."""
    late = QUERIES["stream_window_late_drop"](spark, SF_UNIT)
    n_late = late.agg(F.sum("n")).collect()[0][0]
    n_all = load_table(spark, SF_UNIT, "events").count()
    assert n_late < n_all, "late chunk should have been dropped"
    assert n_late >= n_all * 0.5, "only the late chunk should be missing"


def test_rate_source(spark):
    """S4: the rate source produces schema'd rows under availableNow."""
    import uuid

    rate = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
    name = "rate_" + uuid.uuid4().hex[:8]
    q = (
        rate.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    df = spark.table(name)
    assert set(df.columns) == {"timestamp", "value"}


def test_foreachbatch_parquet_sink_and_recovery(spark):
    """S5 + ST11: foreachBatch→parquet with checkpointing; kill after the
    first batches, restart from the same checkpoint, assert exactly-once
    (no loss, no duplication) in the sink."""
    feed = chunked_events_dir(SF_UNIT, n_chunks=4, sentinels=False)
    ckpt = tempfile.mkdtemp(prefix="sss_recov_ckpt_")
    out = tempfile.mkdtemp(prefix="sss_recov_out_")

    def write_batch(df, batch_id):
        df.write.mode("append").parquet(os.path.join(out, f"b{batch_id}"))

    def start():
        ev = read_stream_events(spark, feed)
        return (
            ev.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # phase 1: stop mid-stream after ≥1 batch commits
    import time

    q = start()
    commits = os.path.join(ckpt, "commits")
    deadline = time.time() + 120
    while time.time() < deadline:
        if os.path.isdir(commits) and any(
            not f.startswith(".") for f in os.listdir(commits)
        ):
            break
        time.sleep(0.05)
    q.stop()
    try:
        q.awaitTermination()
    except Exception:
        pass  # a query killed mid-batch may surface the interrupt

    # phase 2: restart from the same checkpoint → finish the feed
    q = start()
    q.awaitTermination()

    sink = spark.read.parquet(os.path.join(out, "b*"))
    expected = load_table(spark, SF_UNIT, "events")
    assert sink.count() == expected.count()  # no loss, no duplication
    assert sink.select("event_id").distinct().count() == expected.count()


def test_console_sink(spark):
    """S5: console sink runs (smoke)."""
    feed = chunked_events_dir(SF_UNIT, n_chunks=2, sentinels=False)
    ev = read_stream_events(spark, feed)
    q = (
        ev.groupBy("event_type")
        .count()
        .writeStream.format("console")
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
