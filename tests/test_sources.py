"""Network streaming sources (S3/S4): a REAL loopback socket feed run
end-to-end through a streaming aggregation, the rate source, and the
Kafka option contract (connector package absent here — the option
assembly is the testable surface)."""

from __future__ import annotations

import json
import socket
import socketserver
import threading
import time

import pytest
from pyspark.sql import functions as F

from sparkstreamingstateful_spark.sources import streams


class _LineFeeder(socketserver.ThreadingTCPServer):
    allow_reuse_address = True


def _serve_lines(lines: list[str]):
    """One-shot TCP server: feeds ``lines`` to the first client, then holds
    the connection open (Spark's socket source reads until query stop)."""
    done = threading.Event()

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            payload = ("\n".join(lines) + "\n").encode()
            self.request.sendall(payload)
            done.wait(timeout=30)

    srv = _LineFeeder(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, port, done


def test_socket_source_end_to_end(spark):
    events = [
        {"event_id": i, "ts": f"2024-01-01 00:{i:02d}:00", "user_id": i % 3,
         "event_type": "click", "value": float(i)}
        for i in range(20)
    ]
    srv, port, done = _serve_lines(streams.event_json_lines(events))
    try:
        parsed = streams.read_stream_socket_events(spark, "127.0.0.1", port)
        agg = parsed.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("socket_agg")
            .outputMode("complete")
            .start()
        )
        try:
            deadline = time.time() + 30
            rows = []
            while time.time() < deadline:
                rows = spark.table("socket_agg").collect()
                if sum(r["n"] for r in rows) >= 20:
                    break
                time.sleep(0.5)
            got = {r["user_id"]: (r["n"], r["sum_v"]) for r in rows}
            # 20 events over users 0..2: user0 7 (0,3,..18), others split
            assert sum(n for n, _ in got.values()) == 20
            assert got[0][0] == 7 and got[1][0] == 7 and got[2][0] == 6
            assert got[0][1] == sum(float(i) for i in range(20) if i % 3 == 0)
        finally:
            q.stop()
    finally:
        done.set()
        srv.shutdown()
        srv.server_close()


def test_rate_source(spark):
    df = streams.read_stream_rate(spark, rows_per_second=50, num_partitions=2)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["timestamp", "value"]
    q = (
        df.writeStream.format("memory")
        .queryName("rate_probe")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 20
        n = 0
        while time.time() < deadline:
            n = spark.table("rate_probe").count()
            if n > 0:
                break
            time.sleep(0.5)
        assert n > 0
    finally:
        q.stop()


def test_kafka_option_contract():
    opts = streams.kafka_options("broker1:9092,broker2:9092", "events")
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "events"
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "true"
    assert opts["maxOffsetsPerTrigger"] == "100000"
    # bounded-batch knob is optional
    assert "maxOffsetsPerTrigger" not in streams.kafka_options(
        "b:9092", "t", max_offsets_per_trigger=None
    )


def test_event_json_lines_roundtrip():
    rows = [{"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 2,
             "event_type": "click", "value": 0.5}]
    [line] = streams.event_json_lines(rows)
    assert json.loads(line) == rows[0]
