"""Network streaming sources (SURVEY.md §2.1 S3/S4): socket, rate, and
Kafka readers.

* ``read_stream_socket`` / ``read_stream_rate`` are built into Spark and
  fully exercised here (tests/test_sources.py runs a real loopback socket
  feed end-to-end through a streaming query).
* ``kafka_stream_reader`` assembles the canonical Kafka source config. The
  kafka connector package and brokers are unavailable in this sandbox, so
  ``.load()`` is left to the caller and the option assembly is what tests
  pin — the production call path is one ``.load()`` away.

Scale notes: socket is a single-receiver debug source (no partitioning,
no replay — never a production ingest). Kafka is the real unbounded
source: one Spark input partition per topic partition, offsets tracked in
the checkpoint for exactly-once; ``maxOffsetsPerTrigger`` bounds
micro-batch size the way ``maxFilesPerTrigger`` does for the file feeder.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import configure


def read_stream_socket(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Line stream from a TCP socket: one ``value: string`` column."""
    configure(spark)
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def read_stream_socket_events(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Socket lines parsed as JSON event records (event_id, ts, user_id,
    event_type, value) — the network twin of the parquet event feeder."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    raw = read_stream_socket(spark, host, port)
    return raw.select(F.from_json("value", schema).alias("e")).select(
        "e.event_id",
        F.to_timestamp("e.ts").alias("ts"),
        "e.user_id",
        "e.event_type",
        "e.value",
    )


def read_stream_rate(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int = 4
) -> DataFrame:
    """Rate source (synthetic load): ``timestamp, value`` at a fixed rate."""
    configure(spark)
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .option("numPartitions", str(num_partitions))
        .load()
    )


def kafka_options(
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100_000,
) -> dict[str, str]:
    """The canonical Kafka source option set (what tests pin)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # fail loudly on truncated topics instead of silently skipping data
        "failOnDataLoss": "true",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_stream_reader(
    spark: SparkSession, bootstrap_servers: str, topic: str, **kw
):
    """Configured (un-loaded) Kafka reader; caller invokes ``.load()`` and
    parses ``value`` with ``from_json`` — see read_stream_socket_events
    for the parse pattern. Requires the spark-sql-kafka connector package
    on the classpath (absent in this sandbox)."""
    configure(spark)
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(bootstrap_servers, topic, **kw).items():
        reader = reader.option(k, v)
    return reader


def event_json_lines(rows) -> list[str]:
    """Serialize event records (dicts or pyspark Rows) to the JSON-lines
    wire format the socket twin parses (test + demo helper). Plain tuples
    carry no field names and are rejected explicitly."""
    out = []
    for r in rows:
        if isinstance(r, dict):
            d = r
        elif hasattr(r, "asDict"):  # pyspark Row
            d = r.asDict()
        else:
            raise TypeError(
                f"event_json_lines needs dicts or Rows (field names), got "
                f"{type(r).__name__}"
            )
        out.append(json.dumps(d, default=str))
    return out
