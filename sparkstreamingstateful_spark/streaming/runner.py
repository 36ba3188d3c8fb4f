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


def run_stream(df: DataFrame, *, output_mode: str = "append") -> DataFrame:
    """Run a streaming DataFrame to completion; return the memory table."""
    name = "sss_mem_" + uuid.uuid4().hex[:12]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sss_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)
