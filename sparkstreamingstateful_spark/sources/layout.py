"""Storage-layout primitives for the 100 TB posture (SURVEY.md §7.2.6).

* **Date partitioning** (``write_partitioned_by_date``): facts land as
  ``.../year=Y/month=M/`` directories; a filter on the partition columns
  prunes whole directories at planning time (``PartitionFilters`` in the
  scan, asserted in tests/test_layout.py) — at 100 TB this is the
  difference between scanning a day and scanning a decade.

* **Bucketing** (``write_bucketed``): both sides of a recurring fact⨝fact
  join stored pre-hashed into the same bucket count on the join key — the
  sort-merge join then runs with ZERO Exchange (asserted in tests),
  amortizing the shuffle across every future join on that key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_by_date(
    df: DataFrame, path: str, ts_col: str, *, mode: str = "overwrite"
) -> None:
    """Write parquet partitioned by (year, month) of ``ts_col``."""
    (
        df.withColumn("year", F.year(ts_col))
        .withColumn("month", F.month(ts_col))
        .write.mode(mode)
        .partitionBy("year", "month")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    *,
    n_buckets: int = 8,
) -> None:
    """Save as a bucketed managed table (bucket pruning + shuffle-free
    joins for every query that joins/aggregates on ``bucket_col``)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )
