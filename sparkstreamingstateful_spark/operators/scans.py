"""Source/sink operators — batch side (SURVEY.md §2.1, S1/S2/S6).

Streaming sources/sinks (S3–S5) live in ``..streaming``.
"""

from __future__ import annotations

import functools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import TABLE_NAMES, load_table
from ..registry import query

_S1_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS tbl, count(*) AS n FROM {t}" for t in TABLE_NAMES
)


@query("scan_parquet", oracle=_S1_ORACLE)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan all ten tables; one (table, row-count) row each."""
    counts = [
        load_table(spark, sf_dir, t).agg(
            F.lit(t).alias("tbl"), F.count(F.lit(1)).alias("n")
        )
        for t in TABLE_NAMES
    ]
    return functools.reduce(DataFrame.unionByName, counts)


@query(
    "scan_projection_pushdown",
    oracle="""
    SELECT l_orderkey, l_extendedprice AS price
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-of-11-column projection — tests assert the scan's ReadSchema shrank
    to exactly these columns (column pruning, SURVEY §4.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey", F.col("l_extendedprice").alias("price")
    )


@query(
    "write_roundtrip",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS sum_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write customer to parquet, re-read, aggregate — the H-check proves the
    write→read cycle is lossless (CSV/JSON roundtrips are covered in
    tests/test_scans.py; parquet is the only lossless-for-doubles format)."""
    c = load_table(spark, sf_dir, "customer")
    out = os.path.join(tempfile.mkdtemp(prefix="sss_roundtrip_"), "customer_pq")
    c.write.mode("overwrite").parquet(out)
    back = spark.read.schema(c.schema).parquet(out)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )
