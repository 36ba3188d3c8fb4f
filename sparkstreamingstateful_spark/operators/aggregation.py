"""Aggregation operators (SURVEY.md §2.4, rows A1–A9).

All aggregates are hash aggregations: Catalyst plans a two-phase
partial+final ``HashAggregateExec``, so the shuffle moves only one partial
row per (partition × group) — at 100 TB with 6 groups (A1) the shuffle is
measured in kilobytes regardless of input size. Float aggregates are rounded
on both sides (§5.3) because summation order is engine-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "agg_hash_q1",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        round(sum(l_quantity), 2)                                        AS sum_qty,
        round(sum(l_extendedprice), 2)                                   AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
        round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
        round(avg(l_quantity), 4)                                        AS avg_qty,
        round(avg(l_extendedprice), 4)                                   AS avg_price,
        round(avg(l_discount), 4)                                        AS avg_disc,
        count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_hash_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship TPC-H-Q1-shape aggregation over lineitem (6 groups).

    Scale notes: filter + all 7 referenced columns push to the parquet scan
    (PushedFilters / ReadSchema); partial aggregation reduces each input
    partition to ≤6 rows before the shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
