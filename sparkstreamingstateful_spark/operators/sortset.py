"""Sort / limit / set operators (SURVEY.md §2.6, O1–O5).

Scale notes: O2's orderBy+limit plans as ``TakeOrderedAndProject`` — each
partition keeps its local top-k and only k rows per partition reach the
driver, so a global top-k over 100 TB never materializes a global sort. O1's
global row_number is the one deliberately non-scalable shape here (single
ordered pass); it exists to prove ORDER BY semantics, and its docstring is
the warning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, status_or_null, o_totalprice,
           row_number() OVER (ORDER BY status_or_null ASC NULLS LAST,
                              o_totalprice DESC, o_orderkey) AS rn
    FROM (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null,
                 o_totalprice
          FROM orders WHERE o_orderkey % 10 = 0)
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with NULLS LAST. The rank is materialized into the
    rows (order-insensitive hash can't see row order, §5.3). Global window =
    single-partition pass — test-only shape, never used in scale paths."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    base = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        "o_totalprice",
    )
    order = [
        F.col("status_or_null").asc_nulls_last(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    ]
    return base.orderBy(*order).withColumn(
        "rn", F.row_number().over(Window.orderBy(*order))
    )


@query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (per-partition local top-k, no
    global sort) — the scalable top-k shape."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 150000
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderstatus")
    b = o.filter(F.col("o_totalprice") > 150000).select("o_orderkey", "o_orderstatus")
    return a.unionByName(b)  # bag semantics; overlap rows appear twice


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 150000
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderstatus")
    b = o.filter(F.col("o_totalprice") > 150000).select("o_orderkey", "o_orderstatus")
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.subtract(y96)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference: multiplicities subtract (a customer with 3 orders in
    1995 and 1 in 1996 keeps 2 rows)."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.exceptAll(y96)


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersectAll(y96)


@query("sample_seeded")  # rows-only: RNG streams differ across engines
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample — deterministic within Spark (asserted in
    tests), but no cross-engine oracle exists for sampling."""
    o = load_table(spark, sf_dir, "orders")
    return o.sample(fraction=0.1, seed=42).select("o_orderkey", "o_totalprice")


@query(
    "set_union_by_name_missing",
    oracle="""
    SELECT o_orderkey AS k, o_orderstatus AS status,
           CAST(o_totalprice AS DOUBLE) AS price, NULL AS segment
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL BY NAME
    SELECT c_custkey AS k, c_mktsegment AS segment
    FROM customer WHERE c_acctbal < 0
    """,
)
def set_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union (O6): `unionByName(allowMissingColumns=
    True)` — the append path when a new ingest batch carries a column
    subset/superset of the table (each side's missing columns
    null-fill), mirrored by DuckDB's `UNION ALL BY NAME`. The nullable
    DOUBLE cast on price follows the fetchdf rule (one side is all-NULL
    for it); segment stays string (NULL literal types as VARCHAR under
    BY NAME alignment on the oracle side, string here)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    b = c.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("segment"),
    )
    return a.unionByName(b, allowMissingColumns=True)
