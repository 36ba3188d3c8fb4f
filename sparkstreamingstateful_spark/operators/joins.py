"""Join operators (SURVEY.md §2.3, J1–J9).

Join-strategy posture for 100 TB:

* dims (region 5 / nation 25 / customer / supplier / part) are broadcast —
  an explicit ``F.broadcast`` hint where the dim is guaranteed small, else
  Spark's threshold + AQE runtime conversion decide;
* fact⨝fact (orders⨝lineitem) shuffles on the join key — both facts would
  be bucketed by orderkey in a real lake so this becomes a zero-shuffle
  sort-merge; AQE skew-join splits oversized partitions at runtime;
* the non-equi J7 keeps its equi component so it plans as a hash join with
  a range residual, never a nested-loop over the fact table;
* the as-of join (J8) is the union + running-``last`` rewrite — one shuffle
  by user, no per-row probe, state bounded by one row per key — the same
  shape Structured Streaming uses for stream as-of enrichment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_mktsegment", F.col("o_totalprice").alias("total")
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT c_custkey, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


@query(
    "join_left",
    oracle="""
    SELECT c_custkey, CAST(o_orderkey AS DOUBLE) AS o_orderkey
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join oracle contract (same as the stream-stream outer joins):
    the NULLABLE side goes out as DOUBLE on both engines. The driver
    fetches the oracle through pandas, where a NULL-bearing BIGINT column
    coerces to float64 — and whether NULLs exist is DATA-dependent
    (sf0.01 has no customer without orders; sf0.1 does — caught by the
    r6 sf0.1 driver-sim as "101401" vs "101401.0" hash mismatches)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", F.col("o_orderkey").cast("double").alias("o_orderkey")
    )


@query(
    "join_right",
    oracle="""
    SELECT c_custkey, CAST(o_orderkey AS DOUBLE) AS o_orderkey
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nullable side → DOUBLE both engines; see join_left's docstring
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", F.col("o_orderkey").cast("double").alias("o_orderkey")
    )


@query(
    "join_full",
    oracle="""
    SELECT CAST(c_custkey AS DOUBLE) AS c_custkey,
           CAST(o_orderkey AS DOUBLE) AS o_orderkey
    FROM customer FULL JOIN orders ON o_custkey = c_custkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BOTH sides nullable in full outer → DOUBLE both engines (join_left)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        F.col("c_custkey").cast("double").alias("c_custkey"),
        F.col("o_orderkey").cast("double").alias("o_orderkey"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_theta_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: equi key kept in the condition so Catalyst plans a
    hash/sort-merge join with the range as a cheap residual filter, not a
    nested loop (SURVEY §2.3 J7)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return li.join(o, cond).select(
        "l_orderkey", "l_linenumber", F.col("l_shipdate").cast("date").alias("ship_date")
    )


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id AS purchase_id,
           -- DOUBLE on both sides: click_id is NULL for unmatched
           -- purchases, and pandas (the driver's fetchdf) promotes a
           -- nullable int64 column to float64 — a BIGINT column would
           -- hash as int or float depending on whether the data happens
           -- to contain a null (it does at sf0.001, not at sf0.01)
           CAST(c.event_id AS DOUBLE) AS click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent prior (or
    simultaneous) click.

    Implemented as the scalable union + running-``last(ignorenulls)``
    rewrite rather than join-then-rank: one shuffle on ``user_id``, a single
    ordered pass per key, and no candidate-pair blow-up — the same
    incremental shape a streaming as-of enrichment uses. Ties (click.ts ==
    purchase.ts) sort clicks first, matching DuckDB ASOF's <= bound.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"),
        F.lit(0).alias("kind"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("kind"),
    )
    unioned = clicks.select(
        "user_id", "ts", "kind", "click_id", F.lit(None).cast("long").alias("purchase_id")
    ).unionByName(
        purchases.select(
            "user_id", "ts", "kind", F.lit(None).cast("long").alias("click_id"), "purchase_id"
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("last_click", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "purchase_id",
            # double: see oracle comment — nullable ints are not
            # fetchdf-stable, so the nullable side goes out as float64
            F.col("last_click").cast("double").alias("click_id"),
        )
    )


@query(
    "join_multikey",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber, a.l_returnflag,
           b.l_extendedprice AS price
    FROM lineitem a
    JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                   AND a.l_linenumber = b.l_linenumber
    """,
)
def join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.alias("a")
    b = li.select("l_orderkey", "l_linenumber", "l_extendedprice").alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") == F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("l_linenumber"),
        F.col("a.l_returnflag").alias("l_returnflag"),
        F.col("b.l_extendedprice").alias("price"),
    )
