"""TPC-H completion suite (SURVEY.md §2.8, Q25–Q36): the twelve TPC-H
query shapes not yet covered by the Q-family, adapted to this corpus's
star schema (no partsupp table, no commit/receipt dates, no ship modes,
no phone numbers — each adaptation is documented per query and keeps the
ORIGINAL query's planner shape, which is the thing being pinned).

With these, all 22 canonical TPC-H shapes have a `sql_tpch_q*like` (or
`agg_hash_q1`) key: 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
16, 17, 18, 19, 20, 21, 22.

Every query is ANSI-portable text that runs verbatim on DuckDB as its own
oracle (the sqlsurface.py discipline). Money arithmetic uses the repo's
EXACT FIXED-POINT rule (see SURVEY §2 E17): `round(sum(double), 2)` is a
cross-engine half-tie hazard (Spark rounds through BigDecimal HALF_UP,
DuckDB rounds the float — this module's first draft hit two real
417321.125-style flips at sf0.01), so revenue terms are quantized PER ROW
to 1e-4 BIGINT units — every money column is 2-decimal and l_quantity is
integral (verified against the data), so the pre-round value sits within
a ulp of an integer and nearest-integer rounding cannot flip — summed
exactly as integers (sums < 2^53 at any test SF; at true 100 TB the sum
would approach BIGINT range and Spark's ANSI overflow error is the
correct loud failure), and divided back once at the end (one identical
IEEE division on both engines, bit-stable without any final round()).
DuckDB's sum(BIGINT) → HUGEINT is neutralized by the final division
producing DOUBLE on both engines.
"""

from __future__ import annotations

from .sqlsurface import _sql_query

# Per-row exact quantizers (see module docstring). rev4: extendedprice
# (2 dec) × (1 − discount) (2 dec) is an exact 4-decimal value.
_REV4 = "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"
# disc4: extendedprice × discount, same 4-decimal granularity.
_DISC4 = "CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)"

# Q6: the pure-scan revenue-forecast query — no join at all. The entire
# plan is one parquet scan with EVERY predicate pushed (date range,
# discount band, quantity cap) feeding a partial+final agg: the shape
# whose 100 TB cost is strictly I/O, which is why TPC-H uses it to
# benchmark scan efficiency. One row out.
sql_tpch_q6like = _sql_query(
    "sql_tpch_q6like",
    f"""
    SELECT sum({_DISC4}) / 1e4 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)

# Q8: national market share — an 8-table join tree (the widest in TPC-H)
# with a conditional share numerator. Supplier-nation revenue vs total
# revenue per order year; region/type filters prune customer and part
# before the fact join. The two sums are emitted instead of their
# quotient: the share divides two exact integers, which any reader can
# do, while emitting it would re-introduce a rounding step for display.
sql_tpch_q8like = _sql_query(
    "sql_tpch_q8like",
    f"""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
           sum(CASE WHEN n2.n_name = 'NATION_3' THEN {_REV4}
                    ELSE 0 END) / 1e4 AS nation_revenue,
           sum({_REV4}) / 1e4 AS total_revenue
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
      AND p_type = 'STANDARD'
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
    """,
)

# Q9: product-type profit by nation and year. This corpus has no
# partsupp, so supply cost is modeled as 60% of the part's retail price —
# the adaptation keeps Q9's defining shape: a LIKE-filtered part dimension
# joined into the fact, profit = revenue − cost, grouped by (nation,
# year). Cost term: 0.6 × retail (2 dec) × integral quantity is an exact
# 3-decimal value, so the 1e-4 grid holds for the whole profit term.
sql_tpch_q9like = _sql_query(
    "sql_tpch_q9like",
    """
    SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS o_year,
           sum(CAST(round((l_extendedprice * (1 - l_discount)
                           - 0.6 * p_retailprice * l_quantity) * 10000)
                    AS BIGINT)) / 1e4 AS sum_profit
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    """,
)

# Q10: returned-item reporting — top 20 customers by lost revenue in a
# quarter. ORDER BY the exact revenue with c_custkey as tiebreaker so the
# LIMIT boundary is a total order on cross-engine-stable values.
sql_tpch_q10like = _sql_query(
    "sql_tpch_q10like",
    f"""
    SELECT c_custkey, c_name,
           sum({_REV4}) / 1e4 AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)

# Q11: important-inventory value. partsupp's role is played by shipped
# lineitems valued at retail price (retail × integral quantity = exact
# 2-decimal → 1e-2 BIGINT units suffice); the defining shape survives: a
# CTE aggregated once per part, then filtered by a scalar subquery over
# the SAME CTE (fraction-of-total threshold) — Catalyst plans the CTE
# twice (or reuses the exchange), and the scalar side is a one-row
# broadcast. TPC-H's fraction-of-total threshold scales inversely with
# SF (0.0001/SF) precisely because a FIXED fraction selects nothing once
# the part count outgrows it (measured: 0.001 → 0 rows at sf0.1), so the
# scale-invariant spelling is relative to the AVERAGE part value —
# 2×avg selects the heavy tail at every SF. avg(exact ints) is one
# sum/count division on both engines; a val2 landing within a ulp of
# 2×avg is probability-zero (the subquery_scalar precedent).
sql_tpch_q11like = _sql_query(
    "sql_tpch_q11like",
    """
    WITH partvalue AS (
        SELECT l_partkey,
               sum(CAST(round(l_quantity * p_retailprice * 100)
                        AS BIGINT)) AS val2
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY l_partkey
    )
    SELECT l_partkey, val2 / 1e2 AS part_value
    FROM partvalue
    WHERE val2 > (SELECT 2 * avg(val2) FROM partvalue)
    ORDER BY part_value DESC, l_partkey
    """,
)

# Q13: customer order-count distribution — the outer-join histogram. The
# LEFT JOIN keeps zero-order customers (c_count = 0 via count of NULLs),
# the join-side filter (priority <> '5-LOW') plays Q13's comment-pattern
# exclusion, and the second aggregate histograms the first. Both counts
# are non-null BIGINT on both engines — no fetchdf float64 coercion.
sql_tpch_q13like = _sql_query(
    "sql_tpch_q13like",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)

# Q15: top supplier by quarterly revenue — a CTE referenced twice, once
# as the join input and once under max(). The winner is decided by EXACT
# integer equality on the fixed-point revenue (comparing raw IEEE sums
# for equality across engines could flip which supplier wins when two
# sums sit within a ulp). Ties keep every maximal supplier (no LIMIT).
sql_tpch_q15like = _sql_query(
    "sql_tpch_q15like",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum({_REV4}) AS total_rev4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev4 / 1e4 AS supplier_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev4 = (SELECT max(total_rev4) FROM revenue)
    ORDER BY s_suppkey
    """,
)

# Q17: small-quantity-order revenue — the correlated AVG subquery.
# Catalyst decorrelates to a per-partkey AVG aggregate joined back
# (RewriteCorrelatedScalarSubquery), so the plan is two hash aggregates,
# never a per-row re-scan. The threshold comparison is ulp-safe:
# l_quantity is integral-valued, so per-part sums (< 2^53) and the
# division by an exact small count are IEEE-identical on both engines.
# Output: exact cents summed as BIGINT, then two identical divisions.
sql_tpch_q17like = _sql_query(
    "sql_tpch_q17like",
    """
    SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT))
           / 1e2 / 7e0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)

# Q19: discounted-revenue under disjunctive brand/size/quantity bands —
# the OR-of-ANDs predicate that exercises CNF conversion and partial
# pushdown: the part-side conjuncts (brand, size) can be pushed below the
# join per-disjunct only as their union; the mixed-table residual stays
# in the join filter. One row out.
sql_tpch_q19like = _sql_query(
    "sql_tpch_q19like",
    f"""
    SELECT sum({_REV4}) / 1e4 AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)

# Q20: suppliers with excess shipments of a part family — nested IN
# subqueries with a HAVING threshold (partsupp's availqty role is played
# by the supplier's shipped-quantity total). Both IN subqueries are
# non-correlated with non-null keys → plain (broadcastable) semi joins,
# the 100 TB-safe form. sum(l_quantity) is integral-valued → exact
# threshold.
sql_tpch_q20like = _sql_query(
    "sql_tpch_q20like",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING sum(l_quantity) > 50
      )
    ORDER BY s_suppkey
    """,
)

# Q21: suppliers who kept orders waiting — the EXISTS + NOT-EXISTS pair
# over the same derived "late lineitem" set. "Late" = shipped more than
# 90 days after the order date (this corpus has no receipt/commit
# dates). The late set is hoisted into a CTE so BOTH existence tests are
# pure equi-correlations (l_orderkey, l_suppkey) — Spark decorrelates a
# non-equi outer reference (o_orderdate inside NOT EXISTS) poorly, and
# the hoisted form is also the scale-correct plan: one join to build
# `late`, then two [anti-]semi joins, instead of re-joining orders per
# existence probe.
sql_tpch_q21like = _sql_query(
    "sql_tpch_q21like",
    """
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL '90' DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)

# Q22: global sales opportunity — rich-but-inactive customers by country
# code. The country code is digits 7-8 of the customer number (substr
# offset 16 of 'Customer#000000042'; this corpus has no phone column —
# the leading digits are the constant '00' at every shipped SF, so the
# TRAILING digits are what vary and keep the grouping non-degenerate),
# and since every synthetic customer
# has at least one order, "inactive" = no orders since 2000-01-01; the
# shape is Q22's: a scalar AVG subquery threshold AND a NOT EXISTS anti
# join, grouped on a derived key. substr() spells identically in both
# engines. The AVG threshold compares raw doubles (the subquery_scalar
# precedent): acctbal is continuous, so a value within a ulp of the
# cross-engine avg is probability-zero, unlike the half-tie-prone
# round(sum()) this module bans.
sql_tpch_q22like = _sql_query(
    "sql_tpch_q22like",
    """
    SELECT substr(c_name, 16, 2) AS cntrycode,
           count(*) AS numcust,
           sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 1e2
               AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY substr(c_name, 16, 2)
    ORDER BY cntrycode
    """,
)
