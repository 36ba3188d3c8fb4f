"""Projection / filter / scalar-expression operators (SURVEY.md §2.2, P1–P8).

Everything here is a narrow (no-shuffle) transformation: Catalyst collapses
the projections into the scan, pushes every predicate to the parquet reader
(row-group + page-level skipping), and prunes unread columns — the plan for
each query is a single WholeStageCodegen span over a pruned scan, which is
exactly the shape that survives a 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_quantity + 1 AS qty_plus1,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # raw IEEE doubles: per-row arithmetic is bit-identical across
        # engines, while per-row round() disagrees at .xx5 boundaries.
        disc_price.alias("revenue"),
        (F.col("l_quantity") + 1).alias("qty_plus1"),
        (disc_price * (1 + F.col("l_tax"))).alias("charge"),
    )


@query(
    "filter_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_quantity BETWEEN 10 AND 20
      AND l_linestatus = 'F'
      AND NOT (l_discount > 0.05)
      AND l_shipdate IS NOT NULL
      AND (l_tax < 0.03 OR l_tax > 0.06)
    """,
)
def filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 20)
        & (F.col("l_linestatus") == "F")
        & ~(F.col("l_discount") > 0.05)
        & F.col("l_shipdate").isNotNull()
        & ((F.col("l_tax") < 0.03) | (F.col("l_tax") > 0.06))
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")


@query(
    "filter_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_or_pending,
           greatest(year(o_orderdate), 1996) AS year_floor,
           least(CAST(floor(o_totalprice) AS BIGINT), 200000) AS price_cap
    FROM orders
    """,
)
def filter_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias(
            "status_or_pending"
        ),
        F.greatest(F.year("o_orderdate"), F.lit(1996)).alias("year_floor"),
        # floor first: DuckDB CAST(double AS BIGINT) rounds, Spark truncates
        F.least(F.floor("o_totalprice").cast("bigint"), F.lit(200000)).alias("price_cap"),
    )


@query(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           concat(p_brand, '#', p_type) AS brand_type,
           upper(p_name) AS name_upper,
           substr(p_name, 1, 5) AS name_pfx,
           length(p_name) AS name_len,
           replace(p_type, ' ', '_') AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           (p_name LIKE '%a%') AS has_a
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.col("p_name").like("%a%").alias("has_a"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
           CAST(o_orderdate AS DATE) + 30 AS plus_30d,
           dayofweek(o_orderdate) AS dow,
           quarter(o_orderdate) AS q
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DuckDB dayofweek: Sunday=0; Spark: Sunday=1 → normalize to DuckDB's.
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus_30d"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.quarter("o_orderdate").alias("q"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_off,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil7,
           CAST(floor(l_quantity / 7) AS BIGINT) AS floor7,
           sqrt(l_extendedprice) AS root_price,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(log10(l_extendedprice), 6) AS log10_price,
           l_partkey % 7 AS key_mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           round(pow(1 + l_tax, 2), 6) AS tax_sq
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Output-type canonicalization (r1 driver FAIL): Spark ceil/floor return
    # BIGINT while DuckDB's return DOUBLE, and Spark signum is DOUBLE while
    # DuckDB sign is TINYINT — the driver hash distinguishes 7 from 7.0, so
    # both sides pin the same primitive (BIGINT / DOUBLE) explicitly.
    # abs/sub and sqrt are IEEE-exact per-row (correctly rounded), so they
    # go out raw; transcendentals (ln/log10/pow) are not guaranteed
    # last-ulp-identical across libms, so they keep the round-6 damping.
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_off"),
        F.ceil(F.col("l_quantity") / 7).cast("bigint").alias("ceil7"),
        F.floor(F.col("l_quantity") / 7).cast("bigint").alias("floor7"),
        F.sqrt("l_extendedprice").alias("root_price"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        (F.col("l_partkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
    )


@query(
    "scalar_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(floor(o_totalprice) AS DECIMAL(14,2)) AS DOUBLE) AS price_dec,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(o_orderkey AS INTEGER) AS key_int,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(o_totalprice > 150000 AS INTEGER) AS is_big
    FROM orders
    """,
)
def scalar_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # double→decimal goes through an explicit floor so both engines make the
    # same tie decisions; double→string is deliberately absent (formats
    # differ irreconcilably between engines). The decimal cast itself stays
    # in the plan, but the H-checked OUTPUT is re-cast to DOUBLE: the driver
    # hash distinguishes Decimal('112946.00') from 112946.0 (r1 FAIL), so
    # no DecimalType ever leaves a checked projection.
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.floor("o_totalprice").cast("decimal(14,2)").cast("double").alias("price_dec"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_orderkey").cast("int").alias("key_int"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        (F.col("o_totalprice") > 150000).cast("int").alias("is_big"),
    )


@query(
    "scalar_hash",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
    FROM documents
    """,
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@query(
    "unpivot_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, value
    FROM (UNPIVOT lineitem
          ON l_quantity, l_extendedprice, l_discount
          INTO NAME metric VALUE value)
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (UNPIVOT / melt): three measure columns become
    (metric, value) rows — the inverse of agg_conditional_pivot's pivot.
    A narrow per-row expansion (each input row yields 3 output rows in
    the scan pipeline); no shuffle at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "value",
    )


@query(
    "scalar_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber = 1 THEN NULL
                ELSE round(l_extendedprice / (l_linenumber - 1), 4)
           END AS safe_div,
           CAST(NULL AS BIGINT) AS overflow_add
    FROM lineitem
    """,
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic (Spark `try_*` family): this engine runs
    under default ANSI mode, where bare division by zero and integer
    overflow ERROR the query — `try_divide` / `try_add` are the
    NULL-on-failure escape hatch a migrating user must reach for.
    `safe_div` divides by (linenumber-1), NULL exactly where the divisor
    is zero; `overflow_add` is BIGINT max + 1 — Catalyst constant-folds
    the TryEval to a plan-time `null AS overflow_add` (verified in the
    physical plan), so the overflow semantics are exercised at zero
    per-row cost. That folding is the SCALE lesson this key carries: a
    row-dependent try_add that overflows on every row measured ~17 µs of
    JVM throw/catch PER ROW (10 s for 600 k rows at sf0.1 — a first
    draft did exactly that); try_ guards belong on rare failure paths,
    never on hot always-failing expressions. DuckDB has no try_ family,
    so the oracle expresses the same semantics with CASE/NULL.
    NULL-bearing columns are fetchdf-stable here: safe_div is float64 on
    both engines, and overflow_add is ALL-NULL (NaN ≡ NULL under the
    driver's canonicalizer; a MIXED huge-int column would coerce to
    float64 and hash-mismatch Spark's int64)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide("l_extendedprice", F.col("l_linenumber") - 1), 4
        ).alias("safe_div"),
        F.try_add(F.lit(9223372036854775807), F.lit(1)).alias("overflow_add"),
    )


@query(
    "scalar_collation",
    oracle="""
    WITH variants AS (
        SELECT s_nationkey, upper(s_name) AS name FROM supplier
        UNION ALL SELECT s_nationkey, lower(s_name) FROM supplier
        UNION ALL SELECT s_nationkey, s_name FROM supplier
    )
    SELECT s_nationkey,
           count(DISTINCT lower(name)) AS n_ci,
           count(DISTINCT name) AS n_cs
    FROM variants
    GROUP BY s_nationkey
    """,
)
def scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (P11, Spark 4): case-insensitive DISTINCT via
    the ``UTF8_LCASE`` collation — the engine-level answer to the
    `lower()` wrapped around every comparison in a migrating user's
    queries. A deterministic mixed-case variant set (upper ∪ lower ∪
    original of s_name) is counted distinct twice: under UTF8_LCASE
    (`F.collate` — the three case variants of a name hash/compare equal,
    so the count collapses to unique names) and under the default binary
    collation (all variants distinct). DuckDB spells the same semantics
    as count(DISTINCT lower(name)) — the hash match proves Spark's
    collation-aware grouping equals the lower() equivalence classes.
    Scale: collation-aware distinct is the same two-phase distinct
    aggregate as any other — the collated key shuffles by its collation
    hash; no row blowup beyond the 3× variant construction."""
    s = load_table(spark, sf_dir, "supplier")
    variants = (
        s.select("s_nationkey", F.upper("s_name").alias("name"))
        .unionByName(s.select("s_nationkey", F.lower("s_name").alias("name")))
        .unionByName(s.select("s_nationkey", F.col("s_name").alias("name")))
    )
    return variants.groupBy("s_nationkey").agg(
        F.count_distinct(F.collate(F.col("name"), "UTF8_LCASE")).alias("n_ci"),
        F.count_distinct(F.col("name")).alias("n_cs"),
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT l_orderkey,
           CAST(l_orderkey & 255 AS BIGINT) AS band,
           CAST(l_orderkey | 4096 AS BIGINT) AS bor,
           CAST(xor(l_orderkey, l_linenumber) AS BIGINT) AS bxor,
           CAST(l_linenumber << 3 AS BIGINT) AS shl,
           CAST(l_orderkey >> 2 AS BIGINT) AS shr,
           CAST(bit_count(l_orderkey) AS BIGINT) AS popcnt
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression surface (P12): AND/OR/XOR, shifts, popcount —
    the hash-bucketing / bitmap / flag-word toolkit (every salting,
    banding, and bloom-filter trick ultimately lands on these). Dialect
    trap pinned by the oracle: DuckDB's ``^`` is POWER, its xor is the
    ``xor()`` function, while Spark's ``^`` is xor — a silently-wrong
    translation if copied textually. Everything CAST BIGINT on both
    sides (bit_count returns INT in Spark, and mixed-width bitwise
    results differ in type across engines even when values agree).
    Narrow row-local expressions in codegen; the modulo filter keeps
    the H-checked payload small without losing key-domain coverage."""
    li = load_table(spark, sf_dir, "lineitem")
    k, ln = F.col("l_orderkey"), F.col("l_linenumber")
    return li.filter(k % 97 == 0).select(
        "l_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("band"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("bor"),
        k.bitwiseXOR(ln).cast("bigint").alias("bxor"),
        F.shiftleft(ln, 3).cast("bigint").alias("shl"),
        F.shiftright(k, 2).cast("bigint").alias("shr"),
        F.bit_count(k).cast("bigint").alias("popcnt"),
    )


@query(
    "scalar_mask",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', 'n', 'g') AS masked_default,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               c_name, '[^A-Za-z0-9]', '-', 'g'), '[A-Z]', 'X', 'g'),
               '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked_full
    FROM customer
    """,
)
def scalar_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``F.mask`` (P13) — the built-in data-masking function (PII
    redaction at the expression level, the engine-native sibling of
    T4's regex lexicon scrub): upper→X, lower→x, digit→n, with the
    default keeping punctuation and a full variant masking it to '-'.
    The oracle replays the class mapping as chained global
    regexp_replace (other-chars FIRST in the full variant so introduced
    '-' isn't re-matched). ASCII-only input by construction (c_name is
    'Customer#...'): mask classifies via Unicode character classes
    while the [A-Z] oracle is ASCII — equivalent only on ASCII data,
    which is exactly what the pinned column provides. Narrow row-local
    expression in codegen; at 100 TB masking rides the scan for free."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_default"),
        F.mask(
            "c_name", F.lit("X"), F.lit("x"), F.lit("n"), F.lit("-")
        ).alias("masked_full"),
    )


@query(
    "frame_transpose",
    oracle="""
    WITH agg AS (
        SELECT l_returnflag AS f,
               CAST(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                         AS BIGINT) AS DOUBLE) AS sum_qty_c,
               CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                         AS BIGINT) AS DOUBLE) AS sum_price_c,
               CAST(count(*) AS DOUBLE) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT 'sum_qty_c' AS key,
           max(CASE WHEN f = 'A' THEN sum_qty_c END) AS "A",
           max(CASE WHEN f = 'N' THEN sum_qty_c END) AS "N",
           max(CASE WHEN f = 'R' THEN sum_qty_c END) AS "R"
    FROM agg
    UNION ALL
    SELECT 'sum_price_c', max(CASE WHEN f = 'A' THEN sum_price_c END),
           max(CASE WHEN f = 'N' THEN sum_price_c END),
           max(CASE WHEN f = 'R' THEN sum_price_c END)
    FROM agg
    UNION ALL
    SELECT 'n_rows', max(CASE WHEN f = 'A' THEN n_rows END),
           max(CASE WHEN f = 'N' THEN n_rows END),
           max(CASE WHEN f = 'R' THEN n_rows END)
    FROM agg
    """,
)
def frame_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose()`` (P16, new in Spark 4.0): rows become
    columns — the metrics-as-rows pivot every reporting layer wants
    after a wide aggregate. The first column's VALUES become the new
    column names (sorted: A, N, R — the determinism the H-check rides),
    the remaining column NAMES become the ``key`` column, and all
    transposed values must share a least-common type, so the metrics
    are cast to DOUBLE before the flip (exact-cents integers < 2^53 —
    lossless). Oracle replays the transpose as three UNION ALL
    conditional-max rows.

    Scale: transpose collects the frame to build the new schema — by
    contract a POST-aggregate operation on dimension-sized results (3
    groups here), never on a fact table; the aggregate below it is the
    usual one-shuffle hash agg."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
        .cast("bigint").cast("double").alias("sum_qty_c"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint").cast("double").alias("sum_price_c"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return agg.transpose()


@query(
    "scalar_interval",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS d,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
               AS plus_3m,
           -- integer day-add, NOT "+ INTERVAL 90 DAY": DuckDB interval
           -- equality normalizes 1 month = 30 days, so INTERVAL 3 MONTH
           -- and INTERVAL 90 DAY compare EQUAL and constant-dedup folds
           -- the two literals into whichever appears first (measured
           -- 1.0.0: both columns came back +3 months)
           CAST(o_orderdate AS DATE) + 90 AS plus_90d,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
               AS q_start,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           CAST(datediff('day', CAST(o_orderdate AS DATE),
                         CAST('1998-12-31' AS DATE)) AS BIGINT) AS days_to_eoy
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
)
def scalar_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/INTERVAL arithmetic surface (P17): month addition (BOTH
    engines clamp end-of-month — 2021-01-31 + 1 month = 2021-02-28,
    measured), day addition, last_day, quarter truncation/extraction,
    and day difference to a fixed horizon. All calendar ops on DATE
    (the timestamp[ms] o_orderdate cast down) so no tz/precision can
    skew; plus_3m lands as DATE in Spark (date + interval month) and
    DuckDB (clamped date add) alike.

    Scale: narrow row-local expressions riding the scan in codegen; the
    key-mod filter is pushed to parquet."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        d.alias("d"),
        F.add_months(d, 3).alias("plus_3m"),
        F.date_add(d, 90).alias("plus_90d"),
        F.last_day(d).alias("month_end"),
        F.trunc(d, "quarter").alias("q_start"),
        F.quarter(d).cast("bigint").alias("q"),
        F.datediff(F.lit("1998-12-31").cast("date"), d)
        .cast("bigint")
        .alias("days_to_eoy"),
    )


@query(
    "scalar_string_multi",
    oracle="""
    SELECT c_custkey,
           split_part(c_name, '#', 2) AS cust_num,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           reverse(c_mktsegment) AS seg_rev,
           repeat('-', CAST(c_custkey % 4 AS INT)) AS dashes,
           left(c_name, 8) AS name8
    FROM customer
    """,
)
def scalar_string_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface beyond P4 (P18): `split_part` (field
    extraction by delimiter — the CSV-ish parsing everyone reaches for
    before regex), `translate` (character mapping), `lpad` (fixed-width
    key rendering), `reverse`, `repeat`, `left` — each verified
    byte-identical against DuckDB's same-named function.

    Scale: narrow row-local codegen expressions riding the scan."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_num"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_tr"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat(F.lit("-"), (F.col("c_custkey") % 4).cast("int")).alias("dashes"),
        F.substring("c_name", 1, 8).alias("name8"),
    )


@query(
    "scalar_str_to_map",
    oracle="""
    SELECT c_custkey,
           c_mktsegment AS seg_back,
           CAST(c_nationkey AS BIGINT) AS nat_back,
           CAST(2 AS BIGINT) AS n_keys
    FROM customer
    """,
)
def scalar_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`str_to_map` (P19) — parsing `k:v,k:v` config/tag strings into a
    map and reading it back, the lightweight cousin of JSON extraction
    every log pipeline hits. The input string is BUILT from the row's
    own columns, and the oracle states the expected lookups relationally
    from those same columns (the text_url_filter device) — so the hash
    pins the parse round-trip without the oracle ever splitting the
    string.

    Scale: narrow row-local codegen expressions riding the scan."""
    c = load_table(spark, sf_dir, "customer")
    tag_str = F.concat(
        F.lit("seg:"), F.col("c_mktsegment"),
        F.lit(",nat:"), F.col("c_nationkey").cast("string"),
    )
    m = F.str_to_map(tag_str, F.lit(","), F.lit(":"))
    return c.select(
        "c_custkey",
        m.getItem("seg").alias("seg_back"),
        m.getItem("nat").cast("bigint").alias("nat_back"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
    )


@query(
    "scalar_regexp",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT)
               AS n_runs,
           regexp_extract(text, '([a-z]{6,})', 1) AS first_long,
           regexp_replace(substr(text, 1, 40), '[aeiou]', '*', 'g')
               AS starred,
           regexp_matches(text, 'data|model') AS flagged
    FROM documents
    """,
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-expression scalar family (P20): extract-all run counting,
    first-group extraction, GLOBAL replacement, and boolean matching
    over free text — the comment-mining surface. Cross-engine care:
    Spark regexp_replace is global BY DEFAULT while DuckDB replaces the
    first match only (the oracle passes the 'g' option); both engines
    return '' (not NULL) for a no-match extract (measured); the
    patterns stay inside the character-class/alternation subset where
    Java regex and RE2 agree — lookarounds and lazy quantifiers are
    exactly where the dialects fork, and don't belong in a
    cross-engine contract. All four expressions are row-local codegen
    over the scan: zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        # idx 0 = whole match (Spark defaults to GROUP 1 and throws on a
        # group-less pattern; DuckDB's default is already the full match)
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), F.lit(0)))
        .cast("bigint")
        .alias("n_runs"),
        F.regexp_extract("text", "([a-z]{6,})", 1).alias("first_long"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "*").alias(
            "starred"
        ),
        F.col("text").rlike("data|model").alias("flagged"),
    )
