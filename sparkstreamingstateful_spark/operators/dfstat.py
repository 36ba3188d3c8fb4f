"""``df.stat`` surface (SURVEY.md §2.4 extension, ST-A..ST-D): the
DataFrameStatFunctions namespace — crosstab, stratified sampleBy,
approxQuantile, freqItems. These are the profiling/sampling helpers an
analyst reaches for before writing a single query, so they are
first-class H-checked keys, each re-expressed under this repo's
oracle discipline:

* ``stat_crosstab`` IS the real API (``df.stat.crosstab``) — its output
  is exact counts, directly hashable against a conditional-aggregate
  oracle.
* ``stat_sample_by`` H-checks sampleBy SEMANTICS (per-stratum fraction
  map) through the repo's deterministic md5-bucket device (seed-free,
  layout-free, engine-portable — the corpus_sample_stratified
  precedent); the RNG-seeded ``df.stat.sampleBy`` API itself is
  test-pinned (tests/test_dfstat.py) because Spark's seeded sample is
  partition-layout-dependent and can never hash-match another engine.
* ``stat_approx_quantile`` wraps the driver-returning
  ``df.stat.approxQuantile`` API (it RETURNS a Python list by contract
  — like ``stat_cov_corr``'s cov/corr, the documented driver
  interactions in this module: these APIs return Python scalars, so a
  1-row collect IS their shape) and H-checks
  the agg_approx-style accuracy bound: each estimate's exact rank must
  sit within 1% of q·N, alongside the exact percentile both engines
  agree on.
* ``stat_freq_items`` H-checks freqItems' superset guarantee (every
  item with frequency > support appears in the result) — the estimate
  set itself may carry false positives by design, so the contract, not
  the raw set, is what's hashed.

Scale: crosstab/freqItems/approxQuantile are single-pass aggregates with
fixed-size state; sampleBy-via-hash is a narrow zero-shuffle filter. The
probe joins are broadcast one-row panels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# Deterministic content-hash bucket in [0, 100) over an arbitrary BIGINT
# key column — the md5-fold device shared with llm_pipeline (DuckDB lacks
# conv(); the strpos fold is its exact equivalent).


def _bucket_col(key: str):
    return (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )


def _duck_bucket(key: str) -> str:
    h = f"md5(CAST({key} AS VARCHAR))"
    return (
        f"((strpos('0123456789abcdef', substr({h}, 1, 1)) - 1) * 4096"
        f" + (strpos('0123456789abcdef', substr({h}, 2, 1)) - 1) * 256"
        f" + (strpos('0123456789abcdef', substr({h}, 3, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr({h}, 4, 1)) - 1)) % 100"
    )


_STATUSES = ["F", "O", "P"]


@query(
    "stat_crosstab",
    oracle="""
    SELECT c_mktsegment,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via the real ``df.stat.crosstab`` API: market
    segment × order status pair counts, with absent combinations
    zero-filled by the API. The oracle spells the identical table as a
    conditional aggregate. Crosstab's value columns are named by the
    data values themselves; they are re-aliased to a stable schema
    (n_f/n_o/n_p) so the contract survives column-order changes.

    Scale: one hash agg on the (segment, status) pair then a driver-side
    pivot of a 5×3 result — crosstab is only for LOW-cardinality pairs
    by contract (column count = distinct values of col2)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderstatus"
    )
    ct = joined.stat.crosstab("c_mktsegment", "o_orderstatus")
    return ct.select(
        F.col("c_mktsegment_o_orderstatus").alias("c_mktsegment"),
        *[F.col(f"`{s}`").alias(f"n_{s.lower()}") for s in _STATUSES],
    )


_SAMPLE_FRACTIONS = {"BUILDING": 40, "MACHINERY": 15, "FURNITURE": 25}
_SAMPLE_CASE = (
    "CASE c_mktsegment "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _SAMPLE_FRACTIONS.items())
    + " ELSE 0 END"
)


@query(
    "stat_sample_by",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           {_duck_bucket('c_custkey')} AS bucket
    FROM customer
    WHERE {_duck_bucket('c_custkey')} < {_SAMPLE_CASE}
    """,
)
def stat_sample_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with a PER-STRATUM FRACTION MAP —
    ``df.stat.sampleBy`` semantics (strata absent from the map sample at
    0) made deterministic: membership is decided by an md5 bucket of the
    row key against the stratum's fraction, not by seeded RNG, so the
    sample is identical across engines, runs, partitionings, and cluster
    sizes — the property a 100 TB pipeline needs for reproducible
    train/eval splits. The seeded-RNG API itself is pinned in
    tests/test_dfstat.py (its output is layout-dependent by contract).

    Scale: narrow filter fused into the scan; zero shuffle."""
    c = load_table(spark, sf_dir, "customer")
    rate = F.expr(_SAMPLE_CASE)
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            _bucket_col("c_custkey").alias("bucket"),
        )
        .filter(F.col("bucket") < rate)
    )


_AQ_QS = [0.25, 0.5, 0.75, 0.95]

_AQ_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT CAST({q} AS DOUBLE) AS q,
           quantile_cont(c_acctbal, {q}) AS exact_q,
           TRUE AS within_1pct
    FROM customer
    """
    for q in _AQ_QS
)


@query("stat_approx_quantile", oracle=_AQ_ORACLE)
def stat_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.stat.approxQuantile`` (Greenwald-Khanna) under the
    agg_approx bound contract. The API returns a Python list BY
    CONTRACT (this module's one documented driver interaction — the
    list is 4 floats, not data); the H-checked surface is the exact
    percentile plus a flag asserting each GK estimate's exact rank lies
    within 1% of q·N, computed distributed via a broadcast probe panel.
    relativeError=1e-3 gives a 0.1% rank guarantee — the assertion
    leaves 10× headroom, so a flag flip means the sketch broke, not
    that the data got unlucky."""
    c = load_table(spark, sf_dir, "customer").select("c_acctbal")
    ests = c.stat.approxQuantile("c_acctbal", [float(q) for q in _AQ_QS], 1e-3)
    panel = spark.createDataFrame(
        [(float(q), float(v)) for q, v in zip(_AQ_QS, ests)], "q double, est double"
    )
    ranks = (
        c.crossJoin(F.broadcast(panel))
        .groupBy("q")
        .agg(
            F.sum(F.when(F.col("c_acctbal") <= F.col("est"), 1).otherwise(0)).alias("rk"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "q",
            (F.abs(F.col("rk") - F.col("q") * F.col("n")) <= 0.01 * F.col("n")).alias(
                "within_1pct"
            ),
        )
    )
    qs_arr = F.array(*[F.lit(float(q)) for q in _AQ_QS])
    exact = (
        c.agg(F.percentile("c_acctbal", [float(q) for q in _AQ_QS]).alias("ex"))
        .select(
            F.explode(F.arrays_zip(qs_arr.alias("q"), F.col("ex").alias("exact_q"))).alias("z")
        )
        .select(F.col("z.q").alias("q"), F.col("z.exact_q").alias("exact_q"))
    )
    return exact.join(ranks, "q").select("q", "exact_q", "within_1pct")


_FREQ_SUPPORT = 0.15


@query(
    "stat_freq_items",
    oracle=f"""
    SELECT o_orderpriority AS item, count(*) AS exact_n, TRUE AS found
    FROM orders
    GROUP BY o_orderpriority
    HAVING count(*) > {_FREQ_SUPPORT} * (SELECT count(*) FROM orders)
    """,
)
def stat_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.stat.freqItems`` (Karp-Papadimitriou-Shenker single-pass
    heavy hitters). KPS guarantees a SUPERSET: every item with frequency
    > support is returned, possibly plus false positives — so the raw
    set can never be an exact oracle target. The H-checked contract is
    the guarantee itself: compute the exact frequent set (count >
    support·N, a plain aggregate both engines share), then flag each
    exact item's membership in the KPS result — all TRUE, or the sketch
    broke. The order-priority column is ~uniform at 20% per value;
    support=0.15 keeps every stratum 5 points clear of the threshold at
    any SF, so the exact set is never data-dependent-fragile.

    Scale: KPS is one pass with O(1/support) state; the membership probe
    is a broadcast one-row cross join."""
    o = load_table(spark, sf_dir, "orders")
    fi = o.stat.freqItems(["o_orderpriority"], support=_FREQ_SUPPORT)
    total = o.agg(F.count(F.lit(1)).alias("total"))
    exact = (
        o.groupBy(F.col("o_orderpriority").alias("item"))
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("exact_n") > _FREQ_SUPPORT * F.col("total"))
    )
    return exact.crossJoin(F.broadcast(fi)).select(
        "item",
        "exact_n",
        F.array_contains(F.col("o_orderpriority_freqItems"), F.col("item")).alias(
            "found"
        ),
    )


@query(
    "stat_cov_corr",
    oracle="""
    WITH q AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        -- second moments stay HUGEINT: sum(y*y) is ~6e19 at sf0.1,
        -- past BIGINT (the sf0.1 contract check caught the cast)
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
        FROM q
    )
    -- rounded on BOTH sides: the huge second moments pass through a
    -- HUGEINT->DOUBLE (duck) vs int->float (python) conversion whose
    -- last ulp can differ (measured at sf0.1) — round() absorbs it
    SELECT n,
           round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                 / (n - 1), 6) AS sample_cov,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
               / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                  * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
               9) AS pearson_corr,
           TRUE AS api_cov_ok, TRUE AS api_corr_ok
    FROM m
    """,
)
def stat_cov_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.stat.cov`` / ``df.stat.corr`` (ST-E) — the remaining
    DataFrameStatFunctions pair, under the A13 discipline: the native
    APIs accumulate DOUBLES, and double summation is partition-order-
    dependent (Spark's 32 partials vs DuckDB's single scan disagree in
    the last ulps — un-hash-checkable by construction), so the H-checked
    VALUES are closed forms over exact BIGINT moment sums (quantity is
    integer-valued; price quantized to cents), bit-equal cross-engine:
    one division tree + two correctly-rounded sqrts. The native
    ``df.stat.cov``/``df.stat.corr`` calls are pinned alongside as
    contract flags (|api − exact| ≤ 1e-9 relative), so an API
    regression flips a flag and fails the hash — the same two-sided
    surface agg_approx gives HLL.

    Scale: the moment agg is ONE map-side-combinable pass (six BIGINT
    accumulators merge associatively); the two stat API calls each run
    their own single-pass agg. Output is one row."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        F.round("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    m = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((xd * xd).cast("decimal(38,0)")).alias("sxx"),
        F.sum((xd * yd).cast("decimal(38,0)")).alias("sxy"),
        F.sum((yd * yd).cast("decimal(38,0)")).alias("syy"),
    ).collect()[0]
    n, sx, sy = m.n, m.sx, m.sy
    sxx, sxy, syy = int(m.sxx), int(m.sxy), int(m.syy)
    import math

    cov = (float(sxy) - float(sx) * sy / n) / (n - 1)
    corr = (n * float(sxy) - float(sx) * sy) / (
        math.sqrt(n * float(sxx) - float(sx) * sx)
        * math.sqrt(n * float(syy) - float(sy) * sy)
    )
    # the native API surface under test — each one aggregation pass;
    # compared against the exact-moment closed form at 1e-9 relative
    qd = li.select(
        F.round("l_quantity").cast("double").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("double").alias("y"),
    )
    api_cov = qd.stat.cov("x", "y")
    api_corr = qd.stat.corr("x", "y")
    row = [
        (
            n,
            cov,
            corr,
            bool(abs(api_cov - cov) <= 1e-9 * max(1.0, abs(cov))),
            bool(abs(api_corr - corr) <= 1e-9 * max(1.0, abs(corr))),
        )
    ]
    return spark.createDataFrame(
        row,
        "n bigint, sample_cov double, pearson_corr double, "
        "api_cov_ok boolean, api_corr_ok boolean",
    ).select(
        "n",
        # Spark-SQL round (half-up), never Python round (banker's)
        F.round("sample_cov", 6).alias("sample_cov"),
        F.round("pearson_corr", 9).alias("pearson_corr"),
        "api_cov_ok",
        "api_corr_ok",
    )


@query(
    "stat_describe",
    oracle="""
    WITH q AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS x FROM lineitem
    ),
    m AS (
        -- sxx stays HUGEINT (the ST-E/second-moment rule); harmless
        -- here (x <= 50 keeps it ~1.5e12 at sf0.1) but scale-honest
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               sum(x * x) AS sxx,
               CAST(min(x) AS BIGINT) AS min_x,
               CAST(max(x) AS BIGINT) AS max_x
        FROM q
    )
    SELECT n, min_x, max_x,
           round(CAST(sx AS DOUBLE) / n, 9) AS mean_x,
           round(sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                      / (n * (n - 1.0))), 9) AS stddev_x,
           TRUE AS api_count_ok, TRUE AS api_min_ok, TRUE AS api_max_ok,
           TRUE AS api_mean_ok, TRUE AS api_stddev_ok,
           TRUE AS summary_quantiles_ok
    FROM m
    """,
)
def stat_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.describe()`` / ``df.summary()`` (ST-F, VERDICT r14 item 4) —
    the everyday profiling API, H-checked under the ST-E exact-moment
    discipline. Both APIs return a driver-side STRINGLY frame BY
    CONTRACT (every stat is cast to string in the result — the
    documented driver interaction, same class as approxQuantile's
    list), and describe()'s mean/stddev accumulate doubles whose
    partition-order-dependent last ulps can never hash-match another
    engine. So the H-checked VALUES are exact: count/min/max as
    BIGINTs, mean/stddev as closed forms over exact BIGINT/HUGEINT
    moment sums (one map-side-combinable pass), rounded in SQL on both
    sides. The native surfaces are pinned alongside as contract flags:
    describe()'s five stats must sit within 1e-9 relative of the exact
    values (count/min/max exactly equal), and summary()'s 25%/50%/75%
    approx percentiles must each satisfy the TIE-AWARE rank bound
    rank<(est) - 1%*N <= q*N <= rank<=(est) + 1%*N — the ST-C device
    widened for tied data: x is integer-valued 1..50, so a tie group
    spans ~2% of N and the one-sided |rank<=(est) - q*N| form fails on
    a correct estimate whose tie group merely straddles q*N (measured
    at sf0.001). Checked distributed via a broadcast 3-row probe panel.

    Scale: one exact-moment pass + describe()'s and summary()'s own
    single-pass aggs; the rank probe is a broadcast cross join. Output
    is one row; the only collects are the 1-row moment agg and the
    stringly API frames (5 and 3 rows — API contract shapes)."""
    import math

    li = load_table(spark, sf_dir, "lineitem").select(
        F.round("l_quantity").cast("bigint").alias("x")
    )
    xd = F.col("x").cast("decimal(19,0)")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum((xd * xd).cast("decimal(38,0)")).alias("sxx"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    ).collect()[0]
    n, sx, sxx = int(m.n), int(m.sx), int(m.sxx)
    mean = float(sx) / n
    std = math.sqrt((n * float(sxx) - float(sx) * sx) / (n * (n - 1.0)))

    # The native APIs under test (stringly frames by contract).
    desc = {r["summary"]: r["x"] for r in li.describe("x").collect()}
    summ = {
        r["summary"]: r["x"]
        for r in li.summary("25%", "50%", "75%").collect()
    }
    api_ok = dict(
        count=int(desc["count"]) == n,
        mn=float(desc["min"]) == float(m.mn),
        mx=float(desc["max"]) == float(m.mx),
        mean=abs(float(desc["mean"]) - mean) <= 1e-9 * max(1.0, abs(mean)),
        std=abs(float(desc["stddev"]) - std) <= 1e-9 * max(1.0, abs(std)),
    )
    # summary()'s GK percentiles: exact rank within 1% of q*N, computed
    # distributed via a broadcast probe panel (the ST-C device).
    panel = spark.createDataFrame(
        [(q, float(summ[f"{int(q * 100)}%"])) for q in (0.25, 0.5, 0.75)],
        "q double, est double",
    )
    q_ok = (
        li.crossJoin(F.broadcast(panel))
        .groupBy("q")
        .agg(
            F.sum(F.when(F.col("x") < F.col("est"), 1).otherwise(0)).alias(
                "rk_lt"
            ),
            F.sum(F.when(F.col("x") <= F.col("est"), 1).otherwise(0)).alias(
                "rk_le"
            ),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            F.min(
                (F.col("rk_lt") - 0.01 * F.col("cnt")
                 <= F.col("q") * F.col("cnt"))
                & (F.col("q") * F.col("cnt")
                   <= F.col("rk_le") + 0.01 * F.col("cnt"))
            ).alias("ok")
        )
        .collect()[0]["ok"]
    )
    row = [(n, int(m.mn), int(m.mx), mean, std, *map(bool, api_ok.values()),
            bool(q_ok))]
    return spark.createDataFrame(
        row,
        "n bigint, min_x bigint, max_x bigint, mean_x double, "
        "stddev_x double, api_count_ok boolean, api_min_ok boolean, "
        "api_max_ok boolean, api_mean_ok boolean, api_stddev_ok boolean, "
        "summary_quantiles_ok boolean",
    ).select(
        "n", "min_x", "max_x",
        # Spark-SQL round (half-up), never Python round (banker's)
        F.round("mean_x", 9).alias("mean_x"),
        F.round("stddev_x", 9).alias("stddev_x"),
        "api_count_ok", "api_min_ok", "api_max_ok", "api_mean_ok",
        "api_stddev_ok", "summary_quantiles_ok",
    )
