"""Event-analytics operators (r3 additions): CDC latest-wins upsert,
sequenced funnel, cohort retention, multi-resolution rollup cascade, and
a time-interval window frame — the product-analytics / warehouse-
maintenance surface over the ``events`` fact table.

Scale posture: every op here is hash-agg / window shaped — shuffles only
on real keys (user_id, time bucket), no self-joins without an equi key,
no global sorts. The rollup cascade demonstrates PARTIAL REAGGREGATION
(minute → hour → day reuses the lower level instead of rescanning the
fact table), which is the hypertable/continuous-aggregate maintenance
shape: at 100 TB the day level reads the hour level's few rows, not the
raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


# --------------------------------------------------------------- CDC upsert
@query(
    "cdc_upsert_latest",
    oracle="""
    SELECT user_id, ts AS last_ts, event_type AS last_type,
           value AS last_value,
           -- CAST: count(*) over a window partition is BIGINT, but keep
           -- the explicit cast convention for integer aggregates
           CAST(n_changes AS BIGINT) AS n_changes
    FROM (SELECT user_id, ts, event_type, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS n_changes
          FROM events)
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-wins upsert (MERGE-INTO semantics): the events feed is a
    change stream keyed by ``user_id``; the materialized state keeps each
    key's most recent record (``ts`` desc, ``event_id`` tie-break) and
    drops keys whose latest record is a tombstone (``error``). One
    shuffle on the key + a per-key window — the standard incremental
    upsert compaction; at scale the same plan applies per partition of
    the base table, which is how a lakehouse MERGE compacts a day's
    changes."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count(F.lit(1)).over(wc))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            "n_changes",
        )
    )


# --------------------------------------------------------------- snapshot diff
@query(
    "cdc_diff_snapshots",
    oracle="""
    WITH old AS (SELECT o_orderkey AS k, o_totalprice AS price FROM orders),
    new AS (
        SELECT o_orderkey AS k,
               -- additive bump, NOT round(price*1.1): per-row round()
               -- diverges between engines at .xx5 boundaries (r1 rule)
               CASE WHEN o_orderkey % 10 = 3
                    THEN o_totalprice + 10.0
                    ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 10 <> 7
        UNION ALL
        SELECT o_orderkey + 1000000000 AS k, o_totalprice AS price
        FROM orders WHERE o_orderkey % 10 = 5
    )
    SELECT coalesce(o.k, n.k) AS k,
           CASE WHEN o.k IS NULL THEN 'I'
                WHEN n.k IS NULL THEN 'D'
                ELSE 'U' END AS op,
           o.price AS old_price,
           n.price AS new_price
    FROM old o FULL OUTER JOIN new n ON o.k = n.k
    WHERE o.k IS NULL OR n.k IS NULL OR o.price <> n.price
    """,
)
def cdc_diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — GENERATE a change feed from two table versions
    (the inverse of cdc_upsert_latest): full-outer join on the key,
    classify I/U/D, drop unchanged rows. The "new" snapshot is derived
    deterministically from orders (10% deleted, 10% price-bumped by an
    IEEE-exact +10.0, 10%
    re-inserted under new keys) so both engines diff identical inputs.
    One shuffle on the key; at 100 TB this is the standard incremental-
    refresh delta detection between daily snapshots, and with both
    snapshots bucketed on the key (join_bucketed_colocated) even that
    shuffle disappears. Nullable DOUBLE sides are fetchdf-stable."""
    o = load_table(spark, sf_dir, "orders")
    old = o.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("price"))
    new = (
        o.filter(F.col("o_orderkey") % 10 != 7)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(
                F.col("o_orderkey") % 10 == 3,
                F.col("o_totalprice") + 10.0,
            )
            .otherwise(F.col("o_totalprice"))
            .alias("price"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 10 == 5).select(
                (F.col("o_orderkey") + 1_000_000_000).alias("k"),
                F.col("o_totalprice").alias("price"),
            )
        )
    )
    j = old.alias("o").join(new.alias("n"), F.col("o.k") == F.col("n.k"), "full")
    return j.filter(
        F.col("o.k").isNull()
        | F.col("n.k").isNull()
        | (F.col("o.price") != F.col("n.price"))
    ).select(
        F.coalesce(F.col("o.k"), F.col("n.k")).alias("k"),
        F.when(F.col("o.k").isNull(), "I")
        .when(F.col("n.k").isNull(), "D")
        .otherwise("U")
        .alias("op"),
        F.col("o.price").alias("old_price"),
        F.col("n.price").alias("new_price"),
    )


# --------------------------------------------------------------- SCD2
@query(
    "scd2_intervals",
    oracle="""
    SELECT user_id,
           CAST(row_number() OVER w AS BIGINT) AS version,
           event_type, value,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: every change record
    becomes a version row with a validity interval [valid_from,
    valid_to); the open (current) version has a NULL valid_to — nullable
    TIMESTAMP is fetchdf-stable (datetime64 + NaT), unlike nullable
    ints. One shuffle on the key, one ordered pass (row_number + lead
    share the same window frame) — the standard dimension-table rebuild
    from a CDC feed, per-key parallel at any scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("version"),
        "event_type",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


# --------------------------------------------------------------- batch sessions
_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@query(
    "events_sessionize_batch",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            >= {_SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, value,
               -- CAST: window sum of INTEGER is HUGEINT → float64 via
               -- the driver's fetchdf. (ts, event_id) order everywhere:
               -- a ts-only cumsum is ambiguous across equal timestamps.
               CAST(sum(new_sess) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-sessionization (the batch twin of the streaming
    ``stateful_sessionize``): a session breaks after 30 minutes of
    per-user inactivity. Session boundaries come from a lag-compare, ids
    from a running sum of the break flags — two window passes over ONE
    shuffle on ``user_id`` (same partitioning, Spark reuses the
    exchange), then a hash agg per session. Gap compares use integer
    epoch-micros so the boundary is engine-exact. Boundary rule is
    ``gap >= 30 min`` splits — the SAME convention as stateful_sessionize
    (stateful.GAP_US), so the custom stateful pair agrees even on
    exact-gap data. NOT the same as Spark's ``session_window``, which
    MERGES an exact-gap event and splits only on ``diff > gap``
    (measured r9 — the r6 note claimed all three agreed; on
    µs-precision data the exact boundary is measure-zero, but the claim
    was still false; see stream_window_session and
    test_session_window_exact_gap_boundary)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lag_us = F.lag(us).over(w)
    new_sess = F.when(
        lag_us.isNull() | (us - lag_us >= _SESSION_GAP_US), F.lit(1)
    ).otherwise(F.lit(0))
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = ev.select(
        "user_id", "event_id", "ts", "value", new_sess.alias("new_sess")
    ).withColumn("session_seq", F.sum("new_sess").over(w_cum).cast("bigint"))
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


# --------------------------------------------------------------- funnel
@query(
    "events_funnel",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t_view
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id)
    SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
           (v.user_id IS NOT NULL) AS reached_view,
           (c.user_id IS NOT NULL) AS reached_click,
           (p.user_id IS NOT NULL) AS reached_purchase
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequenced conversion funnel (view → click → purchase): each stage's
    timestamp must strictly follow the previous stage's — the standard
    product-analytics funnel, NOT three independent mins. Three keyed
    aggregations, each over a stream pre-filtered to one event type and
    (after stage 1) semi-joined to the prior stage — every join is an
    equi-join on ``user_id``, so the whole funnel is shuffle-on-key at
    any scale. Nullable stage timestamps stay TIMESTAMP (fetchdf keeps
    datetime64 columns NaT-safe, unlike nullable ints)."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    users = ev.select("user_id").distinct()
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.col("t_view").isNotNull().alias("reached_view"),
            F.col("t_click").isNotNull().alias("reached_click"),
            F.col("t_purchase").isNotNull().alias("reached_purchase"),
        )
    )


# --------------------------------------------------------------- cohorts
@query(
    "events_cohort_retention",
    oracle="""
    WITH cohorts AS (
        SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    )
    SELECT c.cohort_day,
           date_diff('day', c.cohort_day, a.day) AS day_offset,
           count(*) AS n_users
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY c.cohort_day, date_diff('day', c.cohort_day, a.day)
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later active day as an offset from their cohort day — the
    canonical retention triangle. Two hash aggregations plus one
    equi-join on ``user_id``; distinct-day dedup happens BEFORE the join
    so the join carries one row per (user, day), not the raw stream.
    ``count(*)`` after a distinct is exact (each user counts once per
    offset)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day")
    )
    activity = ev.select("user_id", day.alias("day")).distinct()
    return (
        activity.join(cohorts, "user_id")
        .select("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --------------------------------------------------------------- rollup cascade
@query(
    "events_rollup_cascade",
    oracle="""
    -- the oracle aggregates the RAW table directly at day level; the
    -- Spark side cascades minute -> hour -> day, so a hash match proves
    -- the partial-reaggregation algebra (sum of sums, sum of counts)
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           count(*) AS n,
           round(CAST(sum(value) AS DOUBLE), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup cascade (the hypertable continuous-
    aggregate shape): minute-level partials are re-aggregated to hour,
    then hour to day — the day level never touches the raw fact table.
    At 100 TB this is the warehouse-maintenance win: refreshing the day
    aggregate reads the hour level's thousands of rows instead of the
    raw billions; the algebra (count→sum, sum→sum) is what the oracle's
    direct day-level aggregation hash-verifies. Sum rounded to 2
    decimals: the cascade folds doubles in a different order than the
    direct aggregation (associativity, ~1e-9 absolute at these
    magnitudes)."""
    ev = load_table(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("m"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    hour = minute.groupBy(
        F.date_trunc("hour", F.col("m")).alias("h"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    return (
        hour.groupBy(
            F.date_trunc("day", F.col("h")).cast("date").alias("day"), "event_type"
        )
        .agg(F.sum("n").alias("n"), F.round(F.sum("v"), 2).alias("total_value"))
        .select("day", "event_type", "n", "total_value")
    )


# --------------------------------------------------------------- time-range frame
@query(
    "window_time_range",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_1h,
           round(sum(value) OVER w, 4) AS value_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval window frame: per event, the count and value sum of
    the same user's events in the trailing hour — the sliding-window
    analytic that RANGE frames exist for (W4 covers numeric ranges; this
    is the event-time flavor). Both engines order by integer epoch
    MICROSECONDS (``unix_micros`` / ``epoch_us``) so the 1-hour bound is
    compared in exact integers — ordering by raw timestamps would pass
    too, but sub-second frame boundaries would then depend on each
    engine's interval arithmetic. One shuffle on ``user_id``; frames are
    computed in a single ordered pass per key."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        # NTZ→LTZ cast is identity under the UTC session tz (project
        # convention); unix_micros only accepts the LTZ flavor
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 4).alias("value_1h"),
    )


# --------------------------------------------------------------- LOCF gap fill
@query(
    "events_gap_fill",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    hourly AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
               count(*) AS c, round(sum(value), 4) AS v
        FROM events
        GROUP BY 1, 2
    )
    SELECT CAST(s.h AS TIMESTAMP) AS h, t.event_type,
           coalesce(a.c, 0) AS n,
           last_value(a.v IGNORE NULLS) OVER (
               PARTITION BY t.event_type ORDER BY s.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_locf
    FROM spine s CROSS JOIN types t
    LEFT JOIN hourly a ON a.h = s.h AND a.event_type = t.event_type
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill with last-observation-carried-forward (the hypertable
    ``locf()`` primitive; A9c's resample key zero-fills COUNTS, this
    carries the last observed VALUE across missing buckets — the
    time-series downsampling shape for sensor/metric data where absence
    means "unchanged", not "zero"). Hourly per-type value sums are
    left-joined onto the generated [min, max] hour × type spine, then
    ``last(v, ignorenulls=True)`` over an ordered per-type window fills
    the holes. Hours before a type's first observation stay NULL (both
    engines agree; NULL doubles are float64-stable through fetchdf).
    The hourly sum is rounded BEFORE the fill so the carried value is
    bit-identical to the oracle's regardless of fill distance.

    Scale: one hash agg on the fact table (partial+final), a broadcast
    spine join (spine × types is tiny by construction), and one window
    partitioned by event_type ordered by hour — the window input is the
    already-aggregated spine (rows = hours × types), never the raw
    events, so the per-partition ordered pass is bounded by the time
    range, not the data volume."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"), F.round(F.sum("value"), 4).alias("v"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    types = ev.select("event_type").distinct()
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.crossJoin(types)
        .join(hourly, ["h", "event_type"], "left")
        .select(
            "h",
            "event_type",
            F.coalesce(F.col("c"), F.lit(0)).alias("n"),
            F.last("v", ignorenulls=True).over(w).alias("v_locf"),
        )
    )


# --------------------------------------------------------- point-in-time join
@query(
    "scd2_point_in_time_join",
    oracle="""
    WITH v AS (
        SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version,
               event_type AS dim_type, value AS dim_value,
               ts AS valid_from, lead(ts) OVER w AS valid_to
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e.event_id,
           CAST(v.version AS DOUBLE) AS version,
           v.dim_type, v.dim_value
    FROM events e
    LEFT JOIN v ON v.user_id = e.user_id
               AND v.valid_from <= e.ts - INTERVAL 1 HOUR
               AND (v.valid_to > e.ts - INTERVAL 1 HOUR
                    OR v.valid_to IS NULL)
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against the E7 SCD2 dimension: for
    every event, the dimension version that was valid ONE HOUR BEFORE
    its timestamp — the warehouse PIT lookup (feature-store
    time-travel, "state as the model saw it"). Because SCD2 intervals
    TILE time contiguously per key, "the version covering t" equals
    "the last version with valid_from <= t", so the implementation is
    the E-family's scalable as-of shape (union + running
    last(ignorenulls), J8's rewrite): ONE shuffle on user_id, one
    ordered pass, no interval-join candidate blow-up — at 100 TB this
    beats the naive range join, whose per-key candidate set is
    O(versions). The oracle IS that naive interval join; the hash match
    proves the tiling rewrite exact, including the edge the interval
    predicate encodes: zero-width versions (equal-ts changes) are
    skipped in favor of the survivor, and probes before a user's first
    version stay NULL (version CAST DOUBLE both sides — nullable-int
    fetchdf hazard; dim_type/dim_value are NULL-stable string/float64).
    Ties at t == valid_from take the NEW version (dim sorts before
    probe at equal t), matching valid_from <= t < valid_to."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dstruct = "struct<version:bigint,dim_type:string,dim_value:double>"
    dim = ev.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("kind"),
        F.struct(
            F.row_number().over(w).cast("bigint").alias("version"),
            F.col("event_type").alias("dim_type"),
            F.col("value").alias("dim_value"),
        ).alias("d"),
        F.lit(None).cast("long").alias("event_id"),
    )
    probes = ev.select(
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast(dstruct).alias("d"),
        "event_id",
    )
    wl = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind", F.col("d.version").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dim.unionByName(probes)
        .withColumn("pit", F.last("d", ignorenulls=True).over(wl))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            F.col("pit.version").cast("double").alias("version"),
            F.col("pit.dim_type").alias("dim_type"),
            F.col("pit.dim_value").alias("dim_value"),
        )
    )


# ----------------------------------------------------------- observability
@query(
    "observe_metrics",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS sum_price,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT)
               AS n_discounted
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    """,
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.observe()`` — the production data-quality/metrics hook
    (the batch half of the observability surface; the streaming half is
    the StreamingQueryListener, pinned test-side): named aggregate
    metrics are attached to a plan node and computed AS A SIDE EFFECT of
    whatever action the query already runs — accumulator-style, zero
    extra scan, zero extra shuffle. Here a filtered lineitem scan is
    driven through a ``noop`` write (the cheapest real action) and the
    observed metrics themselves are returned as a one-row DataFrame, so
    the H-check pins observe()'s aggregate values against the oracle
    computing the same aggregates relationally — proving the metrics
    hook reports exactly what a dedicated aggregation query would
    (row counts, extremes, a predicate tally; the sum rounded in both
    engines per the cross-engine summation contract).

    Scale: observe() is THE way to count/validate rows in a 100 TB
    pipeline without a second pass — metrics ride the action's existing
    scan as map-side partial aggregates merged on the driver; an
    equivalent standalone agg query would re-read the whole input."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation()
    observed = li.filter(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp")
    ).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
        .cast("bigint")
        .alias("n_discounted"),
    )
    # Drive the observed plan with the cheapest real action; obs.get
    # blocks until the action's QueryExecutionListener fires.
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    # Degrade, don't crash, on an empty filter match (a regenerated
    # testdata set could shift l_shipdate past the cutoff): min/max/sum
    # metrics come back None when n_rows == 0, and float(None) would kill
    # the key with a TypeError instead of a diagnosable hash mismatch.
    # Emit a 0.0-sentinel row so the driver still gets a comparable frame.
    def _f(v: object) -> float:
        return 0.0 if v is None else float(v)

    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                _f(m["sum_price"]),
                _f(m["min_price"]),
                _f(m["max_price"]),
                m["n_discounted"],
            )
        ],
        schema=(
            "n_rows long, sum_price double, min_price double, "
            "max_price double, n_discounted long"
        ),
    )


@query(
    "events_sessionize_dynamic_gap",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS t_us,
               CASE WHEN event_type = 'purchase' THEN 1800000000
                    ELSE 600000000 END AS gap_us
        FROM events
    ),
    flagged AS (
        SELECT *,
               CASE WHEN t_us > coalesce(max(t_us + gap_us) OVER (
                         PARTITION BY user_id ORDER BY t_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1) THEN 1 ELSE 0 END AS new_sess
        FROM ev
    ),
    sess AS (
        SELECT *,
               CAST(sum(new_sess) OVER (PARTITION BY user_id
                                        ORDER BY t_us, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS sid
        FROM flagged
    )
    SELECT user_id,
           make_timestamp(min(t_us)) AS sess_start,
           make_timestamp(max(t_us + gap_us)) AS sess_end,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_v
    FROM sess
    GROUP BY user_id, sid
    """,
)
def events_sessionize_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows (E16): ``F.session_window`` with a
    per-ROW gap expression — purchases keep a session alive 30 minutes,
    everything else 10 (the real-world rule: high-intent events justify
    a longer engagement horizon; a fixed gap can't express it). With a
    per-row gap the adjacent-lag rewrite is WRONG — a long-gap event can
    bridge over a short-gap successor — so the oracle is the general
    interval-merge: an event opens a new session iff its time exceeds
    the RUNNING MAX of (ts + gap) over all predecessors (computed on
    integer epoch-micros, tie-broken by event_id), and a session's end
    is that running max, exactly ``session_window``'s merge semantics.
    Boundary measured r9 (test_session_window_exact_gap_boundary): an
    event exactly at gap-expiry MERGES, so the flag is strictly ``>``.
    Scale: same shape as every sessionizer here — one shuffle on
    user_id, windows + hash agg; the gap CASE is a row-local expression
    in codegen, so dynamic gaps cost nothing over fixed."""
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("30 minutes")
    ).otherwise(F.lit("10 minutes"))
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_v"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("sess_start"),
            F.col("w.end").cast("timestamp_ntz").alias("sess_end"),
            "n_events",
            "sum_v",
        )
    )


# ------------------------------------------------------ linear interpolation
@query(
    "events_interpolate_linear",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    hourly AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
               count(*) AS c,
               CAST(floor(
                   CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS DOUBLE)
                   / count(*)) AS BIGINT) AS v4
        FROM events
        GROUP BY 1, 2
    ),
    grid AS (
        SELECT CAST(s.h AS TIMESTAMP) AS h, t.event_type,
               epoch_us(CAST(s.h AS TIMESTAMP)) // 3600000000 AS e,
               a.c, a.v4
        FROM spine s CROSS JOIN types t
        LEFT JOIN hourly a ON a.h = s.h AND a.event_type = t.event_type
    ),
    nav AS (
        SELECT h, event_type, e, c, v4,
               last_value(CASE WHEN v4 IS NOT NULL THEN {'e': e, 'v': v4} END
                          IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS p,
               first_value(CASE WHEN v4 IS NOT NULL THEN {'e': e, 'v': v4} END
                           IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY e
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS nx
        FROM grid
    )
    SELECT h, event_type, CAST(coalesce(c, 0) AS BIGINT) AS n,
           CASE
             WHEN v4 IS NOT NULL THEN CAST(v4 AS DOUBLE) / 10000.0
             WHEN p IS NOT NULL AND nx IS NOT NULL THEN
               CAST(p.v + CAST(floor(
                   CAST((nx.v - p.v) * (e - p.e) AS DOUBLE)
                   / CAST(nx.e - p.e AS DOUBLE)) AS BIGINT)
                    AS DOUBLE) / 10000.0
           END AS v_interp
    FROM nav
    """,
)
def events_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR gap interpolation (the hypertable ``interpolate()``
    primitive, E13's sibling): where LOCF carries the last value flat,
    this draws the line between the neighboring OBSERVED hourly
    averages and evaluates it at each missing bucket — the right fill
    for continuously-varying signals (rates, temperatures, prices).
    Hourly per-type averages land on the generated [min, max] hour x
    type spine; per missing bucket the previous and next observations
    arrive as ``last/first(struct(epoch, v), ignorenulls)`` over one
    ordered per-type window pass each (a navigation struct, so value
    and coordinate travel together and stay consistent); buckets
    before the first or after the last observation stay NULL in both
    engines.

    Numeric determinism (learned the hard way in this key's first
    TWO drafts — the sf0.001 probe caught interpolated half-ties and
    the sf0.1 probe caught an observed-average half-tie the smaller
    scales missed): ANY round() of a computed double can land on a
    decimal half-tie where Spark's BigDecimal-exact rounding and
    DuckDB's scaled-float rounding split. So this key contains NO
    round() at all. Values are floor-quantized per row to BIGINT
    1e-4 units (floor has no half-ties: an exact integer input
    floors exactly, anything else floors the identical
    nearest-double in both engines), hourly averages are
    floor(sum4 / n) on exact integer sums, time is the hour INDEX
    (epoch_us div 3600000000) so every numerator stays < 2^53 and
    the double divisions see exactly-represented integers, and the
    interpolant is pv4 + floor(dv4 * de / den) in the same integer
    units. The single /10000.0 at the end is an exact-input
    division both engines perform identically.

    ANSI note (the r9 lesson): when the bucket IS observed, prev ==
    next and the denominator is zero — Spark's projection does not
    short-circuit through CASE the way DuckDB does, so the division
    is computed under an ``F.when(ne != pe)`` guard.

    Scale: identical shape to events_gap_fill — one hash agg over the
    fact, a broadcast spine x types join, and two ordered window
    passes over the AGGREGATED grid (rows = hours x types, bounded by
    the time range, never the data volume)."""
    ev = load_table(spark, sf_dir, "events")
    vi = F.floor(F.col("value") * 10000).cast("bigint")
    hourly = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"), F.sum(vi).alias("s4"))
        .select(
            "h",
            "event_type",
            "c",
            F.floor(F.col("s4").cast("double") / F.col("c"))
            .cast("bigint")
            .alias("v4"),
        )
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    types = ev.select("event_type").distinct()
    grid = (
        spine.crossJoin(types)
        .join(hourly, ["h", "event_type"], "left")
        .withColumn("e", F.expr("unix_micros(h) div 3600000000"))
    )
    obs = F.when(
        F.col("v4").isNotNull(),
        F.struct(F.col("e"), F.col("v4").alias("v")),
    )
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("e")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nav = grid.select(
        "h",
        "event_type",
        "e",
        "c",
        "v4",
        F.last(obs, ignorenulls=True).over(w_back).alias("p"),
        F.first(obs, ignorenulls=True).over(w_fwd).alias("nx"),
    )
    pe, pv = F.col("p.e"), F.col("p.v")
    ne, nv = F.col("nx.e"), F.col("nx.v")
    # guarded division: observed buckets have pe == ne, and Spark
    # evaluates every CASE branch's subexpressions under ANSI mode
    step = F.when(
        ne != pe,
        F.floor(
            ((nv - pv) * (F.col("e") - pe)).cast("double")
            / (ne - pe).cast("double")
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return nav.select(
        "h",
        "event_type",
        F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("n"),
        F.when(
            F.col("v4").isNotNull(),
            F.col("v4").cast("double") / F.lit(10000.0),
        )
        .when(
            pe.isNotNull() & ne.isNotNull(),
            (pv + step).cast("double") / F.lit(10000.0),
        )
        .alias("v_interp"),
    )


# --------------------------------------------------------- OHLC downsampling
@query(
    "events_resample_ohlc",
    oracle="""
    SELECT date_trunc('hour', ts) AS h, event_type,
           min({'ts': ts, 'eid': event_id, 'v': value}).v AS open_v,
           round(max(value), 4) AS high_v,
           round(min(value), 4) AS low_v,
           max({'ts': ts, 'eid': event_id, 'v': value}).v AS close_v,
           CAST(count(*) AS BIGINT) AS n_obs,
           round(sum(value), 4) AS sum_v
    FROM events
    GROUP BY 1, 2
    """,
)
def events_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open-high-low-close) downsampling — the candlestick /
    sensor-rollup primitive every timeseries engine ships: per (hour,
    event_type) bucket, the FIRST and LAST observed value in event-time
    order plus the extremes and volume. First/last are computed with
    the ``min/max(struct(ts, event_id, value))`` trick — the ordering
    tuple and the payload travel in one struct, so open/close come out
    of the SAME hash aggregate as the extremes: one partial+final agg,
    one shuffle on the bucket key, NO window pass and no second scan
    (the naive row_number()-based first/last would force a full sort
    per bucket). Ties are impossible by construction (event_id is
    unique), so both engines pick identical rows; struct comparison is
    field-lexicographic in both. open/close are raw parquet doubles
    (cross-engine exact); the aggregated extremes and sum are rounded
    in-SQL on both sides.

    Scale: this is the map-side-combinable shape — partial OHLC structs
    merge associatively, so 100 TB of ticks reduce to hours x types
    rows with no global ordering anywhere."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id").alias("eid"), F.col("value"))
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(
        F.min(key).getField("value").alias("open_v"),
        F.round(F.max("value"), 4).alias("high_v"),
        F.round(F.min("value"), 4).alias("low_v"),
        F.max(key).getField("value").alias("close_v"),
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.sum("value"), 4).alias("sum_v"),
    )


# ------------------------------------------------------ rolling z-score
@query(
    "events_anomaly_zscore",
    oracle="""
    WITH q AS (
        SELECT event_id, user_id, ts,
               CAST(floor(value * 100) AS BIGINT) AS v2
        FROM events
    ),
    w AS (
        SELECT event_id, user_id, v2,
               count(*) OVER win AS n,
               sum(v2) OVER win AS s,
               sum(v2 * v2) OVER win AS ss
        FROM q
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, CAST(n AS BIGINT) AS n,
           CASE WHEN n * ss - s * s > 0 THEN
               CAST(n * v2 - s AS DOUBLE)
                   / sqrt(CAST(n * ss - s * s AS DOUBLE))
           END AS z,
           CASE WHEN n * ss - s * s > 0 THEN
               abs(CAST(n * v2 - s AS DOUBLE)
                   / sqrt(CAST(n * ss - s * s AS DOUBLE))) > 3.0
           END AS is_anomaly
    FROM w
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection — the streaming-metrics
    primitive every observability stack runs: each event scored against
    the trailing 50-observation window of ITS OWN user's history,
    z = (v − μ)/σ, flag at |z| > 3. One shuffle on user_id, one ordered
    window pass computing count/sum/sum-of-squares — the classic
    single-pass variance identity z = (n·v − s) / √(n·ss − s²).

    Numeric determinism (the E17 discipline): values floor-quantize to
    1e-2 BIGINT units so every windowed sum is EXACT integer arithmetic
    (ss ≤ 50·(56021)² ≈ 1.6e11 and n·ss ≈ 8e12 both < 2^53 — checked
    against the data's value ceiling), and the only floating ops are
    one division and one ``sqrt`` on exactly-represented integers —
    both IEEE correctly-rounded in BOTH engines, so z is bit-equal with
    no rounding anywhere. Degenerate windows (n=1 or constant values →
    zero variance) yield NULL via a guard that also satisfies ANSI
    mode's non-short-circuiting DOUBLE division.

    Scale: windows are per-user (millions of partitions at 100 TB, each
    a bounded ordered pass) — never a global sort; the quantization and
    the variance identity both ride whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100).cast("bigint").alias("v2"),
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-49, Window.currentRow)
    )
    w = q.select(
        "event_id",
        "user_id",
        "v2",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("v2").over(win).alias("s"),
        F.sum(F.col("v2") * F.col("v2")).over(win).alias("ss"),
    )
    var_term = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    z = F.when(
        var_term > 0,
        (F.col("n") * F.col("v2") - F.col("s")).cast("double")
        / F.sqrt(var_term.cast("double")),
    )
    return w.select(
        "event_id",
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        z.alias("z"),
        F.when(var_term > 0, F.abs(z) > 3.0).alias("is_anomaly"),
    )


# ------------------------------------------------- mean-shift changepoints
@query(
    "events_changepoint_meanshift",
    oracle="""
    WITH q AS (
        SELECT event_id, user_id, ts,
               CAST(floor(value * 100) AS BIGINT) AS v2
        FROM events
    ),
    w AS (
        SELECT event_id, user_id,
               -- "trailing" is a DuckDB reserved word (TRIM syntax)
               count(*) OVER w_new AS n1, sum(v2) OVER w_new AS s1,
               count(*) OVER w_old AS n0, sum(v2) OVER w_old AS s0
        FROM q
        WINDOW w_new AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
               w_old AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 19 PRECEDING AND 10 PRECEDING)
    )
    SELECT event_id, user_id,
           CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
           CASE WHEN n0 > 0 THEN
               CAST(s1 AS DOUBLE) / n1 / 100.0
             - CAST(s0 AS DOUBLE) / n0 / 100.0
           END AS mean_shift,
           CASE WHEN n0 > 0 THEN
               abs(n0 * s1 - n1 * s0) > 50 * 100 * n0 * n1
           END AS is_shift
    FROM w
    """,
)
def events_changepoint_meanshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-shift CHANGEPOINT detection — the two-sample sliding test
    behind level-shift alerting: at each event, compare the mean of the
    user's 10 most recent observations against the mean of the 10
    before those; flag when the level moved by more than 50.0. The
    FLAG is decided entirely in exact integer arithmetic — the
    threshold test |s1/n1 − s0/n0| > thr cross-multiplies to
    |n0·s1 − n1·s0| > thr·n0·n1 (all BIGINT on 1e-2-quantized values,
    magnitudes ≪ 2^53), so the boolean cannot ulp-flip; the reported
    shift magnitude is two exact-integer divisions, bit-equal by
    construction (E20's discipline). Warm-up rows with an empty
    trailing window yield NULLs under an ANSI-safe guard.

    Scale: one shuffle on user_id; BOTH frames share the same ordered
    per-user pass (Spark plans one Window operator when partition and
    ordering agree) — per-user parallel at any corpus size, no
    iterative state (CUSUM-style recursions don't decompose into
    window frames; the two-sample form is the scan-friendly spelling)."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100).cast("bigint").alias("v2"),
    )
    recent = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    trailing = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, -10)
    )
    w = q.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(recent).alias("n1"),
        F.sum("v2").over(recent).alias("s1"),
        F.count(F.lit(1)).over(trailing).alias("n0"),
        F.sum("v2").over(trailing).alias("s0"),
    )
    has_base = F.col("n0") > 0
    shift = (
        F.col("s1").cast("double") / F.col("n1") / F.lit(100.0)
        - F.col("s0").cast("double") / F.col("n0") / F.lit(100.0)
    )
    flag = (
        F.abs(F.col("n0") * F.col("s1") - F.col("n1") * F.col("s0"))
        > F.lit(50 * 100) * F.col("n0") * F.col("n1")
    )
    return w.select(
        "event_id",
        "user_id",
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n0").cast("bigint").alias("n0"),
        F.when(has_base, shift).alias("mean_shift"),
        F.when(has_base, flag).alias("is_shift"),
    )
