"""Nested-type operators: array / map / struct / JSON / vector
(SURVEY.md §2.7, N1–N6).

All array work uses Spark's higher-order functions (``transform`` /
``aggregate`` / ``zip_with``) — these execute inside codegen on the JVM, no
Python boundary, so per-row vector math over 100 TB of embeddings stays in
the scan pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "array_ops",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS first5,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS vocab
    FROM documents
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # slice/distinct/sort are the operators under test; the H-checked output
    # serializes the arrays to strings (driver canonicalizer crashes on raw
    # array columns — r1 FAIL).
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("first5"),
        F.array_join(F.sort_array(F.array_distinct(toks)), " ").alias("vocab"),
    )


@query(
    "array_explode",
    oracle="""
    SELECT token, count(*) AS n, min(pos) AS min_pos
    FROM (SELECT unnest(string_split(text, ' ')) AS token,
                 unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
          FROM documents)
    GROUP BY token
    """,
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count via posexplode (1-based positions to match SQL)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "token"))
        .select("token", (F.col("pos0") + 1).alias("pos"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"), F.min("pos").alias("min_pos"))
    )


@query(
    "map_ops",
    oracle="""
    SELECT doc_id,
           'lang,source' AS meta_keys,
           lang AS lang_val,
           2 AS n_entries
    FROM documents
    """,
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map, list its keys, look up a value, count entries. The
    oracle states the expected *outputs* directly (DuckDB's MAP extract
    returns LIST, not scalar — not portably comparable), so the H-check
    still validates every map operation's result. map_keys is serialized
    to a string (no ArrayType may leave an H-checked projection — the
    driver canonicalizer crashes on raw arrays)."""
    d = load_table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.array_join(F.map_keys(m), ",").alias("meta_keys"),
        m.getItem("lang").alias("lang_val"),
        F.size(m).alias("n_entries"),
    )


@query(
    "struct_ops",
    oracle="""
    SELECT doc_id, s.lang AS s_lang, s.source AS s_source, s.n AS s_n
    FROM (SELECT doc_id,
                 struct_pack(lang := lang, source := source, n := n_chars) AS s
          FROM documents)
    """,
)
def struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    nested = d.select(
        "doc_id",
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n"),
        ).alias("s"),
    )
    # field access + star-expansion
    return nested.select(
        "doc_id",
        F.col("s.lang").alias("s_lang"),
        F.col("s.source").alias("s_source"),
        F.col("s.n").alias("s_n"),
    )


@query(
    "json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           -- outer CAST: DuckDB sum(BIGINT) is HUGEINT, which the driver's
           -- fetchdf() renders as float64 while Spark emits int64 (r2 FAIL)
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "json_variant",
    oracle="""
    -- k_bucket/sum_k are DOUBLE on both engines: whenever any event's
    -- props lacks '$.k' they are NULL-bearing BIGINTs, and the driver's
    -- pandas fetchdf coerces those to float64 — the same DATA-dependent
    -- contract hazard the r6 outer-join recontract fixed (whether NULLs
    -- exist varies by scale factor / regenerated data, so the cast must
    -- not wait for a corpus that trips it).
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
                AS DOUBLE) AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
               AS sum_k,
           count(*) FILTER (WHERE json_extract_string(props, '$.missing')
                            IS NOT NULL) AS n_missing_present
    FROM events
    GROUP BY 1
    """,
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the Spark 4 VARIANT type — the
    modern engine path for JSON columns (parse once into a binary
    variant; typed `variant_get` access afterward, no per-access string
    re-parse as with `get_json_object`, and the encoding is the substrate
    for shredded-variant pushdown at warehouse scale). `try_variant_get`
    on an absent path documents the NULL (not error) contract; the
    oracle recomputes everything with DuckDB's JSON functions."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.missing", "bigint")
    return (
        ev.select(k.alias("k"), missing.alias("m"))
        .groupBy((F.col("k") % 10).cast("double").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("double").alias("sum_k"),
            F.count("m").alias("n_missing_present"),
        )
    )


@query(
    "vector_ops",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                       list_transform(embedding, x -> CAST(x AS DOUBLE)))),
                 4) AS l2_norm,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS el_sum,
           CAST(list_max(embedding) AS DOUBLE) AS el_max
    FROM embeddings
    """,
)
def vector_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elementwise vector math via higher-order functions (JVM-side)."""
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot_self = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    el_sum = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(dot_self), 4).alias("l2_norm"),
        F.round(el_sum, 4).alias("el_sum"),
        F.array_max(vec).alias("el_max"),
    )


@query(
    "array_hof_predicates",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(toks, t -> len(t) >= 6)) AS BIGINT)
               AS n_long,
           len(list_filter(toks, t -> len(t) >= 6)) > 0 AS has_long,
           len(list_filter(toks, t -> NOT (len(t) > 0))) = 0
               AS all_nonempty,
           CAST(list_sum(list_transform(toks, t -> len(t))) AS BIGINT)
               AS sum_len
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
)
def array_hof_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate/fold higher-order functions (N8): ``filter``,
    ``exists``, ``forall``, ``reduce`` — the in-row set-logic quartet N6
    (transform/aggregate/zip_with) doesn't touch; together they close
    the array-HOF surface. All four run per-row inside the scan
    pipeline (zero shuffle, no explode — the explode+groupBy spelling
    of the same counts shuffles the full token stream). Oracle note:
    DuckDB's ``list_reduce`` has no init value and ERRORS on empty
    lists, so the fold's oracle twin is the semantically-equal
    ``list_sum(list_transform(...))`` while the Spark side exercises
    the real ``F.reduce`` (init 0, empty-safe); exists/forall are
    spelled as list_filter emptiness checks (DuckDB has no direct
    quantifiers). BIGINT casts on both sides (len() is int32-ish in
    DuckDB, size() int32 in Spark)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) >= 6))
        .cast("bigint")
        .alias("n_long"),
        F.exists(toks, lambda t: F.length(t) >= 6).alias("has_long"),
        F.forall(toks, lambda t: F.length(t) > 0).alias("all_nonempty"),
        F.reduce(
            toks, F.lit(0), lambda acc, t: acc + F.length(t)
        )
        .cast("bigint")
        .alias("sum_len"),
    )


@query(
    "map_hof",
    oracle="""
    SELECT doc_id,
           n_chars * 2 AS chars_doubled,
           CAST((CASE WHEN n_chars > 100 THEN 1 ELSE 0 END)
              + (CASE WHEN len(string_split(text, ' ')) > 100
                      THEN 1 ELSE 0 END) AS INTEGER) AS n_large,
           n_chars + len(string_split(text, ' ')) AS zipped_total,
           'chars,words' AS keys_csv
    FROM documents
    """,
)
def map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map HIGHER-ORDER functions (N9) — the lambda surface over MapType
    that N3's map_ops (build/keys/lookup/size) leaves untouched:
    ``transform_values`` (rescale every entry), ``map_filter`` (drop
    entries by predicate), ``map_zip_with`` (key-aligned merge of two
    maps — THE shape for merging per-entity feature maps without
    exploding), and a ``map_from_entries``/``map_entries`` round trip
    feeding the key list. DuckDB's map lambdas aren't comparable
    entry-wise through fetchdf, so (the map_ops convention) the oracle
    states the expected SCALAR outcomes relationally and the H-check
    pins each HOF's result: doubled lookup = n_chars*2, filter
    survivor count via CASE arithmetic, zip-merged total = sum of both
    metrics. All lambdas run on the JVM (interpreted HOF path, no
    Python); per-row maps here are 2 entries, so the non-codegen HOF
    cost is bounded by a constant per row at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    m = F.create_map(
        F.lit("chars"), F.col("n_chars").cast("bigint"),
        F.lit("words"), F.size(toks).cast("bigint"),
    )
    m2 = F.map_from_entries(
        F.array(
            F.struct(F.lit("chars").alias("k"), F.lit(0).cast("bigint").alias("v")),
            F.struct(F.lit("words").alias("k"), F.lit(0).cast("bigint").alias("v")),
        )
    )
    doubled = F.transform_values(m, lambda k, v: v * 2)
    large = F.map_filter(m, lambda k, v: v > 100)
    zipped = F.map_zip_with(m, m2, lambda k, v1, v2: v1 + v2)
    return d.select(
        "doc_id",
        doubled.getItem("chars").alias("chars_doubled"),
        F.size(large).alias("n_large"),
        (
            zipped.getItem("chars") + zipped.getItem("words")
        ).alias("zipped_total"),
        F.array_join(F.map_keys(m2), ",").alias("keys_csv"),
    )


@query(
    "json_construct",
    oracle="""
    WITH built AS (
        SELECT o_orderkey,
               -- CAST: DuckDB to_json returns the JSON type, which
               -- fetchdf() mangles — the driver needs VARCHAR
               CAST(to_json(struct_pack(
                   k := o_orderkey,
                   status := o_orderstatus,
                   cents := CAST(round(o_totalprice * 100) AS BIGINT)
               )) AS VARCHAR) AS j
        FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT o_orderkey, j,
           CAST(json_extract_string(j, '$.k') AS BIGINT) AS k_back,
           json_extract_string(j, '$.status') AS status_back,
           CAST(json_extract_string(j, '$.cents') AS BIGINT) AS cents_back
    FROM built
    """,
)
def json_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON CONSTRUCTION + round-trip (N10) — the write side N5/N7 don't
    cover: `to_json(struct(...))` serializes typed columns into the JSON
    payload an event bus or API sink expects, then the same row extracts
    the fields back out (`get_json_object`), pinning both directions.
    The serialized string itself is H-checked BYTE-FOR-BYTE against
    DuckDB's `to_json(struct_pack(...))` — measured identical formatting
    (no spaces, same escaping) for int/string/array payloads; doubles
    and timestamps are deliberately excluded (their text renderings
    differ cross-engine — exact-cents BIGINT carries the money field).

    Scale: narrow row-local codegen expressions riding the scan."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 == 0)
    built = o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("status"),
                F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            )
        ).alias("j"),
    )
    return built.select(
        "o_orderkey",
        "j",
        F.get_json_object("j", "$.k").cast("bigint").alias("k_back"),
        F.get_json_object("j", "$.status").alias("status_back"),
        F.get_json_object("j", "$.cents").cast("bigint").alias("cents_back"),
    )


@query(
    "array_edit_ops",
    oracle="""
    SELECT c_custkey,
           array_to_string([c_custkey % 5, 99, c_custkey % 7], ',')
               AS inserted,
           array_to_string([c_custkey % 5, c_custkey % 7, 42], ',')
               AS appended,
           array_to_string([7, c_custkey % 5, c_custkey % 7], ',')
               AS prepended,
           array_to_string([c_custkey % 5, c_custkey % 7], ',')
               AS compacted,
           -- coalesce: DuckDB array_to_string([]) is NULL, Spark
           -- array_join([]) is '' (hit when custkey%5 = custkey%7 = 3)
           coalesce(array_to_string(
               list_filter([c_custkey % 5, c_custkey % 7, 3],
                           x -> x <> 3), ','), '') AS removed
    FROM customer
    """,
)
def array_edit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array EDITING surface (N11, Spark 3.4/3.5): `array_insert`
    (position insert), `array_append`/`array_prepend`, `array_compact`
    (NULL removal), `array_remove` (remove-all-equal) — the in-row
    mutation family N1's read-side ops don't touch. The oracle states
    the EXPECTED arrays relationally (list literals / list_filter) from
    the same base values, so each Spark function's semantics — insert
    position, remove-all (not remove-first), compact dropping only
    NULLs — is pinned independently. Arrays stringified for the hash
    (element order is part of the contract; the driver's canonicalizer
    shouldn't have to guess list compare rules).

    Scale: narrow row-local expressions riding the scan."""
    c = load_table(spark, sf_dir, "customer")
    a = F.col("c_custkey") % 5
    b = F.col("c_custkey") % 7
    base = F.array(a, b)

    def s(arr):
        return F.array_join(F.transform(arr, lambda x: x.cast("string")), ",")

    return c.select(
        "c_custkey",
        s(F.array_insert(base, 2, F.lit(99))).alias("inserted"),
        s(F.array_append(base, F.lit(42))).alias("appended"),
        s(F.array_prepend(base, F.lit(7))).alias("prepended"),
        s(F.array_compact(F.array(a, F.lit(None), b))).alias("compacted"),
        s(F.array_remove(F.array(a, b, F.lit(3)), 3)).alias("removed"),
    )


@query(
    "array_explode_outer",
    oracle="""
    WITH src AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'P' THEN NULL
                    WHEN o_orderkey % 3 = 0 THEN []
                    ELSE string_split(o_orderpriority, '-') END AS parts
        FROM orders
    ),
    ex AS (
        SELECT o_orderkey, u.part FROM src,
        LATERAL (SELECT unnest(
            CASE WHEN parts IS NULL OR len(parts) = 0
                 THEN [NULL] ELSE parts END) AS part) u
    )
    SELECT o_orderkey, part,
           CAST(count(*) OVER (PARTITION BY o_orderkey) AS BIGINT)
               AS n_rows_for_key
    FROM ex
    """,
)
def array_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer`` row-preservation semantics (N12): plain explode
    DROPS rows whose array is NULL or empty — silently losing the
    parent row from any later join — while the outer variant emits one
    NULL row for them. The source plants BOTH degenerate classes (NULL
    arrays for status P, empty arrays for every third key), so the
    hash pins exactly the rows a bare explode would destroy; DuckDB has
    no outer unnest, so the oracle spells the same semantics with a
    CASE-to-[NULL] rewrite. The per-key row count rides along to pin
    multiplicity (split rows for normal keys, exactly one for
    degenerate ones)."""
    o = load_table(spark, sf_dir, "orders")
    src = o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .when(F.col("o_orderkey") % 3 == 0, F.array().cast("array<string>"))
        .otherwise(F.split("o_orderpriority", "-"))
        .alias("parts"),
    )
    ex = src.select(
        "o_orderkey", F.explode_outer("parts").alias("part")
    )
    w = Window.partitionBy("o_orderkey")
    return ex.select(
        "o_orderkey",
        "part",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_rows_for_key"),
    )


@query(
    "generator_functions",
    oracle="""
    SELECT p_partkey, 'posexplode' AS gen, 'elem' AS label,
           CAST(generate_subscripts(
               [p_size, p_size * 2, p_partkey % 10], 1) AS BIGINT) AS pos,
           CAST(unnest([p_size, p_size * 2, p_partkey % 10])
               AS BIGINT) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'inline', 'size', 1, CAST(p_size AS BIGINT)
    FROM part
    UNION ALL
    SELECT p_partkey, 'inline', 'bucket', 2, CAST(p_partkey % 10 AS BIGINT)
    FROM part
    UNION ALL
    SELECT p_partkey, 'stack', 'size', 1, CAST(p_size AS BIGINT)
    FROM part
    UNION ALL
    SELECT p_partkey, 'stack', 'bucket', 2, CAST(p_partkey % 10 AS BIGINT)
    FROM part
    UNION ALL
    SELECT p_partkey, 'sequence', 'seq', CAST(u AS BIGINT), CAST(u AS BIGINT)
    FROM part, unnest(range(1, p_partkey % 3 + 2)) AS t(u)
    """,
)
def generator_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-GENERATOR family in one key (N13, VERDICT r13 item 6):
    ``posexplode`` (explode with ordinality), ``inline`` (struct-array
    to columns), ``stack`` (columns to rows — the generator spelling of
    unpivot), and ``sequence``-as-generator, each emitting into a
    uniform (gen, label, pos, val) shape so every generator's
    multiplicity, ordering, and payload are pinned in one hash. The
    oracle replays posexplode with DuckDB's zipped
    ``generate_subscripts``+``unnest`` (1-based, so the Spark side
    shifts its 0-based pos), inline/stack as their row-expansion
    UNION ALL definitions, and the sequence generator as a lateral
    ``unnest(range(...))`` (ascending by construction — start 1 <= stop
    p%3+1 — per the CLAUDE.md descending-sequence ANSI gotcha).

    Scale: all four are row-local expansions riding the scan — no
    shuffle; output volume is input x small constant, the same shape as
    N2's explode."""
    p = load_table(spark, sf_dir, "part")
    arr = F.array(
        F.col("p_size").cast("long"),
        (F.col("p_size") * 2).cast("long"),
        (F.col("p_partkey") % 10).cast("long"),
    )
    pos_exploded = p.select(
        "p_partkey",
        F.lit("posexplode").alias("gen"),
        F.lit("elem").alias("label"),
        F.posexplode(arr).alias("pos0", "val"),
    ).select(
        "p_partkey", "gen", "label",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.col("val").cast("bigint").alias("val"),
    )
    inlined = p.select(
        "p_partkey",
        F.lit("inline").alias("gen"),
        F.inline(
            F.array(
                F.struct(
                    F.lit("size").alias("label"),
                    F.lit(1).cast("bigint").alias("pos"),
                    F.col("p_size").cast("bigint").alias("val"),
                ),
                F.struct(
                    F.lit("bucket").alias("label"),
                    F.lit(2).cast("bigint").alias("pos"),
                    (F.col("p_partkey") % 10).cast("bigint").alias("val"),
                ),
            )
        ),
    ).select("p_partkey", "gen", "label", "pos", "val")
    stacked = p.selectExpr(
        "p_partkey",
        "'stack' AS gen",
        """stack(2,
                 'size', CAST(1 AS BIGINT), CAST(p_size AS BIGINT),
                 'bucket', CAST(2 AS BIGINT), CAST(p_partkey % 10 AS BIGINT)
           ) AS (label, pos, val)""",
    ).select("p_partkey", "gen", "label", "pos", "val")
    seq = p.select(
        "p_partkey",
        F.lit("sequence").alias("gen"),
        F.lit("seq").alias("label"),
        F.explode(
            F.sequence(F.lit(1).cast("long"), (F.col("p_partkey") % 3 + 1))
        ).alias("val"),
    ).select(
        "p_partkey", "gen", "label",
        F.col("val").cast("bigint").alias("pos"),
        F.col("val").cast("bigint").alias("val"),
    )
    return (
        pos_exploded.unionByName(inlined)
        .unionByName(stacked)
        .unionByName(seq)
    )
