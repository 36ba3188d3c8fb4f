"""Corpus quality-control operators (SURVEY.md §2.11 extension): the
filter/QC stage every production LLM-data pipeline runs between raw
ingest and training — sub-document exact dedup (the C4 recipe operates
on paragraphs; this corpus's single-line docs are windowed into fixed
passages instead), within-document repetition filtering (the Gopher
repetition rules), document-level heuristic quality gates (the Gopher
quality rules), and a one-pass data-quality profile (the
expectation-check primitive for any table entering the pipeline).

Scale posture (100 TB):

* ``dedup_passage`` is the dedup_cross_source shape one level down:
  explode docs into passages (narrow, in-row), one hash aggregation on
  the passage fingerprint with an in-aggregate arg-min — a single
  shuffle keyed by content hash, no window, no pairwise work;
* ``text_repetition_ngram`` and ``text_gopher_quality`` are pure
  narrow per-row expressions (zero shuffle — they fuse into the scan at
  any corpus size); the n-gram work is in-row HOF arithmetic, never a
  corpus-wide shingle explode;
* ``dq_profile`` computes every column's null/distinct/min/max in ONE
  scan (multi-aggregate), then unpivots the single result row — the
  count(DISTINCT) columns expand via Catalyst's EXPAND (one shuffle),
  which beats per-column scans 6:1 at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

PASSAGE_TOKENS = 32  # fixed passage window for sub-document dedup


@query(
    "dedup_passage",
    oracle=f"""
    SELECT md5(ptext) AS passage_hash,
           count(*) AS n_copies,
           -- in-aggregate arg-min on an encoded (doc_id, pidx) pair:
           -- pidx < 1000 always (553-char docs), so the encoding is a
           -- total order identical to the struct-min Spark computes
           CAST(min(doc_id * 1000 + pidx) // 1000 AS BIGINT) AS keep_doc,
           CAST(min(doc_id * 1000 + pidx) % 1000 AS BIGINT) AS keep_idx
    FROM (SELECT doc_id, s // {PASSAGE_TOKENS} AS pidx,
                 array_to_string(
                     list_slice(toks, s + 1, s + {PASSAGE_TOKENS}), ' ') AS ptext
          FROM (SELECT doc_id, string_split(text, ' ') AS toks,
                       unnest(range(0, len(string_split(text, ' ')),
                                    {PASSAGE_TOKENS})) AS s
                FROM documents))
    GROUP BY md5(ptext)
    HAVING count(*) > 1
    """,
)
def dedup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup (C4-style): documents are windowed into
    fixed 32-token passages, each passage is fingerprinted, and every
    fingerprint seen more than once reports its copy count plus the
    canonical keeper (lowest (doc_id, passage_idx)). Boilerplate that
    repeats across documents — headers, footers, license blocks — is
    exactly what this catches and document-level dedup cannot.

    Plan: narrow in-row passage explode → ONE hash aggregation on the
    content hash with an in-aggregate ``min(struct(...))`` arg-min (the
    dedup_cross_source discipline: no window, no second shuffle, no
    pairwise work) → linear in corpus size at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    passages = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(PASSAGE_TOKENS)),
        lambda s: F.struct(
            (s / PASSAGE_TOKENS).cast("bigint").alias("pidx"),
            F.array_join(F.slice(toks, s + 1, PASSAGE_TOKENS), " ").alias("ptext"),
        ),
    )
    exploded = d.select("doc_id", F.explode(passages).alias("p")).select(
        "doc_id", F.col("p.pidx").alias("pidx"), F.col("p.ptext").alias("ptext")
    )
    return (
        exploded.groupBy(F.md5(F.col("ptext")).alias("passage_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min(F.struct("doc_id", "pidx")).alias("keeper"),
        )
        .where(F.col("n_copies") > 1)
        .select(
            "passage_hash",
            "n_copies",
            F.col("keeper.doc_id").alias("keep_doc"),
            F.col("keeper.pidx").alias("keep_idx"),
        )
    )


@query(
    "text_repetition_ngram",
    oracle="""
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_ngrams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           -- exact-int division: identical IEEE result on both engines;
           -- short docs (< 3 tokens) have zero n-grams -> 0.0 by CASE
           CASE WHEN len(grams) = 0 THEN 0.0e0
                ELSE 1e0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                           / CAST(len(grams) AS DOUBLE) END AS dup_frac,
           CASE WHEN len(grams) > 0
                 AND 1e0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                           / CAST(len(grams) AS DOUBLE) > 0.2
                THEN 1 ELSE 0 END AS flagged
    FROM (SELECT doc_id,
                 list_transform(
                     range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                     i -> string_split(text, ' ')[i] || ' ' ||
                          string_split(text, ' ')[i + 1] || ' ' ||
                          string_split(text, ' ')[i + 2]) AS grams
          FROM documents)
    """,
)
def text_repetition_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition filter (the Gopher "duplicate n-grams"
    rule): per document, the fraction of word 3-grams that are repeats
    (1 − distinct/total); documents above 20% duplicate trigrams are
    flagged — the template-spam / stuck-decoder signature that document-
    LEVEL dedup never sees. Pure narrow in-row expression (shingle array
    + array_distinct), zero shuffle: fuses into the corpus scan at any
    size. The dup fraction divides two exact ints → bit-identical across
    engines; sub-3-token docs have zero n-grams and score 0.0 under an
    ANSI-safe guard (the _shingle_idx discipline from llm_text)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    idx = F.when(n >= 3, F.sequence(F.lit(0), n - 3)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2),
            F.element_at(toks, i + 3)
        ),
    )
    n_ngrams = F.size(grams).cast("bigint")
    n_distinct = F.size(F.array_distinct(grams)).cast("bigint")
    dup_frac = F.when(n_ngrams == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - n_distinct.cast("double") / n_ngrams.cast("double")
    )
    return d.select(
        "doc_id",
        n_ngrams.alias("n_ngrams"),
        n_distinct.alias("n_distinct"),
        dup_frac.alias("dup_frac"),
        F.when(dup_frac > 0.2, F.lit(1)).otherwise(F.lit(0)).alias("flagged"),
    )


@query(
    "text_gopher_quality",
    oracle="""
    SELECT doc_id, nw AS n_words,
           mean_wl,
           CAST(sh AS BIGINT) AS stop_hits,
           CASE WHEN nw BETWEEN 40 AND 80
                 AND mean_wl >= 4.2 AND mean_wl <= 4.8
                 AND sh >= 2 THEN 1 ELSE 0 END AS keep
    FROM (SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
                 -- sum of word lengths = chars - separators: exact ints,
                 -- one identical division -> bit-stable double
                 CAST(length(text) - len(string_split(text, ' ')) + 1
                      AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_wl,
                 len(list_filter(string_split(text, ' '),
                                 t -> t IN ('the', 'a'))) AS sh
          FROM documents)
    """,
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality gate, per document: word count in
    [40, 80], mean word length in [4.2, 4.8], and at least two stopword
    hits ('the'/'a' — this corpus's function words). Each rule's raw
    statistic is emitted alongside the keep decision so downstream can
    re-threshold without recomputation. All-narrow expression pipeline,
    zero shuffle. Mean word length avoids a per-word aggregate entirely:
    sum(word lengths) = length(text) − (n−1) separators — exact integer
    arithmetic and one identical IEEE division on both engines (the
    threshold literals compare identical doubles, so the boundary cannot
    flip cross-engine)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    nw = F.size(toks).cast("bigint")
    mean_wl = (F.length("text") - F.size(toks) + 1).cast("double") / F.size(
        toks
    ).cast("double")
    sh = F.size(F.filter(toks, lambda t: t.isin("the", "a"))).cast("bigint")
    keep = (
        nw.between(40, 80) & (mean_wl >= 4.2) & (mean_wl <= 4.8) & (sh >= 2)
    )
    return d.select(
        "doc_id",
        nw.alias("n_words"),
        mean_wl.alias("mean_wl"),
        sh.alias("stop_hits"),
        F.when(keep, F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    )


_DQ_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

# Columns that are DOUBLE: stringifying the raw double is engine-renderer
# territory (Spark switches to scientific notation at ≥1e7, DuckDB never
# does — ADVICE r10 item 1), so doubles render through the repo's measured
# fixed-point rule instead: quantize to BIGINT cents (`round(x*100)` is
# cross-engine exact for 2-decimal money columns, see operators/tpch.py),
# then BUILD the decimal string from the integer — quotient '.' zero-padded
# remainder — which is renderer-independent by construction. Valid for the
# non-negative money domain (o_totalprice > 0 at every SF).
_DQ_DOUBLE_COLS = {"o_totalprice"}


def _dq_minmax_sql(c: str, fn: str, intdiv: str, strtype: str = "VARCHAR") -> str:
    """min/max rendered as a stable string; `intdiv` is the engine's
    integer-division spelling ('//' DuckDB, 'div' Spark) and `strtype`
    its string cast-type name ('VARCHAR' DuckDB, 'STRING' Spark)."""
    if c in _DQ_DOUBLE_COLS:
        cents = f"CAST(round({fn}({c}) * 100) AS BIGINT)"
        return (
            f"concat(CAST(({cents}) {intdiv} 100 AS {strtype}), '.', "
            f"lpad(CAST(({cents}) % 100 AS {strtype}), 2, '0'))"
        )
    return f"CAST({fn}({c}) AS {strtype})"


@query(
    "dq_profile",
    oracle="""
    SELECT * FROM (
    """
    + "\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS column_name,
               count(*) - count({c}) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               {_dq_minmax_sql(c, 'min', '//')} AS min_val,
               {_dq_minmax_sql(c, 'max', '//')} AS max_val
        FROM orders
        """
        for c in _DQ_COLS
    )
    + """
    ) ORDER BY column_name
    """,
)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality profile of the orders table: per column,
    null count, exact distinct count, and min/max (stringified so the
    unpivoted rows share one type) — the expectation-check primitive a
    pipeline runs before accepting an input drop.

    Plan shape is the point: ALL six columns' aggregates compute in ONE
    scan — Catalyst plans the multi-count(DISTINCT) via a single EXPAND
    + two-phase aggregate — and the 1×24 result row is unpivoted
    driver-side-free with stack(). The oracle spells the same profile as
    six scalar scans (DuckDB has no EXPAND), which is exactly the 6:1
    scan amplification the Spark shape avoids at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _DQ_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.expr(_dq_minmax_sql(c, "min", "div", "STRING")).alias(f"{c}__mn"),
            F.expr(_dq_minmax_sql(c, "max", "div", "STRING")).alias(f"{c}__mx"),
        ]
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in _DQ_COLS
    )
    return one.selectExpr(
        f"stack({len(_DQ_COLS)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_val, max_val)"
    ).orderBy("column_name")


# md5 → 16-bit int (the corpus_sample_stratified device: first 4 hex chars
# folded positionally — DuckDB lacks conv(); strpos over the hex alphabet
# is its exact twin). Weight ∈ [-1000, 1000] derived from the hash.
_W_MOD = 2001


def _tok_weight_spark(col):
    h16 = F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("long")
    return (h16 % _W_MOD) - 1000


_W_SQL = """
    ((strpos('0123456789abcdef', substr(md5({t}), 1, 1)) - 1) * 4096
     + (strpos('0123456789abcdef', substr(md5({t}), 2, 1)) - 1) * 256
     + (strpos('0123456789abcdef', substr(md5({t}), 3, 1)) - 1) * 16
     + (strpos('0123456789abcdef', substr(md5({t}), 4, 1)) - 1)) % 2001 - 1000
"""


@query(
    "text_classifier_score",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id, unnest(list_concat(toks,
                   list_transform(range(1, len(toks)),
                                  i -> toks[i] || '_' || toks[i + 1]))) AS f
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
              FROM documents)
    ),
    scored AS (
        SELECT doc_id,
               CAST(sum({_W_SQL.format(t="f")}) AS BIGINT) AS sum_w,
               count(*) AS n_feat
        FROM feats
        GROUP BY doc_id
    )
    SELECT doc_id, n_feat, sum_w,
           CAST(sum_w AS DOUBLE) / n_feat AS score,
           (CAST(sum_w AS DOUBLE) / n_feat) > CAST(0 AS DOUBLE) AS keep
    FROM scored
    """,
)
def text_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature LINEAR CLASSIFIER scoring (L19) — the
    fastText/CCNet-style quality-filter shape: φ(doc) = bag of word
    unigrams + bigrams hashed into a weight table, score = w·φ / |φ|,
    keep = score > 0. The weight table here is a deterministic function
    of the feature hash (md5 16-bit fold → [-1000, 1000]) standing in
    for trained parameters — in production the same plan broadcasts a
    trained vector; the hash-lookup/score/threshold machinery under
    H-check is identical either way. Exact arithmetic: integer weight
    sums, ONE double division, threshold on the shared result — no
    rounding anywhere.

    Scale: explode features → hash → per-doc sum is one shuffle keyed
    by doc_id over the token stream (codegen'd md5, no Python); at
    100 TB this is the canonical classifier-filter pass, embarrassingly
    parallel, with the model broadcast."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    # bigrams via slice+zip_with: inherently empty-safe for 1-token docs
    # (no sequence(1,0) descent, no out-of-bounds index to guard)
    n1 = F.greatest(F.size("toks") - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice("toks", 1, n1),
        F.slice("toks", 2, n1),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )
    feats = d.select("doc_id", toks.alias("toks")).select(
        "doc_id", F.explode(F.concat(F.col("toks"), bigrams)).alias("f")
    )
    scored = feats.groupBy("doc_id").agg(
        F.sum(_tok_weight_spark(F.col("f"))).cast("bigint").alias("sum_w"),
        F.count(F.lit(1)).alias("n_feat"),
    )
    score = F.col("sum_w").cast("double") / F.col("n_feat")
    return scored.select(
        "doc_id", "n_feat", "sum_w",
        score.alias("score"),
        (score > F.lit(0.0)).alias("keep"),
    )


@query(
    "dq_expectations",
    oracle="""
    WITH m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_rows,
               CAST(count(o_custkey) AS DOUBLE) / count(*) AS completeness,
               CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*)
                   AS uniqueness,
               CAST(min(o_totalprice) AS DOUBLE) AS min_price,
               CAST(count(*) FILTER (o_orderstatus NOT IN ('F', 'O', 'P'))
                    AS DOUBLE) AS bad_status,
               CAST(count(*) FILTER (o_orderdate < DATE '1992-01-01'
                                     OR o_orderdate >= DATE '1999-01-01')
                    AS DOUBLE) AS bad_dates
        FROM orders
    )
    SELECT c.name AS expectation, c.observed, c.passed FROM m,
    LATERAL (VALUES
        ('completeness_custkey', m.completeness, m.completeness = 1.0),
        ('uniqueness_orderkey', m.uniqueness, m.uniqueness = 1.0),
        ('min_price_positive', m.min_price, m.min_price > 0),
        ('status_in_domain', m.bad_status, m.bad_status = 0),
        ('dates_in_range', m.bad_dates, m.bad_dates = 0),
        ('non_empty', m.n_rows, m.n_rows > 0)
    ) c(name, observed, passed)
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style EXPECTATION SUITE (T12 family, beside T9's profile):
    declarative constraints — completeness, key uniqueness, value
    bounds, categorical domain, date range, non-emptiness — verified in
    ONE aggregation pass and emitted as (expectation, observed, passed)
    rows, the contract gate a production ingest runs before publishing
    a partition. All observations are exact (counts and one min — no
    float summation), so the oracle replays them bit-for-bit; the
    passed flags make regressions loud (any constraint flip fails the
    hash). Scale: a single map-side-combinable agg over the table —
    adding expectations adds accumulators, not passes; the
    count(DISTINCT) is the one shuffle-bearing term (exact by
    requirement here; A10's sketches are the billion-key relaxation)."""
    o = load_table(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).cast("double").alias("n_rows"),
        (F.count("o_custkey").cast("double") / F.count(F.lit(1))).alias(
            "completeness"
        ),
        (
            F.countDistinct("o_orderkey").cast("double") / F.count(F.lit(1))
        ).alias("uniqueness"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.count_if(
            ~F.col("o_orderstatus").isin("F", "O", "P")
        ).cast("double").alias("bad_status"),
        F.count_if(
            (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
            | (F.col("o_orderdate") >= F.lit("1999-01-01").cast("date"))
        ).cast("double").alias("bad_dates"),
    )
    rows = [
        ("completeness_custkey", F.col("completeness"), F.col("completeness") == 1.0),
        ("uniqueness_orderkey", F.col("uniqueness"), F.col("uniqueness") == 1.0),
        ("min_price_positive", F.col("min_price"), F.col("min_price") > 0),
        ("status_in_domain", F.col("bad_status"), F.col("bad_status") == 0),
        ("dates_in_range", F.col("bad_dates"), F.col("bad_dates") == 0),
        ("non_empty", F.col("n_rows"), F.col("n_rows") > 0),
    ]
    checks = F.array(
        *[
            F.struct(
                F.lit(name).alias("expectation"),
                obs.alias("observed"),
                passed.alias("passed"),
            )
            for name, obs, passed in rows
        ]
    )
    return (
        m.select(F.explode(checks).alias("c"))
        .select("c.expectation", "c.observed", "c.passed")
    )
