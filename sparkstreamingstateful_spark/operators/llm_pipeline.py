"""Training-data pipeline operators (SURVEY.md §2.12): the corpus-shaping
stage between raw documents and a tokenized training set — chunking,
sequence packing, stratified sampling, sensitive-term scrubbing, and
cross-source canonical dedup.

Scale posture: chunking / sampling / scrubbing are narrow per-row
transformations (zero shuffle — they live in the scan pipeline at any
corpus size). Packing needs a running position, which is a per-shard
(here per-``source``) window cumsum — the industry-standard concat-then-
chunk layout packs within a shard precisely so that no global total order
(a single-reducer sort at 100 TB) is ever required. Cross-source dedup is
one hash aggregation on the content fingerprint with an in-aggregate
arg-min (``min(struct(...))``) — no window, no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

CHUNK_TOKENS = 64  # chunk length
CHUNK_STRIDE = 56  # stride (8-token overlap)
PACK_TOKENS = 2048  # training context window for packing


@query(
    "doc_chunking",
    oracle=f"""
    SELECT doc_id,
           s // {CHUNK_STRIDE} AS chunk_id,
           array_to_string(list_slice(toks, s + 1, s + {CHUNK_TOKENS}), ' ') AS chunk_text,
           len(list_slice(toks, s + 1, s + {CHUNK_TOKENS})) AS n_chunk_tokens
    FROM (SELECT doc_id, string_split(text, ' ') AS toks,
                 unnest(range(0, len(string_split(text, ' ')), {CHUNK_STRIDE})) AS s
          FROM documents)
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: 64-token chunks every 56 tokens (8-token
    overlap), the pre-tokenization split for long-document training. Pure
    narrow op — explode of an in-row start-position sequence; no shuffle,
    linear at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    chunks = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(CHUNK_STRIDE)),
        lambda s: F.struct(
            (s / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
            F.array_join(F.slice(toks, s + 1, CHUNK_TOKENS), " ").alias("chunk_text"),
            F.size(F.slice(toks, s + 1, CHUNK_TOKENS)).alias("n_chunk_tokens"),
        ),
    )
    return d.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
    )


@query(
    "seq_packing",
    oracle=f"""
    SELECT doc_id, source, n_tokens,
           (cum - n_tokens) // {PACK_TOKENS} AS pack_id,
           (cum - n_tokens) % {PACK_TOKENS} AS pack_offset
    FROM (SELECT doc_id, source,
                 len(string_split(text, ' ')) AS n_tokens,
                 -- CAST: the window sum is HUGEINT, and HUGEINT `//`/`%`
                 -- stay HUGEINT → float64 via the driver's fetchdf()
                 -- while Spark emits int64 (r2 FAIL). Casting `cum` once
                 -- keeps all downstream arithmetic in BIGINT.
                 CAST(sum(len(string_split(text, ' '))) OVER (
                     PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM documents)
    """,
)
def seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing: within each source shard, docs
    (ordered by doc_id) are laid end-to-end and cut into 2048-token
    training windows; each doc records the pack it starts in and its
    offset there. Packing is per-shard by design — a global pack order
    would demand a total-order window (single reducer); per-source
    partitions keep the cumsum parallel at 100 TB exactly like production
    packing packs per input shard. Integer arithmetic only: bit-exact
    across engines."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = d.select("doc_id", "source", n_tokens.alias("n_tokens")).withColumn(
        "cum", F.sum("n_tokens").over(w)
    )
    start = F.col("cum") - F.col("n_tokens")
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(start / PACK_TOKENS).alias("pack_id"),
        (start % PACK_TOKENS).alias("pack_offset"),
    )


# Deterministic content-hash bucket in [0, 100): first 4 hex digits of
# md5(doc_id) — engine-portable (DuckDB lacks conv(); the fold below is its
# exact equivalent). The Spark/Duck expression pairs below are shared by
# corpus_sample_stratified and pipeline_end_to_end so the composed
# pipeline can never drift from the stage operators it composes.


def _bucket_col():
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )


def _rate_col():
    return 20 + (F.substring("source", 4, 8).cast("int") % 8) * 10


_DUCK_BUCKET = """
    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100
"""


@query(
    "corpus_sample_stratified",
    oracle=f"""
    SELECT doc_id, source, lang,
           {_DUCK_BUCKET} AS bucket,
           20 + (CAST(substr(source, 4) AS INTEGER) % 8) * 10 AS rate
    FROM documents
    WHERE {_DUCK_BUCKET} < 20 + (CAST(substr(source, 4) AS INTEGER) % 8) * 10
    """,
)
def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling with per-source rates (20%–90%, derived
    from the source id) and a content-hash bucket — deterministic and
    seed-free, so the sample is reproducible across engines, runs, and
    cluster layouts (unlike rng-based ``sample()``). Narrow op: the
    bucket is computed from md5 in the scan pipeline, zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "source",
            "lang",
            _bucket_col().alias("bucket"),
            _rate_col().alias("rate"),
        )
        .filter(F.col("bucket") < F.col("rate"))
    )


_SCRUB_PATTERN = r"\b(customer|key)\b"  # stand-in sensitive-term lexicon


def _scrub_col():
    return F.regexp_replace(F.col("text"), _SCRUB_PATTERN, "<REDACTED>")


@query(
    "pii_scrub",
    oracle=f"""
    SELECT doc_id,
           md5(regexp_replace(text, '{_SCRUB_PATTERN}', '<REDACTED>', 'g')) AS scrubbed_md5,
           len(regexp_extract_all(text, '{_SCRUB_PATTERN}')) AS n_redactions,
           (len(regexp_extract_all(text, '{_SCRUB_PATTERN}')) = 0) AS clean
    FROM documents
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive-term scrubbing: redact a term lexicon (regexp with word
    boundaries), count redactions, flag already-clean docs. The checked
    output pins md5(scrubbed) so the whole rewritten text is verified
    without shipping long strings through the comparator. Narrow op, zero
    shuffle; a production pass swaps the lexicon for PII regexes
    (emails/phones/ids) — machinery identical."""
    d = load_table(spark, sf_dir, "documents")
    scrubbed = _scrub_col()
    n_red = F.size(F.regexp_extract_all(F.col("text"), F.lit(_SCRUB_PATTERN), 0))
    return d.select(
        "doc_id",
        F.md5(scrubbed).alias("scrubbed_md5"),
        n_red.cast("bigint").alias("n_redactions"),
        (n_red == 0).alias("clean"),
    )


@query(
    "pipeline_end_to_end",
    oracle=f"""
    WITH sampled AS (
        SELECT doc_id, lang, source,
               regexp_replace(text, '{_SCRUB_PATTERN}', '<REDACTED>', 'g') AS text
        FROM documents
        WHERE {_DUCK_BUCKET} < 20 + (CAST(substr(source, 4) AS INTEGER) % 8) * 10
    ),
    quality AS (
        SELECT doc_id, lang, source, text,
               len(string_split(text, ' ')) AS n_tokens
        FROM sampled
        WHERE len(string_split(text, ' ')) BETWEEN 20 AND 200
          AND len(list_filter(string_split(text, ' '),
                              t -> t IN ('a', 'the'))) * 2
              < len(string_split(text, ' '))
    ),
    chunks AS (
        SELECT doc_id, lang, source,
               len(list_slice(string_split(text, ' '),
                              s + 1, s + {CHUNK_TOKENS})) AS n_chunk_tokens
        FROM (SELECT *, unnest(range(0, len(string_split(text, ' ')),
                                     {CHUNK_STRIDE})) AS s
              FROM quality)
    )
    SELECT lang, source,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_chunks,
           -- CAST: HUGEINT sum → float64 via fetchdf (r2 FAIL)
           CAST(sum(n_chunk_tokens) AS BIGINT) AS total_tokens
    FROM chunks
    GROUP BY lang, source
    """,
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data pipeline as ONE composed query: stratified
    sample → sensitive-term scrub → quality filter → sliding-window chunk
    → per-(lang, source) corpus accounting. This is the flagship of the
    §2.12 family: every stage is a narrow transformation until the single
    final aggregation, so Catalyst collapses sample+scrub+filter+chunk
    into one scan pipeline — the whole corpus-shaping pass is one job,
    one shuffle, at any scale."""
    d = load_table(spark, sf_dir, "documents")
    scrubbed = _scrub_col()
    sampled = d.filter(_bucket_col() < _rate_col()).select(
        "doc_id", "lang", "source", scrubbed.alias("text")
    )
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin("a", "the")))
    quality = sampled.filter(n_tokens.between(20, 200) & (n_stop * 2 < n_tokens))
    chunk_lens = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(CHUNK_STRIDE)),
        lambda s: F.size(F.slice(toks, s + 1, CHUNK_TOKENS)),
    )
    chunks = quality.select(
        "doc_id", "lang", "source", F.explode(chunk_lens).alias("n_chunk_tokens")
    )
    return chunks.groupBy("lang", "source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("total_tokens"),
    )


@query(
    "dedup_cross_source",
    oracle="""
    SELECT fp,
           count(*) OVER (PARTITION BY fp) AS n_copies,
           doc_id AS keeper_id,
           source AS keeper_src
    FROM (SELECT doc_id, source,
                 CAST(substr(source, 4) AS INTEGER) AS pri,
                 md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
          FROM documents)
    QUALIFY row_number() OVER (PARTITION BY fp ORDER BY pri, doc_id) = 1
    """,
)
def dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source canonical dedup: group by an order-insensitive content
    fingerprint, keep the copy from the highest-priority source (lowest
    source id, doc_id tie-break). One hash aggregation with an
    in-aggregate arg-min — ``min(struct(pri, doc_id, source))`` orders
    lexicographically by field, so no window sort and no second shuffle;
    this is the scale shape for keep-best-copy dedup at 100 TB (the
    oracle's QUALIFY window is the SQL twin, not the plan)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    fp = F.md5(F.array_join(F.sort_array(F.array_distinct(toks)), " "))
    pri = F.substring("source", 4, 8).cast("int")
    t = d.select(
        "doc_id", "source", pri.alias("pri"), fp.alias("fp")
    )
    agg = t.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min(F.struct("pri", "doc_id", "source")).alias("keep"),
    )
    return agg.select(
        "fp",
        "n_copies",
        F.col("keep.doc_id").alias("keeper_id"),
        F.col("keep.source").alias("keeper_src"),
    )


# ------------------------------------------------- temperature-scaled mixing
_MIX_TAU_NOTE = "tau = 0.5 (sqrt)"  # the common multilingual up-sampling knob


@query(
    "corpus_mix_temperature",
    oracle="""
    WITH per_source AS (
        SELECT source,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY source
    ),
    scored AS (
        SELECT source, n_tokens,
               CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)
                               / (SELECT sum(n_tokens) FROM per_source))
                          * 1000000000) AS BIGINT) AS num9
        FROM per_source
    )
    SELECT source, n_tokens,
           num9 / (SELECT sum(num9) FROM scored) AS weight
    FROM scored
    """,
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-MIXING weights (the stage between curation and training): the
    temperature-scaled sampling distribution p_i ∝ share_i^τ with τ=0.5
    — the standard multilingual/multi-domain recipe that up-samples
    small sources without letting any source dominate (τ=1 is
    proportional, τ=0 uniform). Per-source token counts are exact
    integers; share_i is ONE exact-integer division; sqrt is IEEE
    correctly-rounded on both engines (the E22 precedent) — and because
    a SUM of per-source sqrt DOUBLES would be summation-order-dependent
    (Spark's partials vs DuckDB's scan disagree in the last ulp), each
    sqrt is floor-quantized to 1e-9 BIGINT units FIRST, so the
    normalizer is an exact integer sum and the final weight is one
    deterministic division. A probability-zero hazard remains only if a
    sqrt lands within an ulp of a 1e-9 grid line (continuous values).

    Scale: one hash agg on source (map-side combinable) + two broadcast
    one-row totals; the weight table is dimension-sized output that
    drives the subsequent sampler — never a data shuffle."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("n_tokens")
    )
    total = per_source.agg(F.sum("n_tokens").alias("tot"))
    scored = per_source.crossJoin(F.broadcast(total)).select(
        "source",
        "n_tokens",
        F.floor(
            F.sqrt(F.col("n_tokens").cast("double") / F.col("tot")) * 1_000_000_000
        )
        .cast("bigint")
        .alias("num9"),
    )
    denom = scored.agg(F.sum("num9").alias("den9"))
    return scored.crossJoin(F.broadcast(denom)).select(
        "source", "n_tokens", (F.col("num9") / F.col("den9")).alias("weight")
    )


@query(
    "text_url_filter",
    oracle="""
    WITH urled AS (
        SELECT doc_id, lang, source,
               'https://' || source || '-' || CAST(doc_id % 7 AS VARCHAR)
                   || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
                   || '?lang=' || lang || '&v=2' AS url
        FROM documents
    )
    SELECT doc_id, url,
           source || '-' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
               AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           lang AS lang_param,
           (doc_id % 7 = 0) AS is_blocked
    FROM urled
    """,
)
def text_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing + blocklist filtering (T12) — the CommonCrawl-style
    curation step that routes documents by their source URL (host
    blocklists, TLD allowlists, per-domain caps). The corpus carries no
    URL column, so one is SYNTHESIZED deterministically from
    (source, doc_id, lang) — the multimodal-BMP device: Spark then
    parses it back with the real `parse_url` JVM function (HOST, PATH,
    QUERY param extraction), while the oracle states the expected parse
    RELATIONALLY from the same fields without ever string-splitting the
    URL — so the hash is an independent parse_url conformance check.
    Hosts with doc_id % 7 = 0 play the blocklist ('-0.example.com').

    Scale: narrow row-local expressions (concat + parse_url in codegen)
    riding the scan; a production blocklist joins broadcast against the
    parsed host column."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit("-"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/docs/"), F.col("doc_id").cast("string"),
        F.lit("?lang="), F.col("lang"), F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url("url", F.lit("HOST")).endswith("-0.example.com").alias(
            "is_blocked"
        ),
    )
