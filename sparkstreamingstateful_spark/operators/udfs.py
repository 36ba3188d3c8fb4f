"""UDF / UDAF / UDTF surface (SURVEY.md §2.10, U1–U5).

UDF discipline for 100 TB (SURVEY §4.2 / guide): row-at-a-time Python UDFs
(U1) exist to prove the API, not for hot paths — they serialize row-by-row
through Py4J pickling. Everything performance-relevant uses Arrow-vectorized
pandas UDFs (U2) or whole-partition Arrow transforms (U3/U5), which batch
10-100× faster; and where a built-in ``F.*`` expression can express the
logic, that always wins (it stays in codegen and never crosses to Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import query


@query(
    "udf_python",
    oracle="""
    SELECT doc_id, lower(trim(text)) AS norm_text FROM documents
    """,
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF (text normalizer). Deliberately the slow path —
    kept tiny; see module docstring."""

    @F.udf(T.StringType())
    def normalize(s: str) -> str:
        # strip(' ') not strip(): bare strip removes ALL whitespace
        # (tabs/\r/unicode) while the oracle's trim(text) removes only
        # spaces — same contract as udf_arrow's normalize; divergence is
        # data-dependent (no tabbed docs in this corpus, but a real
        # ingest has them)
        return s.strip(" ").lower() if s is not None else None

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", normalize("text").alias("norm_text"))


@query(
    "udf_pandas",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                       list_transform(embedding, x -> CAST(x AS DOUBLE)))),
                 4) AS l2_norm
    FROM embeddings
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF: per-row vector L2 norm via numpy over
    whole Arrow batches."""

    @F.pandas_udf(T.DoubleType())
    def l2_norm(vecs: pd.Series) -> pd.Series:
        import numpy as np

        return vecs.map(lambda v: float(np.sqrt(np.dot(np.asarray(v, dtype="float64"),
                                                       np.asarray(v, dtype="float64")))))

    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.round(l2_norm("embedding"), 4).alias("l2_norm"))


@query(
    "udaf_applyInPandas",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n,
           round(CAST(quantile_cont(c_acctbal, 0.5) AS DOUBLE), 4) AS median_bal,
           round(avg(c_acctbal), 4) AS mean_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def udaf_applyInPandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-map UDAF: per-group pandas aggregation (median — linear
    interpolation, identical to quantile_cont)."""

    out_schema = T.StructType(
        [
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("median_bal", T.DoubleType()),
            T.StructField("mean_bal", T.DoubleType()),
        ]
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # raw doubles out of Python: Python round() is banker's rounding
        # (half-to-even) while SQL round is half-away-from-zero — rounding
        # happens in Spark SQL below so both engines use SQL semantics.
        return pd.DataFrame(
            {
                "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
                "n": [len(pdf)],
                "median_bal": [float(pdf["c_acctbal"].median())],
                "mean_bal": [float(pdf["c_acctbal"].mean())],
            }
        )

    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .applyInPandas(stats, out_schema)
        .select(
            "c_mktsegment",
            "n",
            F.round("median_bal", 4).alias("median_bal"),
            F.round("mean_bal", 4).alias("mean_bal"),
        )
    )


@query(
    "udaf_applyInArrow",
    oracle="""
    SELECT p_brand,
           count(*) AS n,
           round(sum(p_retailprice), 2) AS sum_price,
           min(p_size) AS min_size,
           max(p_size) AS max_size
    FROM part
    GROUP BY p_brand
    """,
)
def udaf_applyInArrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-map UDAF on the raw Arrow path (``applyInArrow``): each group
    arrives as a ``pyarrow.Table`` and leaves as one — no pandas
    conversion layer at all, so no dtype coercion surprises (pandas would
    e.g. widen int32 → int64 under NaN) and one less copy per group than
    ``applyInPandas``. The per-group compute is pure ``pyarrow.compute``
    kernels (C++, SIMD). Rounding happens Spark-side so both engines use
    SQL half-away-from-zero semantics."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out_schema = T.StructType(
        [
            T.StructField("p_brand", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("sum_price", T.DoubleType()),
            T.StructField("min_size", T.IntegerType()),
            T.StructField("max_size", T.IntegerType()),
        ]
    )

    def stats(table: pa.Table) -> pa.Table:
        sizes = table.column("p_size")
        return pa.table(
            {
                "p_brand": pa.array([table.column("p_brand")[0].as_py()]),
                "n": pa.array([table.num_rows], pa.int64()),
                "sum_price": pa.array(
                    [pc.sum(table.column("p_retailprice")).as_py()], pa.float64()
                ),
                "min_size": pa.array([pc.min(sizes).as_py()], pa.int32()),
                "max_size": pa.array([pc.max(sizes).as_py()], pa.int32()),
            }
        )

    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .applyInArrow(stats, out_schema)
        .select(
            "p_brand",
            "n",
            F.round("sum_price", 2).alias("sum_price"),
            "min_size",
            "max_size",
        )
    )


@query(
    "udtf_python",
    oracle="""
    SELECT bigram, count(*) AS n
    FROM (SELECT unnest(list_transform(range(1, len(l)),
                                       i -> l[i] || ' ' || l[i + 1])) AS bigram
          FROM (SELECT string_split(text, ' ') AS l FROM documents))
    GROUP BY bigram
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one row in → many out (word bigrams), then frequency
    count over the exploded rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string")
    class Bigrams:
        def eval(self, text: str):
            toks = text.split(" ")
            for a, b in zip(toks, toks[1:]):
                yield (f"{a} {b}",)

    spark.udtf.register("sss_bigrams", Bigrams)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("udtf_documents")
    return spark.sql(
        """
        SELECT t.bigram, count(*) AS n
        FROM udtf_documents, LATERAL sss_bigrams(text) t
        GROUP BY t.bigram
        """
    )


@query(
    "map_in_pandas",
    oracle="""
    SELECT doc_id, length(text) AS calc_len,
           (length(text) = n_chars) AS len_ok
    FROM documents
    """,
)
def map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-partition Arrow transform (mapInPandas): each partition streams
    through Python as an iterator of Arrow batches — constant memory per
    executor regardless of partition size."""

    def check_lengths(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            calc = pdf["text"].str.len().astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "calc_len": calc,
                    "len_ok": calc == pdf["n_chars"],
                }
            )

    d = load_table(spark, sf_dir, "documents")
    return d.mapInPandas(check_lengths, "doc_id long, calc_len long, len_ok boolean")


@query(
    "udf_arrow",
    oracle="""
    SELECT doc_id, lower(trim(text)) AS norm_text FROM documents
    """,
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4 ``useArrow=True``): same logical
    op as udf_python (U1) but serialized over Arrow batches instead of
    row-at-a-time pickling — the drop-in upgrade path for existing scalar
    UDFs that can't be rewritten as pandas UDFs (10-100x less
    serialization overhead, same per-row Python execution)."""

    @F.udf(T.StringType(), useArrow=True)
    def normalize(s: str) -> str:
        # strip(' ') not strip(): bare strip removes ALL whitespace
        # (tabs/newlines/unicode) while the oracle's trim(text) removes
        # only spaces — both engines must strip the same character set
        return s.strip(" ").lower() if s is not None else None

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", normalize("text").alias("norm_text"))


@query(
    "udaf_pandas_window",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           quantile_cont(c_acctbal, 0.5)
               OVER (PARTITION BY c_mktsegment) AS seg_median,
           (c_acctbal > quantile_cont(c_acctbal, 0.5)
               OVER (PARTITION BY c_mktsegment)) AS above_median
    FROM customer
    """,
)
def udaf_pandas_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF applied OVER A WINDOW (the third pandas-UDF
    flavor after scalar U2 and group-map U3): every customer row gets its
    segment's median attached, computed once per partition group in a
    single Arrow batch. pandas' linear-interpolation median is
    bit-identical to DuckDB's quantile_cont (same rule as
    udaf_applyInPandas), so no rounding is needed."""
    import pandas as pd

    @F.pandas_udf(T.DoubleType())
    def median_agg(v: pd.Series) -> float:
        return float(v.median())

    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment")
    seg_median = median_agg("c_acctbal").over(w)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        seg_median.alias("seg_median"),
        (F.col("c_acctbal") > seg_median).alias("above_median"),
    )


@query(
    "map_in_arrow",
    oracle="""
    SELECT doc_id, length(text) AS calc_len,
           (length(text) = n_chars) AS len_ok
    FROM documents
    """,
)
def map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-partition RAW Arrow transform (mapInArrow): like
    map_in_pandas but the Python function sees pyarrow RecordBatches
    directly — no pandas conversion at all, the lowest-overhead Python
    boundary Spark offers (columnar compute via pyarrow.compute kernels,
    zero per-row Python)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def check(batches):
        for batch in batches:
            calc = pc.cast(pc.utf8_length(batch.column("text")), pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    calc,
                    pc.equal(calc, batch.column("n_chars")),
                ],
                names=["doc_id", "calc_len", "len_ok"],
            )

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "text", "n_chars").mapInArrow(
        check, "doc_id long, calc_len long, len_ok boolean"
    )


@query(
    "udtf_analyze",
    oracle="""
    SELECT string_split(text, ' ')[1] AS t0,
           count(*) AS n,
           count(DISTINCT string_split(text, ' ')[2]) AS n_second
    FROM documents
    GROUP BY 1
    """,
)
def udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a DYNAMIC output schema (Spark 4 ``analyze``):
    the planner calls the UDTF's static ``analyze`` with the constant
    arguments and the returned schema becomes the plan's — here
    ``token_prefix(text, 3)`` emits the first 3 whitespace tokens as 3
    typed columns (NULL-padded), with the column count decided at
    ANALYSIS time from the literal, not hardcoded. The schema must be
    built programmatically (StructType ctor) — ``fromDDL`` needs an
    active session, and ``analyze`` runs in a session-less worker
    (measured). Aggregated so the oracle pins real values through the
    dynamic columns."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class TokenPrefix:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(
                T.StructType(
                    [
                        T.StructField(f"t{i}", T.StringType())
                        for i in range(int(n.value))
                    ]
                )
            )

        def eval(self, text: str, n: int):
            toks = text.split(" ")[: int(n)]
            yield tuple(toks) + (None,) * (int(n) - len(toks))

    spark.udtf.register("sss_token_prefix", TokenPrefix)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("udtf_analyze_documents")
    return spark.sql(
        """
        SELECT t.t0, count(*) AS n, count(DISTINCT t.t1) AS n_second
        FROM udtf_analyze_documents, LATERAL sss_token_prefix(text, 3) t
        GROUP BY t.t0
        """
    )


@query(
    "udf_pandas_iter",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(lower(text), ' '),
                    x -> x IN ('the', 'a', 'an', 'of', 'to', 'and',
                               'in', 'is', 'it', 'that')))
                AS BIGINT) AS n_stop,
           CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok
    FROM documents
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATOR pandas UDF (U10, ``Iterator[pd.Series] ->
    Iterator[pd.Series]``): the per-partition-initialization variant of
    U2 — expensive setup (loading a tokenizer, a model, a lexicon trie)
    runs ONCE per Python worker task, then streams over that task's
    Arrow batches, instead of re-paying it per batch via closure
    tricks. This is THE shape for applying an ML artifact across a
    100 TB corpus (the north-star decode/score/tokenize steps): init
    cost amortizes over the partition, memory stays one-batch-bounded,
    and Spark can't tell it from a plain pandas UDF plan-wise (same
    ArrowEvalPython node). Here the "artifact" is a stopword set +
    tokenizer built once per task; the once-per-task/many-batches
    contract is pinned by test_udf_pandas_iter_init_amortized (UDF
    workers are separate processes, so the test observes inits through
    the UDF's own output, not driver globals); the H-check pins the
    scored output against a pure-SQL replay."""
    import pandas as pd

    @F.pandas_udf("n_stop long, n_tok long")
    def stop_stats(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        # once-per-task init (the "model load")
        stopwords = frozenset(
            ["the", "a", "an", "of", "to", "and", "in", "is", "it", "that"]
        )
        for texts in batches:
            toks = texts.str.lower().str.split(" ")
            yield pd.DataFrame(
                {
                    "n_stop": toks.map(
                        lambda ts: sum(1 for t in ts if t in stopwords)
                    ),
                    "n_tok": toks.map(len),
                }
            )

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", stop_stats("text").alias("s")
    ).select("doc_id", "s.n_stop", "s.n_tok")



@query(
    "udtf_arrow",
    oracle="""
    SELECT lang, trigram, count(*) AS n
    FROM (SELECT lang,
                 unnest(list_transform(range(1, len(l) - 1),
                                       i -> l[i] || ' ' || l[i + 1]
                                            || ' ' || l[i + 2])) AS trigram
          FROM (SELECT lang, string_split(text, ' ') AS l FROM documents))
    GROUP BY lang, trigram
    """,
)
def udtf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-optimized Python UDTF (U12, `useArrow=True`): the same
    one-row-in/many-out surface as udtf_python but with rows crossing the
    JVM↔Python boundary as Arrow batches instead of pickled rows — the
    serialization path that makes a generator UDTF viable on a wide
    corpus (pickled-row UDTFs pay per-row overhead; Arrow amortizes per
    batch, the U3/U5 story applied to table functions). Emits (lang,
    trigram) pairs — a second output column and a pass-through grouping
    column so the H-check covers multi-column Arrow UDTF output, not
    just the bigram shape re-serialized."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang: string, trigram: string", useArrow=True)
    class Trigrams:
        def eval(self, lang: str, text: str):
            toks = text.split(" ")
            for a, b, c in zip(toks, toks[1:], toks[2:]):
                yield (lang, f"{a} {b} {c}")

    spark.udtf.register("sss_trigrams_arrow", Trigrams)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("udtf_arrow_documents")
    return spark.sql(
        """
        SELECT t.lang, t.trigram, count(*) AS n
        FROM udtf_arrow_documents,
             LATERAL sss_trigrams_arrow(lang, text) t
        GROUP BY t.lang, t.trigram
        """
    )


@query(
    "udtf_table_arg",
    oracle="""
    SELECT user_id, rnk, event_id, value
    FROM (SELECT user_id,
                 CAST(row_number() OVER (PARTITION BY user_id
                                         ORDER BY value DESC, event_id)
                      AS BIGINT) AS rnk,
                 event_id, value
          FROM events)
    WHERE rnk <= 3
    """,
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE argument (U13, Spark 4):
    ``udtf(TABLE(t) PARTITION BY k ORDER BY ...)`` hands the UDTF whole
    input partitions as ordered row streams — one class instance per
    key, ``eval`` per row, ``terminate`` at partition end. This is the
    per-group Python table-function shape a real pipeline uses for
    model scoring / per-entity sequence featurization where the logic
    needs the group's rows in order (beyond what applyInPandas offers:
    streaming row-at-a-time state, no whole-group materialization).

    The key computes per-user top-3 events by value: because rows
    arrive ordered (value DESC, event_id), the UDTF just keeps the
    first 3 rows per partition — O(k) memory per key regardless of
    group size, which is exactly the property the TABLE-arg contract
    guarantees and the H-check pins (a mis-partitioned or mis-ordered
    stream produces different rows, not just a different order).
    Oracle = window-function replay (row_number over the same order).

    Scale: PARTITION BY shuffles once on user_id; each Python worker
    then streams its keys' rows through Arrow batches. Memory is
    k rows per key; no group materialization, no driver involvement."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, rnk bigint, event_id bigint, value double")
    class TopKPerUser:
        def __init__(self):
            self._kept: list = []

        def eval(self, row):
            # rows arrive in (value DESC, event_id) order within the
            # user partition — the first 3 ARE the top-3
            if len(self._kept) < 3:
                self._kept.append((row["user_id"], row["event_id"], row["value"]))

        def terminate(self):
            for i, (uid, eid, val) in enumerate(self._kept, start=1):
                yield uid, i, eid, val

    spark.udtf.register("sss_topk_per_user", TopKPerUser)
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("udtf_table_arg_events")
    return spark.sql(
        """
        SELECT user_id, rnk, event_id, value
        FROM sss_topk_per_user(
            TABLE(udtf_table_arg_events)
            PARTITION BY user_id
            ORDER BY (value DESC, event_id)
        )
        """
    )
