"""LLM-data-pipeline vector operators (SURVEY.md §2.11, L5–L7 + ANN):
similarity search over the embedding column, per-label centroids, and
embedding-cosine near-dup.

Numeric discipline: all dot products cast elements to double and fold
sequentially (``F.aggregate`` — JVM-side, inside codegen). DuckDB's
``list_dot_product`` over double-cast lists folds in the same element
order, so similarities are bit-identical across engines and rankings are
deterministic without tolerance hacks.

Scale posture: brute-force top-k is a crossJoin against a *broadcast probe
set* (k probes × corpus = linear scan, embarrassingly parallel — the right
baseline even at 100 TB when probes are few). The IVF variant is the
many-probe path: assign corpus + probes to coarse cells (here the label
centroids), equi-join on cell id — turning ANN into a shuffle-on-key join
that prunes the candidate set by the cell fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .salted import replicated, with_salt

PROBE_IDS = tuple(range(10))  # fixed probe set for top-k queries
_PROBES_SQL = ", ".join(str(i) for i in PROBE_IDS)


def _dvec(col):
    return F.transform(F.col(col) if isinstance(col, str) else col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


_COS_SQL = (
    "list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)),"
    "                 list_transform({b}, x -> CAST(x AS DOUBLE)))"
    " / (sqrt(list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)),"
    "                          list_transform({a}, x -> CAST(x AS DOUBLE))))"
    "    * sqrt(list_dot_product(list_transform({b}, x -> CAST(x AS DOUBLE)),"
    "                            list_transform({b}, x -> CAST(x AS DOUBLE)))))"
)


@query(
    "embed_similarity_topk",
    oracle=f"""
    WITH probes AS (SELECT vec_id AS probe_id, embedding AS p_emb
                    FROM embeddings WHERE vec_id IN ({_PROBES_SQL})),
    sims AS (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               {_COS_SQL.format(a="p.p_emb", b="e.embedding")} AS cos_sim
        FROM probes p CROSS JOIN embeddings e
        WHERE e.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, round(cos_sim, 6) AS cos_sim,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM sims
    QUALIFY rank <= 5
    """,
)
def embed_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for a fixed 10-probe set: probes
    broadcast against a single linear corpus scan, per-probe top-k via
    window (rank materialized; ranking deterministic — see module
    docstring)."""
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id").isin(*PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb")
    )
    sims = (
        e.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            _cosine(_dvec("p_emb"), _dvec("embedding")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("probe_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


@query(
    "embed_centroids",
    oracle="""
    SELECT label, pos, round(avg(x), 6) AS centroid_val
    FROM (SELECT label,
                 unnest(range(1, len(embedding) + 1)) AS pos,
                 unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
          FROM embeddings)
    GROUP BY label, pos
    """,
)
def embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (elementwise mean over dim-64 vectors) via
    posexplode → (label, pos) hash-agg: one shuffle of 64 partials per
    label per partition, never a collected vector."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode(_dvec("embedding")).alias("pos0", "x"))
        .select("label", (F.col("pos0") + 1).alias("pos"), "x")
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("centroid_val"))
    )


@query(
    "embed_pairwise_label",
    oracle=f"""
    WITH probes AS (SELECT * FROM embeddings WHERE vec_id % 5 = 0)
    SELECT a.label AS a_label, (a.label = b.label) AS intra,
           count(*) AS n_pairs,
           round(avg({_COS_SQL.format(a="a.embedding", b="b.embedding")}), 4)
               AS avg_cos
    FROM probes a JOIN embeddings b ON a.vec_id < b.vec_id
    GROUP BY a.label, (a.label = b.label)
    """,
)
def embed_pairwise_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra- vs inter-label average similarity (cluster-quality sanity
    metric) over a deterministic probe subset (vec_id % 5 = 0) to bound
    the pair count."""
    # Salted replicate join (no corpus-proportional broadcast): the probe
    # set is 20% OF THE CORPUS, so broadcasting it grows linearly with the
    # data — a plan that dies at scale. Salting gives the pure theta join
    # an equi-key: corpus rows get a hash salt in [0, S); probes are
    # replicated S× in-row; the join shuffles on salt (S keys, even by
    # construction) and each task does probes × corpus/S work with one
    # probe salt-slice resident — bounded regardless of corpus size.
    S = 32
    e = load_table(spark, sf_dir, "embeddings")
    probes = replicated(
        e.filter(F.col("vec_id") % 5 == 0).select(
            F.col("vec_id").alias("a_vec"), F.col("embedding").alias("a_emb"),
            F.col("label").alias("a_label"),
        ),
        S,
    )
    corpus = with_salt(e, "vec_id", S)
    pairs = corpus.join(probes.hint("merge"), "_salt").filter(
        F.col("a_vec") < F.col("vec_id")
    )
    return (
        pairs.select(
            "a_label",
            (F.col("a_label") == F.col("label")).alias("intra"),
            _cosine(_dvec("a_emb"), _dvec("embedding")).alias("cos"),
        )
        .groupBy("a_label", "intra")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("cos"), 4).alias("avg_cos"),
        )
    )


@query(
    "embed_near_dup",
    oracle=f"""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round({_COS_SQL.format(a="a.embedding", b="b.embedding")}, 6) AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= 0.99
    """,
)
def embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (≥0.99) blocked by label —
    the embedding-space member of the dedup family.

    Salted replicate join (no corpus broadcast): 10 label blocks → a plain
    shuffle join on label runs each block's O(n²) pair work in one task,
    and broadcasting the corpus stops working the moment the table out-
    grows executor memory. Left side gets a hash salt in [0, S); right is
    replicated S× via an in-row explode; the equi-key (label, salt) has
    10·S values, so per-task work is block²/S and per-task memory one
    salt-slice — both bounded at any corpus size. The sub-quadratic path
    for 100 TB near-dup remains IVF/LSH bucketing (embed_ann_ivf /
    dedup_minhash_lsh); exact all-pairs-within-label is the contract here.
    """
    S = 8
    e = load_table(spark, sf_dir, "embeddings")
    a = with_salt(
        e.select(
            F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb"), "label"
        ),
        "a_id",
        S,
    )
    b = replicated(
        e.select(
            F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb"),
            F.col("label").alias("b_label"),
        ),
        S,
        col="_bsalt",
    )
    pairs = a.join(
        b.hint("merge"),  # shuffle = the distribution mechanism (see llm_text)
        (F.col("label") == F.col("b_label"))
        & (F.col("_salt") == F.col("_bsalt"))
        & (F.col("a_id") < F.col("b_id")),
    )
    sims = pairs.select(
        "a_id", "b_id", _cosine(_dvec("a_emb"), _dvec("b_emb")).alias("cos_sim")
    )
    return sims.filter(F.col("cos_sim") >= 0.99).select(
        "a_id", "b_id", F.round("cos_sim", 6).alias("cos_sim")
    )


_IVF_ORACLE = f"""
    WITH dvecs AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    centroids AS (
        SELECT label AS cell, list(avg_x ORDER BY pos) AS centroid
        FROM (SELECT label, pos, avg(x) AS avg_x
              FROM (SELECT label,
                           unnest(range(1, len(v) + 1)) AS pos,
                           unnest(v) AS x
                    FROM dvecs)
              GROUP BY label, pos)
        GROUP BY label
    ),
    probes AS (SELECT vec_id AS probe_id, v AS p_v
               FROM dvecs WHERE vec_id IN ({_PROBES_SQL})),
    probe_cells AS (
        SELECT probe_id, p_v, cell
        FROM (SELECT p.probe_id, p.p_v, c.cell,
                     row_number() OVER (
                         PARTITION BY p.probe_id
                         ORDER BY list_dot_product(p.p_v, c.centroid)
                                  / (sqrt(list_dot_product(p.p_v, p.p_v))
                                     * sqrt(list_dot_product(c.centroid, c.centroid)))
                                  DESC, c.cell) AS rn
              FROM probes p CROSS JOIN centroids c)
        WHERE rn = 1
    ),
    sims AS (
        SELECT pc.probe_id, e.vec_id AS neighbor_id,
               list_dot_product(pc.p_v, e.v)
               / (sqrt(list_dot_product(pc.p_v, pc.p_v))
                  * sqrt(list_dot_product(e.v, e.v))) AS cos_sim
        FROM probe_cells pc
        JOIN dvecs e ON e.label = pc.cell AND e.vec_id <> pc.probe_id
    )
    SELECT probe_id, neighbor_id, round(cos_sim, 6) AS cos_sim,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM sims
    QUALIFY rank <= 5
"""


@query("embed_ann_ivf", oracle=_IVF_ORACLE)
def embed_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into cells
    (the per-label centroids serve as the trained codebook), assign each
    probe to its nearest cell, then search only that cell.

    This is the 100 TB ANN shape: centroid assignment is a broadcast
    (codebook is tiny), cell search is an equi-join on cell_id — candidate
    set shrinks by the cell fan-out vs the brute-force scan. The oracle
    replays the whole IVF pipeline in SQL (centroid averages differ by
    ~1 ulp between engines — cell argmax would only flip on a near-exact
    tie, and output similarities are computed probe·corpus, engine-exact);
    tests additionally pin cell-restricted exactness vs numpy.
    """
    e = load_table(spark, sf_dir, "embeddings")
    centroids = (
        e.select("label", F.posexplode(_dvec("embedding")).alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("centroid")
        )
        .select(F.col("label").alias("cell"), "centroid")
    )
    # assign probes to their nearest cell (broadcast codebook)
    probes = e.filter(F.col("vec_id").isin(*PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb")
    )
    w_cell = Window.partitionBy("probe_id").orderBy(F.col("cell_sim").desc(), "cell")
    probe_cells = (
        probes.crossJoin(F.broadcast(centroids))
        .select(
            "probe_id", "p_emb", "cell",
            _cosine(_dvec("p_emb"), F.col("centroid")).alias("cell_sim"),
        )
        .withColumn("rn", F.row_number().over(w_cell))
        .filter(F.col("rn") == 1)
        .select("probe_id", "p_emb", "cell")
    )
    # search only the probe's cell (corpus pre-bucketed by label = cell id)
    cand = probe_cells.join(e, probe_cells.cell == e.label).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    sims = cand.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        _cosine(_dvec("p_emb"), _dvec("embedding")).alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("probe_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )
