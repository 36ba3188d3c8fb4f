"""Property-based tests (SURVEY.md §5.2.4, hypothesis): algebraic
invariants that must hold for arbitrary data, not just the fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=-1000, max_value=1000),  # val
        st.text(alphabet="abc ", min_size=0, max_size=8),  # txt
    ),
    min_size=1,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=ROWS)
@_SETTINGS
def test_parquet_roundtrip_identity(spark, tmp_path_factory, rows):
    """write∘read ≡ id for arbitrary frames (S6 generalized)."""
    df = spark.createDataFrame(
        [(i, k, v, t) for i, (k, v, t) in enumerate(rows)],
        "id long, key long, val long, txt string",
    )
    out = str(tmp_path_factory.mktemp("rt") / "data")
    df.write.mode("overwrite").parquet(out)
    back = spark.read.schema(df.schema).parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


@given(rows=ROWS)
@_SETTINGS
def test_running_sum_matches_python(spark, rows):
    """Window running sum ≡ a straight Python fold over the same order."""
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v, _) in enumerate(rows)], "id long, key long, val long"
    )
    w = Window.partitionBy("key").orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    got = {
        r["id"]: r["run"]
        for r in df.withColumn("run", F.sum("val").over(w)).collect()
    }
    acc: dict[int, int] = {}
    for i, (k, v, _) in enumerate(rows):
        acc[k] = acc.get(k, 0) + v
        assert got[i] == acc[k]


# documents for the prefix-filter property: few-token texts over a tiny
# vocabulary so near-dup pairs actually occur within 25 docs; min_size=0
# admits EMPTY item sets (docs with no tokens), pinning the documented
# semantics that union-0 pairs are excluded (Jaccard 0/0 is undefined)
_DOCS = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
        min_size=0,
        max_size=8,
    ),
    min_size=2,
    max_size=25,
)


@given(docs=_DOCS)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_prefix_filter_equals_brute_force(spark, docs):
    """The All-Pairs prefix-filter join must return EXACTLY the pairs a
    brute-force thresholded scan returns, for arbitrary corpora — the
    completeness theorem (every qualifying pair shares a prefix item in
    both sets under a common global order) exercised beyond the fixed
    fixture corpus."""
    from sparkstreamingstateful_spark.operators.llm_text import (
        _threshold_pairs_prefix,
    )

    tau_num, tau_den = 7, 10
    df = spark.createDataFrame(
        [(i, "xx", " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, lang string, text string",
    )
    got = {
        (r["a_id"], r["b_id"])
        for r in _threshold_pairs_prefix(
            df,
            # drop the "" token split() yields on empty text, so no-token
            # docs carry a genuinely EMPTY item set through the pipeline
            F.array_distinct(
                F.filter(F.split(F.col("text"), " "), lambda t: t != "")
            ),
            tau_num=tau_num,
            tau_den=tau_den,
        ).collect()
    }
    sets = [set(toks) for toks in docs]
    want = {
        (a, b)
        for a in range(len(sets))
        for b in range(a + 1, len(sets))
        if len(sets[a] | sets[b]) > 0
        and tau_den * len(sets[a] & sets[b]) >= tau_num * len(sets[a] | sets[b])
    }
    assert got == want


@given(rows=ROWS)
@_SETTINGS
def test_groupby_sum_invariant_under_repartition(spark, rows):
    """Aggregation results are partitioning-independent (the property that
    makes distributed partial+final aggregation sound)."""
    df = spark.createDataFrame(
        [(k, v) for (k, v, _) in rows], "key long, val long"
    )
    base = sorted(map(tuple, df.groupBy("key").agg(F.sum("val")).collect()))
    repart = sorted(
        map(tuple, df.repartition(7, "val").groupBy("key").agg(F.sum("val")).collect())
    )
    assert base == repart


EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=50,
)


@given(edges=EDGES)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_matches_union_find(spark, edges):
    """connected_components (min-label + pointer-jump shortcut) must equal
    a plain union-find on ARBITRARY graphs — self-loops, parallel edges,
    stars, chains, disjoint islands — not just the LSH pair shapes the
    oracle replays. Guards the r5 shortcutting step (label←label(label)
    is easy to get subtly wrong: a bad jump can skip across components
    or stall below the fixed point)."""
    from sparkstreamingstateful_spark.operators.llm_text import (
        connected_components,
    )

    pairs = spark.createDataFrame(edges, "a long, b long")
    sym = pairs.selectExpr("a AS src", "b AS dst").union(
        pairs.selectExpr("b AS src", "a AS dst")
    )
    got = {
        (r.node, r.label) for r in connected_components(sym).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    want = {(n, find(n)) for n in nodes}
    assert got == want


_WORDS = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=10),
    min_size=1,
    max_size=25,
)
_VOCAB = st.sets(
    st.text(alphabet="abcde", min_size=2, max_size=4), min_size=0, max_size=12
)


@given(words=_WORDS, vocab=_VOCAB)
@_SETTINGS
def test_subword_greedy_walk_matches_python(spark, words, vocab):
    """text_tokenize_subword's in-row F.aggregate state machine must
    equal a trivial Python greedy longest-match for ARBITRARY words and
    vocabularies — boundary guards (pieces may not overrun the word),
    the 4>3>2 longest-match order, and the single-char UNK fallback are
    exactly the places an off-by-one would hide."""

    def greedy(word: str) -> tuple[int, int]:
        pos, np_, nu = 0, 0, 0
        while pos < len(word):
            for length in (4, 3, 2):
                if word[pos : pos + length] in vocab and pos + length <= len(word):
                    pos += length
                    np_ += 1
                    break
            else:
                pos += 1
                np_ += 1
                nu += 1
        return np_, nu

    df = spark.createDataFrame([(w,) for w in set(words)], "word string").withColumn(
        "vb", F.array(*[F.lit(v) for v in sorted(vocab)])
    )

    def _step(acc, i):
        wlen = F.length(F.col("word"))
        m4 = (wlen - i >= 3) & F.array_contains(F.col("vb"), F.col("word").substr(i, F.lit(4)))
        m3 = (wlen - i >= 2) & F.array_contains(F.col("vb"), F.col("word").substr(i, F.lit(3)))
        m2 = (wlen - i >= 1) & F.array_contains(F.col("vb"), F.col("word").substr(i, F.lit(2)))
        adv = F.when(m4, F.lit(4)).when(m3, F.lit(3)).when(m2, F.lit(2)).otherwise(F.lit(1))
        unk = F.when(m4 | m3 | m2, F.lit(0)).otherwise(F.lit(1))
        return F.when(i != acc["pos"], acc).otherwise(
            F.struct(
                (acc["pos"] + adv).alias("pos"),
                (acc["np"] + 1).alias("np"),
                (acc["nu"] + unk).alias("nu"),
            )
        )

    if not vocab:
        # F.array() with zero elements is array<void>; array_contains
        # against it is a type error — the empty-vocab walk is all UNKs.
        got = {w: (len(w), len(w)) for w in set(words)}
    else:
        fin = F.aggregate(
            F.sequence(F.lit(1), F.length("word")),
            F.struct(F.lit(1).alias("pos"), F.lit(0).alias("np"), F.lit(0).alias("nu")),
            _step,
        )
        got = {
            r["word"]: (r["np"], r["nu"])
            for r in df.select("word", fin["np"].alias("np"), fin["nu"].alias("nu")).collect()
        }
    assert got == {w: greedy(w) for w in set(words)}


EDGE_LISTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),   # u
        st.integers(min_value=0, max_value=9),   # v
        st.integers(min_value=0, max_value=50),  # weight
    ),
    min_size=1,
    max_size=25,
)


@given(edges=EDGE_LISTS, hops=st.integers(min_value=1, max_value=4))
@_SETTINGS
def test_bounded_weighted_sp_matches_python_bf(spark, edges, hops):
    """graphs.bounded_weighted_sp ≡ a pure-Python Bellman–Ford carrying
    the identical ≤hops-edge recurrence, for arbitrary small weighted
    graphs (parallel edges, self-loops, zero weights included) from a
    fixed source 0."""
    from sparkstreamingstateful_spark.operators.graphs import (
        bounded_weighted_sp,
    )

    # symmetrize exactly like the operator's callers do
    sym_edges = [(u, v, w) for u, v, w in edges] + [
        (v, u, w) for u, v, w in edges
    ]
    sym = spark.createDataFrame(sym_edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r.node: r.dist
        for r in bounded_weighted_sp(spark, sym, seeds, hops=hops).collect()
    }
    dist = {0: 0}
    for _ in range(hops):
        nxt = dict(dist)
        for u, v, w in sym_edges:
            if u in dist and (v not in nxt or dist[u] + w < nxt[v]):
                nxt[v] = dist[u] + w
        dist = nxt
    assert got == dist
