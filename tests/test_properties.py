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
