"""df.stat surface pins that don't fit the oracle gate: the RNG-seeded
sampleBy API (layout-dependent by contract — never H-checkable) and the
freqItems superset property at a support where false positives are
likely."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreamingstateful_spark.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_sample_by_seeded_api(spark):
    c = load_table(spark, SF, "customer")
    fracs = {"BUILDING": 0.5, "MACHINERY": 0.2}
    s1 = c.stat.sampleBy("c_mktsegment", fracs, seed=42)
    got = {
        r["c_mktsegment"]: r["n"]
        for r in s1.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # Strata absent from the map sample at fraction 0.
    assert set(got) <= set(fracs)
    base = {
        r["c_mktsegment"]: r["n"]
        for r in c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for k, frac in fracs.items():
        # Bernoulli sampling: allow a generous +-40% relative band at
        # sf0.01 stratum sizes (~300 rows) — this pins "roughly the
        # asked-for fraction", not an exact count.
        assert abs(got.get(k, 0) / base[k] - frac) < 0.4 * frac, (k, got)
    # Same seed + same layout => identical sample (determinism within a
    # fixed partitioning — the property that makes seeded runs debuggable).
    s2 = c.stat.sampleBy("c_mktsegment", fracs, seed=42)
    assert s1.exceptAll(s2).isEmpty() and s2.exceptAll(s1).isEmpty()


def test_freq_items_superset_guarantee(spark):
    o = load_table(spark, SF, "orders")
    # At support=0.15 every ~20% priority stratum must be present.
    fi = o.stat.freqItems(["o_orderpriority"], support=0.15).collect()[0]
    items = set(fi["o_orderpriority_freqItems"])
    exact = {
        r["o_orderpriority"] for r in o.select("o_orderpriority").distinct().collect()
    }
    assert exact <= items
