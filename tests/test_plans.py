"""Plan-shape assertions (SURVEY.md §5.2.5): the physical plan, not just the
answer, is part of the contract — these guard the 100 TB posture claims
(pushdown, pruning, broadcast, no nested-loop fact joins)."""

from __future__ import annotations

from sparkstreamingstateful_spark import registry

from .conftest import SF_UNIT

QUERIES, _ = registry.collect()


def plan_of(spark, key: str) -> str:
    df = QUERIES[key](spark, SF_UNIT)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown(spark):
    plan = plan_of(spark, "filter_basic")
    assert "PushedFilters: [" in plan
    assert "l_returnflag" in plan.split("PushedFilters")[1][:300]


def test_column_pruning(spark):
    plan = plan_of(spark, "scan_projection_pushdown")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" in read_schema
    # none of the other 9 lineitem columns may be read
    for col in ("l_partkey", "l_quantity", "l_shipdate", "l_returnflag"):
        assert col not in read_schema, f"{col} not pruned: {read_schema}"


def test_broadcast_join(spark):
    plan = plan_of(spark, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_join_not_nested_loop(spark):
    # J7 must keep its equi component → hash/sort-merge join with residual,
    # never BroadcastNestedLoopJoin over the fact table.
    plan = plan_of(spark, "join_theta_range")
    assert "NestedLoop" not in plan


def test_fingerprint_simhash_zero_shuffle(spark):
    # both are per-row reductions expressed as array folds — any Exchange
    # here means a corpus-sized stream is being shuffled to compute a
    # row-local value (the r1 formulations did exactly that).
    from sparkstreamingstateful_spark.plans import shuffle_count

    assert shuffle_count(QUERIES["doc_fingerprint"](spark, SF_UNIT)) == 0
    assert shuffle_count(QUERIES["dedup_simhash"](spark, SF_UNIT)) == 0


def test_pairwise_salted_scale_shape(spark):
    # The all-pairs similarity family must survive with broadcasts OFF —
    # i.e. its joins carry a real (block, salt) equi-key, never an
    # unconditional corpus broadcast (r1 shape) or a nested-loop fallback.
    # At test scale Catalyst is free to pick a size-based broadcast; this
    # pins the 100 TB shape by disabling that choice and re-planning.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for key in (
            "dedup_near",
            "dedup_ngram_jaccard",
            "embed_near_dup",
            "embed_pairwise_label",
        ):
            plan = plan_of(spark, key)
            assert "_salt" in plan, f"{key}: salted equi-key missing from plan"
            assert "NestedLoop" not in plan, f"{key}: nested-loop join at scale shape"
            assert "BroadcastExchange" not in plan, f"{key}: corpus broadcast at scale shape"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q1_whole_stage_codegen(spark):
    df = QUERIES["agg_hash_q1"](spark, SF_UNIT)
    df.collect()  # AQE: codegen spans only appear in the finalized plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen'd operators carry the "*(n)" stage marker in the plan string
    assert "*(" in plan
    assert "HashAggregate" in plan
    # partial+final aggregation: the shuffle carries pre-aggregated rows
    assert "partial_sum" in plan
