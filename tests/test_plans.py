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


def test_q1_whole_stage_codegen(spark):
    df = QUERIES["agg_hash_q1"](spark, SF_UNIT)
    df.collect()  # AQE: codegen spans only appear in the finalized plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen'd operators carry the "*(n)" stage marker in the plan string
    assert "*(" in plan
    assert "HashAggregate" in plan
    # partial+final aggregation: the shuffle carries pre-aggregated rows
    assert "partial_sum" in plan
