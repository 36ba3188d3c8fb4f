"""Helpers over ``df._jdf.queryExecution()`` — the per-query knobs the
engine asserts (tests/test_plans.py) and the things to eyeball when tuning
a new operator (``.explain("formatted")`` equivalents)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, *, execute: bool = False) -> str:
    """Physical-plan string. With ``execute=True`` the query runs first so
    AQE finalizes (codegen markers ``*(n)`` and runtime join conversions
    only appear in the final plan)."""
    if execute:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column names the scan actually reads (column-pruning proof)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", executed_plan(df)):
        cols.extend(c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip())
    return cols


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators — the metric to minimize
    (SURVEY §4). BroadcastExchange is excluded: a broadcast is the cheap
    alternative to a shuffle, not a shuffle."""
    # an AQE plan string carries "== Final Plan ==" AND "== Initial Plan =="
    # sections — count only the final one or every Exchange doubles
    plan = executed_plan(df).split("== Initial Plan ==")[0]
    return plan.count("Exchange ") - plan.count("BroadcastExchange ")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)
