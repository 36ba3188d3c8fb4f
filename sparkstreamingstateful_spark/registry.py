"""Global query registry — the machine-checkable operator inventory.

Every operator from SURVEY.md §2 registers here as a ``(spark, sf_dir) ->
DataFrame`` callable plus (for H-checked rows) the equivalent DuckDB oracle
SQL. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Operator modules imported (for registration side effects) by collect().
_MODULES = [
    "sparkstreamingstateful_spark.operators.scans",
    "sparkstreamingstateful_spark.operators.projection",
    "sparkstreamingstateful_spark.operators.joins",
    "sparkstreamingstateful_spark.operators.aggregation",
    "sparkstreamingstateful_spark.operators.windows",
    "sparkstreamingstateful_spark.operators.sortset",
    "sparkstreamingstateful_spark.operators.nested",
    "sparkstreamingstateful_spark.operators.sqlsurface",
    "sparkstreamingstateful_spark.operators.udfs",
    "sparkstreamingstateful_spark.operators.llm_text",
    "sparkstreamingstateful_spark.operators.llm_vector",
    "sparkstreamingstateful_spark.streaming.queries",
]


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _QUERIES:
        raise ValueError(f"duplicate query key: {name}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def query(name: str, oracle: str | None = None):
    """Decorator: register a query function, optionally with oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        register(name, fn, oracle)
        return fn

    return deco


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import all operator modules (idempotent) and return the inventory."""
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            # Module not built yet (incremental milestones) — skip.
            pass
    return dict(_QUERIES), dict(_ORACLES)
