"""Driver contract for the spark-graft builder (PySpark target).

Thin view over :mod:`sparkstreamingstateful_spark.registry` — every operator
from SURVEY.md §2 registers a ``(spark, sf_dir) -> DataFrame`` callable and
(for H-checked rows) matching DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkstreamingstateful_spark import registry  # noqa: E402
from sparkstreamingstateful_spark.catalog import SMOKE_SF_DIR  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shape aggregation) on sf0.001."""
    queries, _ = registry.collect()
    return queries["agg_hash_q1"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = registry.collect()
    return q


def oracle_sql() -> dict[str, str]:
    _, o = registry.collect()
    return o
