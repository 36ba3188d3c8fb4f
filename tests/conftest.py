"""Shared pytest fixtures: one SparkSession per test run, a DuckDB oracle
connection per scale factor, and the canonicalizing compare helper that
mirrors the driver's t2 loop (row-count + schema-width + order-insensitive
value comparison; SURVEY.md §5.2.1)."""

from __future__ import annotations

import decimal
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreamingstateful_spark.catalog import TABLE_NAMES, table_path
from sparkstreamingstateful_spark.session import get_spark

SF_UNIT = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # local[*] (32 threads here): this VM's scheduler degrades low-thread JVM
    # workloads badly (measured: local[4] 12-17s vs local[32] 0.5-1.5s for the
    # same 600k-row agg), so tests use full parallelism + AQE coalescing.
    s = get_spark(app_name="sss-spark-tests", master="local[*]", shuffle_partitions=8)
    yield s
    s.stop()


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    return _duck_con(SF_UNIT)


@pytest.fixture(scope="session")
def duck_t2():
    return _duck_con(SF_T2)


def canonical_cell(v, *, strict: bool = True) -> str:
    """One cell → canonical string (shared by both engines' outputs).

    STRICT by design (r1 lesson): the driver's canonicalizer distinguishes
    int from float (``7`` vs ``7.0``) and Decimal from float64, and it
    CRASHES on array/map/struct cells (pandas sort_values → "unhashable
    type: numpy.ndarray"). The local mirror must therefore be at least as
    strict: full-precision float repr, type-distinct Decimal marker, and a
    hard error on nested cells in H-checked outputs.
    """
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # -0.0 → 0.0
        return repr(v)  # full precision; distinguishes 7.0 from int 7
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"  # never matches a float — decimals must not leak
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or isinstance(v, dict) or hasattr(v, "asDict"):
        if strict:
            raise AssertionError(
                f"nested cell {type(v).__name__} in H-checked output — the "
                "driver canonicalizer crashes on these; serialize to string "
                f"in the final projection: {v!r}"
            )
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(canonical_cell(x, strict=False) for x in v) + "]"
        d = v if isinstance(v, dict) else v.asDict()
        return (
            "{"
            + ",".join(f"{k}:{canonical_cell(x, strict=False)}" for k, x in sorted(d.items()))
            + "}"
        )
    if hasattr(v, "isoformat"):  # datetime / date
        return v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    """Columns sorted by name, rows rendered and sorted — order-insensitive,
    mirroring the driver's value-hash."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canonical_cell(r[i]) for i in order) for r in rows)


# Types the driver's canonicalizer can sort/hash. Arrays, maps, structs
# crash it ("unhashable type: numpy.ndarray", r1); DecimalType hashes
# differently from float64 (r1 scalar_cast FAIL). Every H-checked query's
# final projection must stay inside this set — serialize anything nested
# to a string first. (Spark simpleString() spellings.)
DRIVER_SAFE_TYPES = (
    "bigint",
    "int",
    "smallint",
    "tinyint",
    "double",
    "float",
    "string",
    "boolean",
    "date",
    "timestamp",
    "timestamp_ntz",
    "binary",
)


def assert_driver_safe_schema(spark_df, *, name: str = "?") -> None:
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in spark_df.schema.fields
        if f.dataType.simpleString() not in DRIVER_SAFE_TYPES
    ]
    assert not bad, (
        f"[{name}] driver-hostile output column(s) {bad} — the driver "
        "canonicalizer crashes on nested types and mis-hashes decimals; "
        "cast/serialize in the final projection"
    )


def compare(spark_df, duck_con, sql: str, *, name: str = "?") -> None:
    """Assert a Spark DataFrame equals a DuckDB result (driver-t2 mirror),
    including that its output schema is driver-canonicalizer-safe."""
    assert_driver_safe_schema(spark_df, name=name)
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    d_rel = duck_con.sql(sql)
    d_cols = list(d_rel.columns)
    d_rows = [tuple(r) for r in d_rel.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"[{name}] column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"[{name}] row count: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_canon = canonical_rows(s_cols, s_rows)
    d_canon = canonical_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            f"  spark: {a}\n  duck : {b}"
            for a, b in zip(s_canon, d_canon)
            if a != b
        ][:5]
        raise AssertionError(
            f"[{name}] value mismatch ({sum(a != b for a, b in zip(s_canon, d_canon))} rows differ):\n"
            + "\n".join(diffs)
        )
