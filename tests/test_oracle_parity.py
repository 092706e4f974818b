"""Every registered query must match its DuckDB oracle at sf0.001.

This is a local replica of the driver's t2 correctness gate (run per-round
at sf0.01); keeping it green here means the gate stays green there.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare_frames, register_views

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle without query: {missing}"


def test_front_window_well_formed():
    """The driver checks roughly the first 50 registrations; _FRONT pins
    that window. Every name must be registered (the assert in
    _window_ordered), the list must be exactly window-sized with no
    duplicates (round 4's 57-entry list silently dropped its tail), and
    the returned ordering must actually lead with it."""
    front = entrymod._FRONT
    assert len(front) == 50
    assert len(set(front)) == len(front)
    assert set(front) <= set(QUERIES)
    assert list(QUERIES)[: len(front)] == list(front)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    register_views(duck, SF_ORACLE)
    spark_pdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    oracle_pdf = duck.execute(ORACLES[name]).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_oracleless_query_runs(name, spark):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert df.schema.fields


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_no_registered_query_emits_complex_columns(spark):
    """The driver canonicalizer sorts result columns with pandas —
    array/map/struct output crashes it (`unhashable type: 'list'`,
    q84 round 4). Every registered query must emit scalar columns only.
    Note this is NOT free: building each DataFrame runs the
    constructors' driver-side jobs (q60/q63/q126/q131 collect tiny
    codebooks; q117-q120 write their roundtrip sinks) — cost is one
    extra pass of the cheap sf0.001 builders, accepted for the
    registry-wide guarantee."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = {}
    for name, fn in QUERIES.items():
        for f in fn(spark, SF_ORACLE).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.setdefault(name, []).append(f.name)
    assert not bad, f"complex output columns: {bad}"
