"""load_events dtype dispatch: the events parquet has shipped with two
different physical timestamp types across testdata generations —
TIMESTAMP(NANOS) (Spark 4 reads it as int64 only under the
``nanosAsLong`` conf) and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ).
``load_events`` must produce the identical integer-µs ``ts_us`` column
from either encoding (round 3 broke when the testdata flipped ns→µs and
the loader assumed the int64 path)."""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from setu_spark.operators.events import load_events

_TS = [
    datetime(2024, 1, 1, 0, 0, 0),
    datetime(2024, 1, 1, 0, 30, 15),
    datetime(2024, 3, 7, 23, 59, 59, 999999),
]
_EPOCH = datetime(1970, 1, 1)
_EXPECT_US = [
    ((t - _EPOCH).days * 86_400 + (t - _EPOCH).seconds) * 1_000_000
    + (t - _EPOCH).microseconds
    for t in _TS
]


def _write_events(unit: str, value_type: pa.DataType | None = None) -> str:
    d = tempfile.mkdtemp(prefix=f"setu-events-{unit}-")
    vt = value_type or pa.float64()
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["click", "view", "click"]),
            "value": pa.array([1.0, 2.0, 3.0]).cast(vt),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_ts_us_exact_for_both_physical_types(spark, unit):
    d = _write_events(unit)
    try:
        got = {
            r.event_id: r.ts_us
            for r in load_events(spark, d).select("event_id", "ts_us").collect()
        }
        assert got == {i + 1: us for i, us in enumerate(_EXPECT_US)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_hostile_session_tz_not_mutated(spark):
    """ts_us must be correct under a non-UTC session TZ, and load_events
    must NOT touch spark.sql.session.timeZone (round-4 ADVICE: the old
    save-nothing UTC override permanently changed a harness-provided
    session's behavior)."""
    d = _write_events("us")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = {
            r.event_id: r.ts_us
            for r in load_events(spark, d).select("event_id", "ts_us").collect()
        }
        assert got == {i + 1: us for i, us in enumerate(_EXPECT_US)}
        assert (
            spark.conf.get("spark.sql.session.timeZone")
            == "America/New_York"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
        shutil.rmtree(d, ignore_errors=True)


def test_value_dtype_drift_fails_loudly(spark):
    """A decimal-typed value column (a plausible future testdata flip,
    like round 3's ts ns->us) must raise at load with a pointed message,
    not surface as a hash mismatch downstream."""
    d = _write_events("us", value_type=pa.decimal128(10, 2))
    try:
        with pytest.raises(TypeError, match="events.value expected double"):
            load_events(spark, d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ns_and_us_files_agree(spark):
    d_us, d_ns = _write_events("us"), _write_events("ns")
    try:
        a = load_events(spark, d_us).select("event_id", "ts_us").collect()
        b = load_events(spark, d_ns).select("event_id", "ts_us").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    finally:
        shutil.rmtree(d_us, ignore_errors=True)
        shutil.rmtree(d_ns, ignore_errors=True)
