"""Property tests for the events/props JSON dialect cross-engine parity.

The U5 anchor bug proved the hypothesis fuzz finds what the oracle gate
can't: the driver testdata never contains the falsifying shape, so only
adversarial generation exercises the semantics boundary. Events was the
family with the least fuzz coverage (round-7 VERDICT task 8) — its two
parse contracts are:

* q137's SHAPE GUARD: a strict regexp gates the typed decode in BOTH
  engines because their malformed-JSON semantics differ (Spark from_json
  → NULL; DuckDB json_extract → throw; DuckDB CAST coerces string-typed
  numbers where Spark from_json nulls them). The guard must classify
  every possible payload identically in Java regex and RE2 — trailing
  line terminators (the U5 class: Java ``$`` matches before a final
  newline, RE2 ``$`` does not), 19-digit overflow numbers, astral-plane
  keys, surrounding whitespace.
* q74's PATH EXTRACTION: ``get_json_object($.k) CAST BIGINT`` vs DuckDB
  ``CAST(json_extract($.k) AS BIGINT)`` agree on well-formed props whose
  ``k`` is an int64-range integer — arbitrary other keys (astral-plane
  names, unicode string values, nested objects) must not disturb it.

Both tests drive the REGISTERED query functions (load_events
monkeypatched), so what's fuzzed is exactly what the driver gates.
"""

from __future__ import annotations

import json

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import __spark_entry__ as entrymod
import setu_spark.operators.events as ev_mod

# ----------------------------------------------------------- q137 guard

#: adversarial payload fragments: exact shape, near-shape (spacing,
#: sign, width), trailing terminators (the U5 class), astral plane,
#: non-JSON junk
_NUMS = st.one_of(
    st.integers(min_value=-(10**19), max_value=10**19),  # incl. 19-20 digit
    st.just(0),
)
_SHAPED = _NUMS.map(lambda n: '{"k": %d}' % n)
_NEAR = st.one_of(
    _NUMS.map(lambda n: '{"k":%d}' % n),        # no space
    _NUMS.map(lambda n: '{"k": %d} ' % n),      # trailing space
    _NUMS.map(lambda n: ' {"k": %d}' % n),      # leading space
    _NUMS.map(lambda n: '{"K": %d}' % n),       # wrong case key
    _NUMS.map(lambda n: '{"k": "%d"}' % n),     # string-typed number
    st.just('{"k": 1, "j": 2}'),
    st.just('{"k": {"a": 1}}'),
    st.just(""),
    st.just("not json"),
    st.just('{"k𐍈": 5}'),
)
_TERMINATED = st.tuples(
    st.one_of(_SHAPED, _NEAR), st.sampled_from(["", "\n", "\r\n", "\n\n"])
).map(lambda t: t[0] + t[1])

PROPS_LISTS = st.lists(
    st.one_of(_SHAPED, _NEAR, _TERMINATED), min_size=1, max_size=16
)


def _run_q137(spark, props: list[str]):
    df = spark.createDataFrame(
        [(f"t{i % 3}", p) for i, p in enumerate(props)],
        "event_type string, props string",
    )
    orig = ev_mod.load_events
    ev_mod.load_events = lambda sp, d: df
    try:
        rows = entrymod.queries()["q137_props_schema_parse"](
            spark, "ignored"
        ).collect()
    finally:
        ev_mod.load_events = orig
    return {
        (r.event_type, r.n_parsed, r.n_unparsed, r.k_min, r.k_max, r.k_avg)
        for r in rows
    }


def _duck_q137(props: list[str]):
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, props VARCHAR)")
    con.executemany(
        "INSERT INTO events VALUES (?, ?)",
        [(f"t{i % 3}", p) for i, p in enumerate(props)],
    )
    rows = con.execute(entrymod.oracle_sql()["q137_props_schema_parse"]).fetchall()
    con.close()
    return set(rows)


@settings(max_examples=10, deadline=None)
@given(PROPS_LISTS)
def test_q137_shape_guard_parity(spark, props):
    # the DuckDB arm THROWING is itself a failure: it means the guard
    # admitted a payload whose CAST the shape contract must protect
    assert _run_q137(spark, props) == _duck_q137(props)


def test_q137_pinned_vectors(spark):
    """The known falsifier classes, pinned as deterministic vectors:
    a payload ending '}\\n' was SHAPED under Java ``$`` (matches before
    a final line terminator) but unshaped under RE2 — the exact U5 bug
    class in the events dialect."""
    vectors = [
        '{"k": 7}\n',          # the \z fix target
        '{"k": 7}\r\n',
        '{"k": 7}',            # control: genuinely shaped
        '{"k": 9999999999999999999}',   # 19 digits: must stay UNSHAPED
        '{"k": -999999999999999999}',   # 18 digits signed: shaped
        '{"k": 1}\n\n',
        "",
    ]
    assert _run_q137(spark, vectors) == _duck_q137(vectors)


# ------------------------------------------------------ q74 extraction

_INT64 = st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1)
_EXTRA_KEY = st.sampled_from(["j", "k2", "k𐍈", "नाम", "a b"])
_EXTRA_VAL = st.one_of(
    st.integers(min_value=-100, max_value=100),
    st.text(
        alphabet=st.sampled_from(list("ab𐍈१\n\"\\ ")), max_size=6
    ),
    st.none(),
)


@st.composite
def _props_obj(draw):
    obj = {}
    if draw(st.booleans()):
        obj["k"] = draw(_INT64)
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        obj[draw(_EXTRA_KEY)] = draw(_EXTRA_VAL)
    return json.dumps(obj, ensure_ascii=False)


@settings(max_examples=10, deadline=None)
@given(st.lists(_props_obj(), min_size=1, max_size=16))
def test_q74_json_path_parity(spark, props):
    df = spark.createDataFrame(
        [(i, f"t{i % 3}", p) for i, p in enumerate(props)],
        "event_id long, event_type string, props string",
    )
    orig = ev_mod.load_events
    ev_mod.load_events = lambda sp, d: df
    try:
        got = {
            (r.event_id, r.k_value, r.event_type)
            for r in entrymod.queries()["q74_event_props_extract"](
                spark, "ignored"
            ).collect()
        }
    finally:
        ev_mod.load_events = orig
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, event_type VARCHAR,"
        " props VARCHAR)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?)",
        [(i, f"t{i % 3}", p) for i, p in enumerate(props)],
    )
    want = set(
        tuple(r)
        for r in con.execute(
            entrymod.oracle_sql()["q74_event_props_extract"]
        ).fetchall()
    )
    con.close()
    assert got == want
