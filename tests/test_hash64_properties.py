"""Property test for the hash64 Spark↔DuckDB identity.

Every md5-derived pseudo-random decision in the engine — sampling keys
(q29/q86/q87), split assignment (q98/q144), MinHash band hashes — rests
on `hash64` (Spark `conv(substr(md5 …))`) and `hash64_sql` (DuckDB
`'0x' || substr(md5 …)` cast) agreeing for any string. The two parse
hex with DIFFERENT mechanisms (base-conversion vs literal-prefix cast),
so this is a genuine cross-engine contract, fuzzed here over
mixed-codepoint strings (md5 operates on UTF-8 bytes in both engines)
and both salted and unsalted forms.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from setu_spark.functions.hashes import hash64, hash64_sql

ALPHABET = st.sampled_from(list("ab c|'\"\\") + ["é", "ß", "।", "🙂"])
TEXTS = st.lists(
    st.text(alphabet=ALPHABET, min_size=0, max_size=24),
    min_size=1,
    max_size=24,
)


def _duck(texts: list[str], salt: str | None) -> list[int]:
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    rows = con.execute(
        f"SELECT i, {hash64_sql('s', salt)} FROM t ORDER BY i"
    ).fetchall()
    con.close()
    return [r[1] for r in rows]


@settings(max_examples=8, deadline=None)
@given(TEXTS)
def test_hash64_matches_duckdb(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, s string"
    )
    for salt in (None, "perm3"):
        got = [
            r.h
            for r in df.select("i", hash64("s", salt).alias("h"))
            .orderBy("i")
            .collect()
        ]
        assert got == _duck(texts, salt), salt
