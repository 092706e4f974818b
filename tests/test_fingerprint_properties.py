"""Property tests for the Rabin-Karp fingerprint three-form identity.

q36/q37/q111's winnowed-fingerprint family keeps three implementations
of the same k-gram polynomial — the numpy kernel (`_fp_arrays`, the
production path), the Spark-SQL per-row twin (`_fp_array_spark`), and
the DuckDB replay (`_fp_array_sql`) — and their oracles depend on the
hash SETS agreeing for any text (array order differs by design:
np.unique sorts, the SQL forms keep first-occurrence order). Fuzzed
over mixed-codepoint corpora including astral-plane chars (all three
engines index substrings by codepoint, not byte or UTF-16 unit — this
is the property that would silently break on a byte-indexed rewrite).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import setu_spark.operators.textstats as ts

#: few distinct chars → many repeated k-grams (exercises distinct);
#: multi-byte + astral chars exercise codepoint indexing; short texts
#: exercise the len < FP_K empty-array case
ALPHABET = st.sampled_from(list("ab c.") + ["é", "ß", "।", "🙂"])
TEXTS = st.lists(
    st.text(alphabet=ALPHABET, min_size=0, max_size=40),
    min_size=1,
    max_size=32,
)


def _py_sets(texts: list[str]) -> list[set]:
    return [
        set() if fps is None else set(fps.tolist())
        for fps in ts._fp_arrays(pd.Series(texts))
    ]


def _duck_sets(texts: list[str]) -> list[set]:
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    rows = con.execute(
        f"SELECT i, {ts._fp_array_sql()} FROM t ORDER BY i"
    ).fetchall()
    con.close()
    return [set(r[1]) for r in rows]


@settings(max_examples=30, deadline=None)
@given(TEXTS)
def test_numpy_kernel_matches_duckdb_replay(texts):
    assert _py_sets(texts) == _duck_sets(texts)


@settings(max_examples=6, deadline=None)
@given(TEXTS)
def test_spark_twin_matches_numpy_kernel(spark, texts):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "text"]
    )
    got = {
        r.i: set(r.a)
        for r in df.select(
            "i", F.expr(ts._fp_array_spark()).alias("a")
        ).collect()
    }
    want = _py_sets(texts)
    for i, t in enumerate(texts):
        assert got[i] == want[i], (t, got[i], want[i])
