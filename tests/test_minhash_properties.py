"""Property tests for the MinHash three-form identity.

The engine keeps THREE implementations of the same signature math —
the numpy Arrow kernel (`_minhash_udf`, the production path), the
per-row Spark HOF twin (`minhash_columns`, for composition), and the
DuckDB SQL replay (`_minhash_sql_cols`, every LSH oracle) — and the
whole dedup family's oracle gate rests on them staying value-identical
for ANY text. The hand-picked identity tests in test_dedup.py pin the
known quirks; these fuzz the space: multi-byte codepoints (ascii() =
first-char codepoint on all three engines), empty tokens from repeated
spaces, texts shorter than the shingle width (NULL signature on every
form), and duplicate shingles (distinct-before-min).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import setu_spark.operators.dedup as dd

#: mixed alphabet biased toward collisions: few letters → repeated
#: words/shingles; multi-byte chars exercise codepoint (not byte)
#: hashing; runs of spaces exercise the empty-token filter
ALPHABET = st.sampled_from(list("ab c") + ["।", "é", "ß", "॥", "🙂"])
TEXTS = st.lists(
    st.text(alphabet=ALPHABET, min_size=0, max_size=40),
    min_size=1,
    max_size=32,
)


def _duck_signatures(texts: list[str]) -> list[list]:
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(texts))
    )
    cols = ", ".join(dd._minhash_sql_cols())
    out = con.execute(f"SELECT i, {cols} FROM t ORDER BY i").fetchall()
    con.close()
    return [list(row[1:]) for row in out]


def _numpy_signatures(texts: list[str]) -> list[list]:
    pdf = dd._minhash_udf.func(pd.Series(texts))
    return [
        [None if pd.isna(v) else int(v) for v in row]
        for row in pdf.itertuples(index=False)
    ]


@settings(max_examples=30, deadline=None)
@given(TEXTS)
def test_numpy_kernel_matches_duckdb_replay(texts):
    assert _numpy_signatures(texts) == _duck_signatures(texts)


@settings(max_examples=6, deadline=None)
@given(TEXTS)
def test_spark_hof_twin_matches_numpy_kernel(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "text"]
    )
    got = {
        r.i: [r[f"m{j}"] for j in range(dd.NUM_PERM)]
        for r in df.select("i", *dd.minhash_columns()).collect()
    }
    want = _numpy_signatures(texts)
    for i, t in enumerate(texts):
        assert got[i] == want[i], (t, got[i], want[i])
