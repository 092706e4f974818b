"""Property test for the q116 sentence-split cross-engine parity.

The U1 delimiter-keeping split is the one operator whose oracle is a
nontrivial REGEX TRANSLATION rather than the same formula: Spark splits
on a lookbehind pattern (`(?<=T)(?=[^\\n])|(?<=T)\\n+`), while DuckDB's
RE2 has no lookbehind and replays it as the `[^T]*T|[^T]+` chunk
decomposition with leading-newline strip on follower chunks
(textstats._sentence_sql documents the equivalence argument). The
sf-corpus oracle parity checks exercise real text; this fuzzes the
adversarial space the argument actually hinges on — terminator runs,
newline runs, terminators at string edges, digit-only chunks — over the
full (doc_id, sent_idx, sentence, terminal_ok, is_digits) output.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

import setu_spark.operators.textstats as ts

#: terminators (ascii + Devanagari danda), newlines, and the quirk
#: characters of terminal_valid ("...", "####", trailing ,;:)"')
ALPHABET = st.sampled_from(list("a.!?\n #,१") + ["।"])
TEXTS = st.lists(
    st.text(alphabet=ALPHABET, min_size=0, max_size=24),
    min_size=1,
    max_size=24,
)


def _duck_rows(texts: list[str]) -> set:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    rows = con.execute(ts._sentence_sql()).fetchall()
    con.close()
    return set(rows)


@settings(max_examples=8, deadline=None)
@given(TEXTS)
def test_sentence_split_matches_duckdb_decomposition(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    orig = ts.load_table
    ts.load_table = lambda sp, d, n: df
    try:
        got = {
            (r.doc_id, r.sent_idx, r.sentence, r.terminal_ok, r.is_digits)
            for r in ts.q116_sentence_explode(spark, "ignored").collect()
        }
    finally:
        ts.load_table = orig
    assert got == _duck_rows(texts)


def _reference_split_with_delimiter(text: str) -> list[str]:
    """The reference's exact algorithm (filters.py:309-330): capture-split
    on the delimiter (terminator + optional newline run), rejoin each
    piece with its delimiter, keep a bare tail."""
    import re as _re

    pat = r"[.?!।|॥؟۔](?:\n+)?"
    lines = _re.split(f"({pat})", text)
    if len(lines) % 2 == 0:
        rng = range(0, len(lines), 2)
        return [lines[i] + lines[i + 1] for i in rng]
    rng = range(0, len(lines) - 1, 2)
    return [lines[i] + lines[i + 1] for i in rng] + [lines[-1]]


def test_sentence_split_wide_unicode_parity(spark):
    """Round-13 extension of the wide-unicode fuzz (same class as the
    U2-U5/U9/U11 pins): the hypothesis fuzzes above stay on a narrow
    BMP alphabet, and neither ever generates the NON-ASCII terminators
    the split class `[.?!।|॥؟۔]` actually supports (double danda,
    Arabic ؟, Urdu ۔, pipe) — nor astral chars, combining marks
    directly after a terminator, or ZWJ/ZWNJ runs, the exact
    code-point-vs-UTF-16 territory where the three-engine equivalence
    argument (JVM lookbehind ≡ RE2 chunk decomposition ≡ Python
    capture-split) could silently diverge. One deterministic corpus,
    one Spark job per surface. Zero divergences measured at
    introduction (400 vectors; checked against both the DuckDB oracle
    decomposition and the reference capture-split algorithm)."""
    import random

    from pyspark.sql import functions as F

    from test_text_properties import INDIC_CLUSTERS, WIDE_CHARS

    from setu_spark.functions.text import split_keep_delimiter

    rng = random.Random(1302)
    alpha = WIDE_CHARS + INDIC_CLUSTERS + list("॥؟۔|?#, \n") + ["।"]
    texts = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 20)))
        for _ in range(400)
    ]

    # surface 1: the full q116 pipeline vs the DuckDB RE2 decomposition
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    orig = ts.load_table
    ts.load_table = lambda sp, d, n: df
    try:
        got = {
            (r.doc_id, r.sent_idx, r.sentence, r.terminal_ok, r.is_digits)
            for r in ts.q116_sentence_explode(spark, "ignored").collect()
        }
    finally:
        ts.load_table = orig
    want = _duck_rows(texts)
    assert got == want, (got - want, want - got)

    # surface 2: split_keep_delimiter vs the reference capture-split
    rows = (
        spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
        .select("i", split_keep_delimiter(F.col("t")).alias("v"))
        .collect()
    )
    for r in rows:
        ref = [
            c
            for c in _reference_split_with_delimiter(texts[r.i])
            if c != ""
        ]
        assert r.v == ref, (repr(texts[r.i]), r.v, ref)


@settings(max_examples=10, deadline=None)
@given(st.text(alphabet=ALPHABET, min_size=0, max_size=40))
def test_split_keep_delimiter_matches_reference_algorithm(spark, text):
    """Engine ≡ the reference's own capture-split semantics, modulo the
    ONE declared divergence: the reference's odd/even rejoin emits ''
    elements (a trailing one when text ends with a terminator; interior
    ones cannot occur) that extraction never produces."""
    from pyspark.sql import functions as F

    from setu_spark.functions.text import split_keep_delimiter

    got = (
        spark.createDataFrame([(text,)], ["t"])
        .select(split_keep_delimiter(F.col("t")).alias("v"))
        .head()
        .v
    )
    want = [c for c in _reference_split_with_delimiter(text) if c != ""]
    assert got == want, (text, got, want)
