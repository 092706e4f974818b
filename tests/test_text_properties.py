"""Property tests: the native-expression text operators must equal the
reference's Python semantics on arbitrary strings — including the quirk
cases (empty tokens, unicode digits, terminal-punct exceptions). This is
SURVEY §7's 'quirk parity' hard part, fuzzed rather than hand-picked.

Strategy: hypothesis generates the corpus driver-side (deterministic
seeds), ONE Spark job evaluates every operator over the whole batch, and
the assertion compares against pure-Python ground truth row by row."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from setu_spark.functions.text import (
    TERMINAL_EXCEPTIONS,
    TERMINAL_PUNCTUATIONS,
    byte_count,
    char_count,
    is_number,
    terminal_valid,
    word_count,
)

#: mixed alphabet: ascii words/punct, devanagari, unicode digits, spaces
ALPHABET = st.sampled_from(
    list("ab  .!?#:") + ["।", "॥", "१", "२", "३", "٣", "é", "ß"]
)
TEXTS = st.lists(
    st.text(alphabet=ALPHABET, min_size=0, max_size=24),
    min_size=1,
    max_size=48,
)


def _py_terminal_valid(s: str) -> bool:
    ends = any(s.endswith(p) for p in TERMINAL_PUNCTUATIONS)
    return ends and not any(s.endswith(e) for e in TERMINAL_EXCEPTIONS)


@settings(max_examples=12, deadline=None)
@given(TEXTS)
def test_counting_and_predicates_match_python(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "t"]
    )
    rows = {
        r.i: r
        for r in df.select(
            "i",
            word_count("t").alias("wc"),
            char_count("t").alias("cc"),
            byte_count("t").alias("bc"),
            is_number("t").alias("num"),
            terminal_valid("t").alias("term"),
        ).collect()
    }
    for i, t in enumerate(texts):
        r = rows[i]
        assert r.wc == len(t.split(" ")), (t, r.wc)          # U2 quirk
        assert r.cc == len(t), t
        assert r.bc == len(t.encode("utf-8")), t
        assert r.num == (len(t) > 0 and all(c.isdigit() for c in t)), t
        assert r.term == _py_terminal_valid(t), t


def test_ngram_novelty_planted_histogram(spark):
    """q146 deciles on planted docs: a mirrored pair shares every
    shingle (decile 0), a fully original doc is all-unique (decile 9),
    and a 2-word doc cannot shingle (decile -1)."""
    import setu_spark.operators.textstats as ts

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"),
         (3, "x y z w"), (4, "q r")],
        ["doc_id", "text"],
    )
    orig = ts.load_table
    ts.load_table = lambda sp, d, n: docs
    try:
        hist = {
            r.novelty_decile: r.n_docs
            for r in ts.q146_ngram_novelty(spark, "x").collect()
        }
    finally:
        ts.load_table = orig
    assert hist == {0: 2, 9: 1, -1: 1}


def test_winnowed_novelty_matches_kernel_vs_hof_twin(spark):
    """q148's numpy winnow kernel must produce the identical sampled
    hash sets as filtering the HOF shingle-hash twin — the same
    three-form discipline the MinHash family keeps."""
    from pyspark.sql import functions as F

    import setu_spark.operators.textstats as ts
    from setu_spark.operators.dedup import _shingle_hashes_expr

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "x y"),                       # too short: empty
         (3, "a b  c d"),                  # double space: filtered words
         (4, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    hof = F.expr(
        f"filter({_shingle_hashes_expr()}, h -> h % {ts.WINNOW_W} == 0)"
    )
    rows = docs.select(
        "doc_id",
        F.array_sort(ts._winnowed_shingle_udf("text")).alias("k"),
        F.array_sort(hof).alias("t"),
    ).collect()
    for r in rows:
        assert r.k == r.t, (r.doc_id, r.k, r.t)
