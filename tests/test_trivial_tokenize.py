"""U11 tokenizer parity — the native ``trivial_tokenize`` twin.

Three rings, strongest available evidence in each environment:
pinned vectors (the semantics spelled out by hand, including the
position-0 num-seq quirk), a seeded cross-engine fuzz (Python twin vs
the generated DuckDB twin the oracles embed), and an extras-gated
differential against the REAL indicnlp where that package exists (the
same pattern as the U9 normalizer differential in test_plug_extras.py).
"""

from __future__ import annotations

import importlib.util
import random

import duckdb
import pytest

from setu_spark.functions.tokenize import (
    trivial_tokenize,
    trivial_tokenize_indic,
    trivial_tokenize_sql,
    trivial_tokenize_urdu,
)


def test_trivial_tokenize_pinned_vectors():
    cases = [
        # plain text: identical to split(' ')
        ("hello world", ["hello", "world"]),
        # punctuation severed into standalone tokens
        ("a,b", ["a", ",", "b"]),
        ("x. y! z?", ["x", ".", "y", "!", "z", "?"]),
        ("[brackets] (parens)", ["[", "brackets", "]", "(", "parens", ")"]),
        # dandas are punctuation on the indic path
        ("नमस्ते। done", ["नमस्ते", "।", "done"]),
        # tabs become spaces; newlines ride INSIDE tokens (the library
        # collapses only spaces)
        ("a\tb", ["a", "b"]),
        ("a\nb", ["a\nb"]),
        # space runs collapse, edges strip
        ("  double  spaces ", ["double", "spaces"]),
        # number sequences re-merge (severed "2 . 3" comes back)
        ("a 2.3 b", ["a", "2.3", "b"]),
        ("v1.2.3 ok", ["v1.2.3", "ok"]),
        ("start 1, 2, 3 end", ["start", "1,2,3", "end"]),
        # ...EXCEPT at position 0 (the library's start > prev guard)
        ("2.3 starts", ["2", ".", "3", "starts"]),
        ("1, 2, 3 at start", ["1", ",", "2", ",", "3", "at", "start"]),
        # empty / whitespace-only: ''.split(' ') == ['']
        ("", [""]),
        (" ", [""]),
        ("...", [".", ".", "."]),
    ]
    for text, expected in cases:
        assert trivial_tokenize_indic(text) == expected, repr(text)


def test_urdu_dispatch():
    # urdu full stop (U+06D4) severs only on the ur path; dandas only
    # on the indic path
    assert trivial_tokenize("ہے۔ اگلا", "ur") == ["ہے", "۔", "اگلا"]
    assert trivial_tokenize("ہے۔ اگلا", "hi") == ["ہے۔", "اگلا"]
    assert trivial_tokenize("क। ख", "hi") == ["क", "।", "ख"]
    assert trivial_tokenize("क। ख", "ur") == ["क।", "ख"]


def test_fast_path_equals_full_pipeline_fuzz():
    """The punct-free fast path (one regex scan → split(' ')) must be
    byte-identical to the full sever/collapse/merge pipeline — fuzzed
    across strings that straddle the bail condition (single spaces,
    newlines, near-miss edge spaces)."""
    from setu_spark.functions.tokenize import _SEVER_INDIC, _tokenize

    rng = random.Random(13)
    alpha = list("ab \n12xy.")  # mostly clean, occasional punct
    for _ in range(1500):
        text = "".join(
            rng.choice(alpha) for _ in range(rng.randint(0, 20))
        )
        assert trivial_tokenize_indic(text) == _tokenize(
            text, _SEVER_INDIC
        ), repr(text)


def test_python_twin_matches_duckdb_twin_fuzz():
    """The oracle fragment and the Arrow-kernel tokenization must be
    value-identical — seeded fuzz over the full quirk surface
    (punct/digit/space/tab/newline/danda soup)."""
    con = duckdb.connect()
    sql = f"SELECT {trivial_tokenize_sql('?')} AS toks"
    rng = random.Random(42)
    alpha = list("ab 12.,:/!?।॥\t\n-_()[]^\\'\"x9 0")
    for _ in range(500):
        text = "".join(
            rng.choice(alpha) for _ in range(rng.randint(0, 24))
        )
        got = con.execute(sql, [text]).fetchone()[0]
        assert got == trivial_tokenize_indic(text), repr(text)


@pytest.mark.skipif(
    importlib.util.find_spec("indicnlp") is None,
    reason="indic extra not installed",
)
def test_differential_vs_real_indicnlp():
    """With the real library installed, the twin must agree token for
    token on both dispatch paths."""
    from indicnlp.tokenize.indic_tokenize import (
        trivial_tokenize as real_tokenize,
    )

    rng = random.Random(7)
    alpha = list("ab 12.,:/!?।॥۔،\t\n-_()[]^\\'\"x9 0कखہے")
    vectors = ["hello, world. 2.3 v1.2.3", "2.3 starts", "नमस्ते। ठीक"] + [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        for _ in range(500)
    ]
    for text in vectors:
        for lang in ("hi", "ur", "en"):
            assert trivial_tokenize(text, lang) == real_tokenize(
                text, lang
            ), (repr(text), lang)


def test_urdu_has_no_numseq_merge():
    """The library's urdu path returns straight after the space
    collapse — number sequences stay severed."""
    assert trivial_tokenize_urdu("a 2.3 b") == ["a", "2", ".", "3", "b"]


def test_word_rep_kernel_tokenizes_punctuation(spark):
    """The q42 Arrow kernel on PUNCTUATED text (the quirk surface the
    clean testdata cannot exercise): 'x. x. x.' tokenizes to
    [x . x . x .] whose 3-grams are (x,.,x) ×2, (.,x,.) ×2 — total 4,
    all repeated → score 1.0. Under the old split(' ') tokenization the
    grams were the three distinct ('x.','x.','x.') windows... one gram
    ('x.','x.','x.') with count 1 → score 0.0 — so this pins the
    severing is live, and the lang column dispatches (urdu text keeps
    dandas inside tokens)."""
    from setu_spark.operators.textstats import _word_rep_udf
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("d1", "x. x. x.", "en"), ("d2", "क। ख", "ur")],
        "doc_id string, text string, lang string",
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id", _word_rep_udf("text", "lang").alias("r")
        )
        .select("doc_id", "r.*")
        .collect()
    }
    # indic path: tokens [x . x . x .] -> 4 3-grams, every gram count 2
    assert rows["d1"].total_ngrams == 4
    assert rows["d1"].repetition_score == 1.0
    # ur path: danda NOT severed -> tokens [क। ख] -> no 3-grams
    assert rows["d2"].total_ngrams == 0
    assert rows["d2"].repetition_score is None


def test_twins_agree_on_wide_unicode_fuzz():
    """Round-12 VERDICT task 6: the cross-engine fuzz above runs on a
    BMP alphabet, but the tokenizer's real domain is crawl text —
    astral digits/letters (surrogate-pair territory in the JVM),
    combining marks, ZWJ/ZWNJ conjunct clusters, decomposed nuktas.
    Both parity surfaces are pinned on that domain in one loop:
    the Python twin vs the generated DuckDB twin (the oracle pair),
    and the punct-free fast path vs the full sever/collapse/merge
    pipeline (whose bail regex must not misread a wide char). Zero
    divergences measured at introduction (4000 vectors)."""
    from test_text_properties import INDIC_CLUSTERS, WIDE_CHARS

    from setu_spark.functions.tokenize import _SEVER_INDIC, _tokenize

    con = duckdb.connect()
    sql = f"SELECT {trivial_tokenize_sql('?')} AS toks"
    rng = random.Random(1301)
    alpha = WIDE_CHARS + INDIC_CLUSTERS + list("॥\t,09")
    for _ in range(600):
        text = "".join(
            rng.choice(alpha) for _ in range(rng.randint(0, 16))
        )
        py = trivial_tokenize_indic(text)
        assert con.execute(sql, [text]).fetchone()[0] == py, repr(text)
        assert _tokenize(text, _SEVER_INDIC) == py, repr(text)
