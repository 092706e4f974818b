"""Quirk-exact unit vectors for the text-function library (SURVEY.md §2.10).

Each case pins a reference-UDF semantic the rebuild must reproduce,
including the deliberate quirks (empty-token counting, delimiter-keeping
splits, terminal-punctuation exceptions, Unicode digit classes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from setu_spark.functions.text import (
    byte_count,
    char_count,
    digit_ratio,
    is_number,
    split_keep_delimiter,
    symbol_ratio,
    terminal_valid,
    word_count,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["t"]).select(
        col.alias("v")
    ).head().v


# U2: len(line.split(' ')) — counts empty tokens; '' → 1
@pytest.mark.parametrize(
    "text,expected",
    [
        ("", 1),
        ("hello", 1),
        ("hello world", 2),
        ("a  b", 3),          # double space → empty token counted
        (" lead", 2),
        ("trail ", 2),
    ],
)
def test_word_count_quirk(spark, text, expected):
    assert _one(spark, text, word_count(F.col("t"))) == expected
    assert len(text.split(" ")) == expected  # the Python semantic it mirrors


# U3/U4
def test_char_and_byte_count(spark):
    assert _one(spark, "héllo", char_count(F.col("t"))) == 5
    assert _one(spark, "héllo", byte_count(F.col("t"))) == 6
    assert _one(spark, "नमस्ते", char_count(F.col("t"))) == 6
    assert _one(spark, "नमस्ते", byte_count(F.col("t"))) == 18


# U5: str.isdigit-alike — Unicode decimal digits count
@pytest.mark.parametrize(
    "text,expected",
    [
        ("12345", True),
        ("१२३", True),        # Devanagari digits (isdigit → True)
        ("12a", False),
        ("", False),
        ("12.5", False),
        # \z-anchor regression vectors: Java's $ matches BEFORE a final
        # line terminator, so these were True under the old ^...$ form
        # while Python str.isdigit() and the DuckDB oracle say False.
        ("१\n", False),
        ("123\n", False),
        ("१", True),
        ("123\r\n", False),
        ("12\n3", False),
    ],
)
def test_is_number(spark, text, expected):
    assert _one(spark, text, is_number(F.col("t"))) is expected


# U17: terminal punctuation with '...' / '####' exceptions
@pytest.mark.parametrize(
    "text,expected",
    [
        ("This ends well.", True),
        ("Question?", True),
        ("trailing ellipsis...", False),
        ("markdownish ####", False),
        ("no terminal", False),
        ("quoted'", True),
        # round-8 U17 fix: the reference tuple includes the Devanagari
        # danda/double-danda and Urdu question/full stops
        ("हिन्दी वाक्य।", True),
        ("दोहरा॥", False),   # ॥ (U+0965) is NOT in the tuple — ।। (two
                              # single dandas) is, and this is one char
        ("दो दंड।।", True),
        ("اردو سوال؟", True),
        ("اردو جملہ۔", True),
    ],
)
def test_terminal_valid(spark, text, expected):
    assert _one(spark, text, terminal_valid(F.col("t"))) is expected


# U1: split keeping the delimiter attached to the preceding chunk
@pytest.mark.parametrize(
    "text,expected",
    [
        ("One. Two! Three?", ["One.", " Two!", " Three?"]),
        ("Hindi।Next", ["Hindi।", "Next"]),
        # round-8 U1 fix: the reference attaches the terminator's
        # trailing newlines to the chunk (its captured delimiter is
        # `T(?:\n+)?`) — they are NOT eaten
        ("A.\nB.", ["A.\n", "B."]),
        ("A.\n\nB", ["A.\n\n", "B"]),
        ("nodelim", ["nodelim"]),
        ("mid\nline.", ["mid\nline."]),  # newline NOT after a terminator
    ],
)
def test_split_keep_delimiter(spark, text, expected):
    assert _one(spark, text, split_keep_delimiter(F.col("t"))) == expected


# U15-family ratios
def test_symbol_ratio(spark):
    assert _one(spark, "abcd", symbol_ratio(F.col("t"))) == 0.0
    assert _one(spark, "a@#$", symbol_ratio(F.col("t"))) == 0.75
    # reference parity (round 8): empty -> None (filters.py returns
    # None when char_count is 0), not 0.0
    assert _one(spark, "", symbol_ratio(F.col("t"))) is None
    # the class is the reference's script-block union, NOT \p{L}:
    # a danda (in the Devanagari block) is VALID...
    assert _one(spark, "नमस्ते।", symbol_ratio(F.col("t"))) == 0.0
    # ...a Devanagari digit too (block member; ASCII-only digit rule
    # applies outside the blocks)
    assert _one(spark, "१२३", symbol_ratio(F.col("t"))) == 0.0
    # ...but an unlisted-script letter is a SYMBOL
    assert _one(spark, "дabc", symbol_ratio(F.col("t"))) == 0.25
    # and a tab is a symbol (exceptions are exactly space and \n)
    r = _one(spark, "a\tb", symbol_ratio(F.col("t")))
    assert abs(r - 1 / 3) < 1e-9, r
    # supplementary-plane block member (Rumi numeral) is valid
    assert _one(spark, "\U00010E60a", symbol_ratio(F.col("t"))) == 0.0


def test_is_num_or_punc_only_reference_semantics(spark):
    """U16 exact semantics (round-8 fix): isnumeric OR non-letter
    fraction >= 0.4 — NOT "entirely numbers/punctuation" (the old
    form). Vectors hand-computed from reference filters.py:98-188."""
    from setu_spark.functions.text import is_num_or_punc_only

    cases = [
        ("12345", True),           # isnumeric
        ("@#$% @#$%", True),       # all punct -> ratio 1.0
        ("abc 123 456", True),     # 6 digits / 11 chars = 0.545 >= 0.4
        ("abcdefgh 12", False),    # 2 / 11 = 0.18 < 0.4
        ("", False),               # empty -> ratio None -> False
        ("½", True),          # VULGAR FRACTION ONE HALF: isnumeric
        ("१२३", True),  # Devanagari digits: both branches
        # danda is OUTSIDE the U16 letter class (0964 excluded) but one
        # char of seven stays under the threshold
        ("नमस्ते।", False),
        # unlisted-script letters are all invalid -> flagged
        ("да ok", True),  # 2 Cyrillic / 5 = 0.4 >= 0.4
    ]
    for text, expected in cases:
        assert _one(
            spark, text, is_num_or_punc_only(F.col("t"))
        ) is expected, text
    # threshold<=0 edge (round-9 ADVICE): the reference's
    # `invalid_ratio and invalid_ratio >= threshold` is False when the
    # ratio is 0.0 — an all-letter chunk stays False even at 0.0
    assert _one(
        spark, "abcdef", is_num_or_punc_only(F.col("t"), threshold=0.0)
    ) is False
    assert _one(
        spark, "abcde!", is_num_or_punc_only(F.col("t"), threshold=0.0)
    ) is True


def test_non_li_char_count_u8(spark):
    """U8 exact semantics (reference filters.py:750-753 over
    constants.py:101-119): chars outside the 14 whitelisted scripts
    that are neither punctuation nor whitespace. ASCII digits are
    script=Common — the reference counts them as non-LI, quirk
    preserved."""
    from setu_spark.functions.text import non_li_char_count

    cases = [
        ("hello नमस्ते", 0),       # Latin + Devanagari all whitelisted
        ("中文 ok", 2),            # Han chars count
        ("привет hi", 6),          # Cyrillic counts
        ("a, b! c?", 0),           # punctuation exempt
        ("abc 123", 3),            # Common-script digits count (quirk)
        ("", 0),
    ]
    for text, expected in cases:
        assert _one(
            spark, text, non_li_char_count(F.col("t"))
        ) == expected, text


def test_digit_ratio(spark):
    assert _one(spark, "a1b2", digit_ratio(F.col("t"))) == 0.5
    assert _one(spark, "", digit_ratio(F.col("t"))) == 0.0


class TestCodeSpans:
    """U13/U14 against hand-computed reference semantics
    (reference filters.py:190-219, 345-368)."""

    FIXTURE = (
        "intro text <b>bold words</b> middle "
        "function (x) { return x; } tail "
        ".cls { color: red } end"
    )

    def test_find_code_spans_offsets(self, spark):
        import re

        from setu_spark.functions.text import CODE_PATTERNS, find_code_spans_udf

        df = spark.createDataFrame([(1, self.FIXTURE)], ["doc_id", "text"])
        row = df.select(
            find_code_spans_udf()("text").alias("r")
        ).select("r.*").head()
        # reference ordering: pattern-major, match order within pattern
        want = []
        for pat in CODE_PATTERNS:
            want.extend(
                [m.start(), m.end()]
                for m in re.compile(pat).finditer(self.FIXTURE)
            )
        assert row.code_spans_success
        assert [list(s) for s in row.code_spans] == want
        assert len(want) >= 3  # one span per pattern family in the fixture

    def test_remove_code_strips_all_patterns(self, spark):
        from setu_spark.functions.text import has_code, remove_code

        df = spark.createDataFrame(
            [(1, self.FIXTURE), (2, "plain prose only.")], ["doc_id", "text"]
        )
        got = {
            r.doc_id: (r.cleaned, r.flag)
            for r in df.select(
                "doc_id",
                remove_code("text").alias("cleaned"),
                has_code("text").alias("flag"),
            ).collect()
        }
        assert got[1][1] and not got[2][1]
        cleaned = got[1][0]
        assert "<b>" not in cleaned and "function" not in cleaned
        assert ".cls" not in cleaned
        assert got[2][0] == "plain prose only."


def test_normalize_text_nfkc(spark):
    from setu_spark.functions.text import normalize_text_udf

    df = spark.createDataFrame(
        [(1, "ﬁne ①"), (2, None)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.norm
        for r in df.select(
            "doc_id", normalize_text_udf()("text").alias("norm")
        ).collect()
    }
    assert got[1] == "fine 1"   # ligature + circled digit decompose
    assert got[2] is None


def test_q116_oracle_decomposition_equals_spark_split_on_edges(spark, duck, tmp_path):
    """Both q116 sides run the SAME chunk decomposition (round 8); this
    pins their value-equality on the adversarial shapes the corpus may
    not contain: newline runs after terminators, adjacent terminators,
    terminator at end, no terminator at all, leading terminator, empty
    text."""
    import os

    from pyspark.sql import functions as F

    from setu_spark.operators.textstats import _sentence_sql, q116_sentence_explode
    from tests.oracle_utils import compare_frames

    rows = [
        (1, "plain sentence. second one! third"),
        (2, "ends with dot.\nnext line starts here."),
        (3, "double newline.\n\nafter blank"),
        (4, "adjacent.!marks? here"),
        (5, "trailing terminator.\n"),
        (6, "no terminator anywhere just words"),
        (7, ".leading terminator"),
        (8, ""),
        (9, "numbers 123. 456! mixed789."),
        (10, "ellipsis ends... next#### chunk. ok,"),
        (11, "a.b.c.d."),
        (12, "newline\ninside. chunk\nhere."),
        (13, "42"),
        (14, "१२३"),  # Devanagari digits: is_digits is \p{Nd} BOTH sides
    ]
    d = str(tmp_path / "docs116")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        os.path.join(d, "documents.parquet")
    )
    spark_pdf = q116_sentence_explode(spark, d).toPandas()
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{}')".format(
            os.path.join(d, "documents.parquet", "*.parquet")
        )
    )
    oracle_pdf = duck.execute(_sentence_sql()).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, problems
    # spot-check quirk semantics: delimiters retained, U17 exceptions
    sents = {
        (r.doc_id, r.sent_idx): r
        for r in spark_pdf.itertuples()
    }
    assert sents[(1, 1)].sentence == "plain sentence."
    assert sents[(1, 2)].sentence == " second one!"
    # round-8 U1 fix: the terminator's trailing newline ATTACHES to the
    # chunk (the reference's captured delimiter is `T(?:\n+)?`)
    assert sents[(2, 1)].sentence == "ends with dot.\n"
    assert sents[(2, 2)].sentence == "next line starts here."
    # each '.' is its own boundary, so "ellipsis ends..." splits into
    # "ellipsis ends." + "." + "." — the U17 '...' exception can never
    # fire on sentence chunks (it applies to line data, pinned in the
    # terminal_valid unit test); what must hold here is the retention
    assert sents[(10, 1)].sentence == "ellipsis ends."
    assert sents[(10, 2)].sentence == "."
    assert not sents[(6, 1)].terminal_ok  # no terminator at all
    assert sents[(13, 1)].is_digits and not sents[(13, 1)].terminal_ok
    assert sents[(14, 1)].is_digits  # Unicode digit parity, not ASCII-only


def test_q116_decomposition_on_random_corpus(spark, duck, tmp_path):
    """Seeded random fuzz over the terminator/newline alphabet: 300 docs
    of adversarial shape (terminator runs, newline runs, empties) must
    decompose identically in both engines — the fixed edge fixtures
    can't enumerate every interleaving; this sweeps the space."""
    import os
    import random

    from setu_spark.operators.textstats import _sentence_sql, q116_sentence_explode
    from tests.oracle_utils import compare_frames

    random.seed(116)
    alphabet = ["a", "b", ".", "!", "?", "\n", " ", "|", "।"]
    rows = [
        (i, "".join(random.choices(alphabet, k=random.randint(0, 40))))
        for i in range(300)
    ]
    d = str(tmp_path / "fuzz116")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        os.path.join(d, "documents.parquet")
    )
    spark_pdf = q116_sentence_explode(spark, d).toPandas()
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{}')".format(
            os.path.join(d, "documents.parquet", "*.parquet")
        )
    )
    oracle_pdf = duck.execute(_sentence_sql()).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, problems
