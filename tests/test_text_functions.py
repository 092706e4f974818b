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
        ("A.\nB.", ["A.", "B."]),   # newlines after terminator are eaten
        ("nodelim", ["nodelim"]),
    ],
)
def test_split_keep_delimiter(spark, text, expected):
    assert _one(spark, text, split_keep_delimiter(F.col("t"))) == expected


# U15-family ratios
def test_symbol_ratio(spark):
    assert _one(spark, "abcd", symbol_ratio(F.col("t"))) == 0.0
    assert _one(spark, "a@#$", symbol_ratio(F.col("t"))) == 0.75
    assert _one(spark, "", symbol_ratio(F.col("t"))) == 0.0


def test_digit_ratio(spark):
    assert _one(spark, "a1b2", digit_ratio(F.col("t"))) == 0.5
    assert _one(spark, "", digit_ratio(F.col("t"))) == 0.0
