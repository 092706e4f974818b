"""Native-expression text operators.

Re-implements the reference's Python row-UDF scalar library (SURVEY.md
§2.10, U1-U18) as JVM-side column expressions. This is the single biggest
optimization of the rebuild: the reference wraps every one of these in
``pyspark.sql.functions.udf`` (row-at-a-time pickle round-trips, a pushdown
barrier and a codegen breaker); here they stay inside whole-stage codegen.

Quirk semantics are preserved deliberately (and unit-tested):
  * ``word_count("")`` == 1 — the reference counts ``len(line.split(' '))``
    including empty tokens (reference filters.py:756-758).
  * ``split_keep_delimiter`` keeps the sentence terminator attached to the
    preceding chunk (reference filters.py:309-330).
  * ``terminal_valid`` is False for text ending in ``...`` or ``####`` even
    though ``.`` and ``#`` terminate it (reference filters.py:237-248).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- counting (U2-U4) ----------------------------------------------------

def word_count(col: Column | str, sep: str = " ") -> Column:
    """len(line.split(' ')) — counts empty tokens; '' → 1 (U2,
    reference filters.py:756-758). ``split(..., -1)`` keeps trailing
    empties, matching Python ``str.split(sep)`` with an explicit sep."""
    return F.size(F.split(_c(col), sep, -1))


def char_count(col: Column | str) -> Column:
    """len(line) in codepoints (U3, reference filters.py:760-762)."""
    return F.length(_c(col))


def byte_count(col: Column | str) -> Column:
    """UTF-8 byte length (U4, reference filters.py:764-766)."""
    return F.octet_length(_c(col))


def tokenize(col: Column | str, sep: str = " ") -> Column:
    """Split into words, dropping empty tokens (Python str.split() with no
    arg ≈ split + filter). Use for n-gram/dedup ops where empty shingle
    tokens would be noise."""
    return F.filter(F.split(_c(col), sep, -1), lambda w: w != F.lit(""))


# --- predicates (U5, U17) ------------------------------------------------

def is_number(col: Column | str) -> Column:
    """line.isdigit() (U5, reference filters.py:773-775). ``\\d`` in Java
    regex is ASCII-only; the reference's ``str.isdigit`` accepts any Unicode
    decimal digit, so we use the ``\\p{Nd}`` class for parity."""
    return _c(col).rlike(r"^\p{Nd}+$")


TERMINAL_PUNCTUATIONS = (".", "!", "?", ":", ",", ";", ")", '"', "'")
#: chunks ending with these are invalid despite the terminal char
#: (reference constants.py:125-134: TERMINAL_PUNCTUATIONS_EXCEPTION)
TERMINAL_EXCEPTIONS = ("...", "####")


def terminal_valid(col: Column | str) -> Column:
    """Ends with a terminal punctuation, except '...' / '####' (U17,
    reference filters.py:237-248)."""
    c = _c(col)
    ends_term = F.lit(False)
    for p in TERMINAL_PUNCTUATIONS:
        ends_term = ends_term | c.endswith(p)
    for e in TERMINAL_EXCEPTIONS:
        ends_term = ends_term & ~c.endswith(e)
    return ends_term


# --- sentence splitting (U1) --------------------------------------------

#: Sentence-terminator class of the reference (filters.py:316: Latin + Indic
#: danda/double-danda + Arabic question/full stop), as a Java regex class.
_TERMINATOR_CLASS = "[.?!।॥|؟۔]"

#: Split *after* a terminator (+ any following newlines), keeping the
#: terminator attached to the preceding chunk — a zero-width lookbehind
#: split. Java regex supports bounded lookbehind; `\n*` inside lookbehind is
#: unbounded, so we split on the boundary after terminator+newlines via
#: lookbehind on the terminator or a newline run following one.
SENTENCE_SPLIT_REGEX = f"(?<={_TERMINATOR_CLASS})(?=[^\n])|(?<={_TERMINATOR_CLASS})\n+"


def split_keep_delimiter(col: Column | str) -> Column:
    """U1 ``split_with_delimiter`` (reference filters.py:309-330): split a
    document into sentence chunks on ``[.?!।॥|؟۔]`` + optional newlines,
    keeping the delimiter attached to the chunk. Native ``split`` with a
    lookbehind pattern — no UDF."""
    return F.split(_c(col), SENTENCE_SPLIT_REGEX)


# --- ratios (U8, U15, U16 family) ---------------------------------------

def _count_matching(col: Column, char_class: str) -> Column:
    """#chars of ``col`` matching the regex char-class, via the
    length-difference trick (JVM-side, codegen-friendly)."""
    return F.length(col) - F.length(F.regexp_replace(col, char_class, ""))


def symbol_ratio(col: Column | str, allowed_class: str = r"[\p{L}\p{Nd}\s]") -> Column:
    """Fraction of characters outside the allowed class (U15 intended
    semantics, reference filters.py:19-96: invalid chars / char count;
    whitespace exempt). Returns 0.0 for empty strings."""
    c = _c(col)
    invalid = F.length(F.regexp_replace(c, allowed_class, ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        invalid / F.length(c)
    )


def digit_ratio(col: Column | str) -> Column:
    """Fraction of characters that are decimal digits."""
    c = _c(col)
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        _count_matching(c, r"\p{Nd}") / F.length(c)
    )


def nonspace_char_count(col: Column | str) -> Column:
    return _count_matching(_c(col), r"\S")


# --- script / language heuristics (rebuild of LID surface, U19-lite) -----

#: Unicode script classes usable JVM-side for the cheap script-detection
#: tier of language ID (the heavyweight model tier is pluggable — see
#: setu_spark/stages/lid.py).
SCRIPT_CLASSES = {
    "latin": r"\p{IsLatin}",
    "devanagari": r"\p{IsDevanagari}",
    "arabic": r"\p{IsArabic}",
    "han": r"\p{IsHan}",
}


def script_char_counts(col: Column | str) -> dict[str, Column]:
    c = _c(col)
    return {name: _count_matching(c, cls) for name, cls in SCRIPT_CLASSES.items()}
