"""Native twin of IndicNLP's ``trivial_tokenize`` (U11's tokenizer).

The reference's word n-gram repetition tokenizes through
``indicnlp.tokenize.indic_tokenize.trivial_tokenize`` (reference
filters.py:4 import, :584 call site). The library's logic is simple
public string handling — replicated here natively (round-9, closing the
q42 declared divergence) so the operator needs no extra dependency:

1. tabs become spaces;
2. every punctuation char (``string.punctuation`` plus the Devanagari
   dandas ।॥ — or the Urdu marks for ``lang='ur'``) is severed into a
   standalone space-padded token;
3. runs of SPACES collapse to one and edge spaces are stripped (other
   whitespace — newlines — is untouched and rides inside tokens);
4. number/date sequences are re-merged: each maximal
   ``([0-9]+ [,.:/] )+[0-9]+`` match has its spaces removed, EXCEPT a
   match starting at position 0 of the normalized string, which the
   library's ``start > prev`` guard skips (quirk preserved);
5. the result splits on single spaces (an empty string yields ``['']``,
   matching ``''.split(' ')``).

Two extra twins keep every engine value-identical:
``trivial_tokenize_sql`` emits a DuckDB expression for the oracles
(segment/match interleave — RE2 has no lookarounds, so the num-seq
merge rides ``regexp_split_to_array`` + ``regexp_extract_all``), and
the extras-gated differential test
(tests/test_trivial_tokenize.py) compares this module against the real
indicnlp where that package exists. Cross-twin fuzz runs everywhere.
"""

from __future__ import annotations

import re
import string

#: the indic tokenizer's punctuation set: ASCII punctuation plus purna
#: and deergha virama (the two dandas).
TRIV_PUNCT_INDIC = string.punctuation + "।॥"

#: the urdu variant's set: ASCII punctuation plus the Arabic-script
#: marks the library lists (ṣād signs, comma, qif, percent/decimal/
#: thousands separators, five-dot mark, full stop).
TRIV_PUNCT_URDU = (
    string.punctuation
    + "؉؊،؞٪٫٬٭۔"
)

_SEVER_INDIC = re.compile("([" + re.escape(TRIV_PUNCT_INDIC) + "])")
_SEVER_URDU = re.compile("([" + re.escape(TRIV_PUNCT_URDU) + "])")

#: fast-path bail: when a string has NO tokenizer-relevant punctuation,
#: no tab, no space run, and no edge space, every stage of the pipeline
#: is a no-op and the result is exactly ``text.split(' ')`` (num-seq
#: merging needs a severed punct, absent by construction). One scan
#: instead of sub+collapse+finditer — ~3× on clean corpora (PERF.md r9).
_FAST_INDIC = re.compile(
    "[" + re.escape(TRIV_PUNCT_INDIC) + "\t]|  |^ | $"
)
_FAST_URDU = re.compile(
    "[" + re.escape(TRIV_PUNCT_URDU) + "\t]|  |^ | $"
)

#: date / number / section-numbering sequences get their spaces back
_NUM_SEQ = re.compile(r"([0-9]+ [,.:/] )+[0-9]+")

_NUM_SEQ_SQL = "([0-9]+ [,.:/] )+[0-9]+"


def _tokenize(text: str, sever: re.Pattern[str]) -> list[str]:
    tok_str = sever.sub(r" \1 ", text.replace("\t", " "))
    s = re.sub(r"[ ]+", " ", tok_str).strip(" ")
    # number-sequence re-merge with the library's start > prev guard: a
    # match at position 0 is skipped entirely (prev stays 0, so the
    # final tail append keeps it space-severed)
    new_s, prev = "", 0
    for m in _NUM_SEQ.finditer(s):
        start, end = m.start(), m.end()
        if start > prev:
            new_s += s[prev:start]
            new_s += s[start:end].replace(" ", "")
            prev = end
    new_s += s[prev:]
    return new_s.split(" ")


def trivial_tokenize_indic(text: str) -> list[str]:
    """Brahmi-script trivial tokenization (punctuation-boundary)."""
    if not _FAST_INDIC.search(text):
        return text.split(" ")
    return _tokenize(text, _SEVER_INDIC)


def trivial_tokenize_urdu(text: str) -> list[str]:
    """Urdu variant: Arabic-script punctuation set, no num-seq merge
    (the library's urdu path returns straight after the space
    collapse)."""
    if not _FAST_URDU.search(text):
        return text.split(" ")
    tok_str = _SEVER_URDU.sub(r" \1 ", text.replace("\t", " "))
    return re.sub(r"[ ]+", " ", tok_str).strip(" ").split(" ")


def trivial_tokenize(text: str, lang: str = "hi") -> list[str]:
    """Language dispatch exactly as the library: ``ur`` takes the urdu
    path, everything else the indic path."""
    if lang == "ur":
        return trivial_tokenize_urdu(text)
    return trivial_tokenize_indic(text)


def _re2_class(chars: str) -> str:
    """Escape a literal char set for use inside an RE2 [...] class."""
    return "".join(
        "\\" + c if c in "\\]^-[" else c for c in chars
    )


def trivial_tokenize_sql(expr: str) -> str:
    """DuckDB expression producing ``trivial_tokenize_indic(expr)`` as a
    LIST — generated from the same constants as the Python twin (house
    rule: classes live once). NULL input propagates to a NULL list.

    The num-seq merge cannot be a single regexp_replace (RE2 has no
    lookarounds and chains need unbounded passes), so the expression
    splits the normalized string into non-match segments and maximal
    matches, space-strips each match — except a match at position 0
    (empty first segment), replaying the library's ``start > prev``
    skip — and reassembles by interleave. Interior segments are never
    empty (abutting matches would have been one maximal match), so only
    the first segment can witness the quirk."""
    # the class contains a literal apostrophe — double it for the SQL
    # string literal
    sever = ("([" + _re2_class(TRIV_PUNCT_INDIC) + "])").replace("'", "''")
    s2 = (
        f"trim(regexp_replace(regexp_replace(replace({expr}, chr(9), ' '),"
        f" '{sever}', ' \\1 ', 'g'), ' +', ' ', 'g'), ' ')"
    )
    return f"""string_split(
      (SELECT segs[1] || coalesce(list_aggregate(
          list_transform(generate_series(1, len(mats)), i ->
            (CASE WHEN i = 1 AND segs[1] = '' THEN mats[1]
                  ELSE replace(mats[i], ' ', '') END) || segs[i + 1]),
          'string_agg', ''), '')
       FROM (SELECT regexp_split_to_array(norm, '{_NUM_SEQ_SQL}') AS segs,
                    regexp_extract_all(norm, '{_NUM_SEQ_SQL}') AS mats
             FROM (SELECT {s2} AS norm))), ' ')"""
