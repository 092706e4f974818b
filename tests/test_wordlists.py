"""Wordlist loading, flashtext-exact matching, and normalization rules.

The keyword-matcher vectors are hand-computed spans pinning the flashtext
semantics the reference relies on (filters.py:725-748): case folding,
word boundaries, multi-word phrases, longest-match, greedy non-overlap.
"""

from __future__ import annotations

import pytest

from setu_spark.functions.keywords import KeywordMatcher
from setu_spark.functions.normalize import (
    DevanagariNormalizer,
    TextNormalizer,
    get_normalizer,
)
from setu_spark.operators.wordlists import (
    load_iso_mapping,
    load_language_mapping,
    load_wordlists,
    read_wordlists,
)


# ------------------------------------------------------------ KeywordMatcher

M = KeywordMatcher(["slow", "slow query", "hash join", "join order", "big"])


@pytest.mark.parametrize(
    "text,spans",
    [
        # simple hit with boundaries
        ("a slow scan", [("slow", 2, 6)]),
        # case-insensitive, canonical lowercase reported
        ("SLOW Query up", [("slow query", 0, 10)]),
        # longest match wins over its prefix keyword
        ("slow query plan", [("slow query", 0, 10)]),
        # prefix keyword still matches when the longer one fails its tail
        ("slow queries", [("slow", 0, 4)]),
        # greedy non-overlap: after "hash join", "join order" can't start
        ("hash join order", [("hash join", 0, 9)]),
        # ...but standalone it does
        ("fast join order", [("join order", 5, 15)]),
        # word boundaries: substrings of words never match
        ("slowly bigger", []),
        # multi-word needs the exact single-space sequence
        ("hash  join", []),
        # punctuation is a boundary
        ("slow, query", [("slow", 0, 4)]),
        # end-of-string is a boundary
        ("very slow", [("slow", 5, 9)]),
        # repeated hits count separately
        ("big big big", [("big", 0, 3), ("big", 4, 7), ("big", 8, 11)]),
        ("", []),
    ],
)
def test_keyword_spans(text, spans):
    assert M.extract(text) == spans


def test_keyword_dist_counts():
    assert M.dist("slow query and slow, big big") == {
        "slow query": 1,
        "slow": 1,
        "big": 2,
    }


def test_self_overlapping_keyword_greedy():
    # "a b a b a": "a b a" matches at 0, scan resumes at 6 -> "b a" left
    m = KeywordMatcher(["a b a"])
    assert m.extract("a b a b a") == [("a b a", 0, 5)]


# --------------------------------------------------------------- normalizer

def test_base_normalizer_strips_zero_width_and_nbsp():
    n = TextNormalizer()
    assert n.normalize("a\u200bb\u200c\u200dc\ufeff") == "abc"
    assert n.normalize("a b") == "a b"


def test_devanagari_nukta_decomposition():
    n = DevanagariNormalizer(form="NFC")
    # precomposed qa (U+0958) -> ka (U+0915) + nukta (U+093C); NFC keeps
    # it decomposed (composition exclusion). Explicit escapes: editors
    # NFC-mangle these literals.
    assert n.normalize("\u0958") == "\u0915\u093c"
    # U+0929 is NOT a composition exclusion: the table decomposes it but
    # the final NFC recomposes -> canonical precomposed form survives
    assert n.normalize("\u0929") == "\u0929"
    # ...while nukta removal sees the decomposed form (pre-NFC), so the
    # nukta really is strippable from every precomposed consonant
    assert DevanagariNormalizer(form="NFC", remove_nuktas=True).normalize(
        "\u0929"
    ) == "\u0928"


def test_remove_nuktas_and_chandrabindu_fold():
    n = DevanagariNormalizer(
        form="NFC", remove_nuktas=True, fold_chandrabindu=True
    )
    assert n.normalize("\u0958") == "\u0915"  # nukta gone after decomp
    assert n.normalize("\u0901") == "\u0902"


def test_nfkc_is_default_form():
    # NFKC folds compatibility chars (ligature fi) - the reference's final
    # normalize('NFKC', ...) step, filters.py:445-446
    assert TextNormalizer().normalize("\ufb01") == "fi"


def test_language_dispatch():
    assert isinstance(get_normalizer("hindi"), DevanagariNormalizer)
    assert type(get_normalizer("english")) is TextNormalizer
    assert type(get_normalizer("unknown-lang")) is TextNormalizer


# ------------------------------------------------------------------ loaders

def test_read_wordlists_shape():
    wl = read_wordlists()
    assert ("nsfw", "en") in wl
    assert ("stopwords", "de") in wl
    assert ("junk_partial", "en") in wl
    assert "slow" in wl[("nsfw", "en")]
    assert all(w == w.strip() and w for ws in wl.values() for w in ws)


def test_load_wordlists_matches_driver_side(spark):
    df = load_wordlists(spark)
    rows = {
        (r["category"], r["lang"], r["keyword"])
        for r in df.collect()
    }
    expected = {
        (cat, lang, w)
        for (cat, lang), words in read_wordlists().items()
        for w in words
    }
    assert rows == expected


def test_stopword_profiles_single_source():
    # lid stage profiles and q45's declarative twin must come from the
    # same files — drift here would silently split the two LID tiers
    from setu_spark.operators.textstats import LID_PROFILES
    from setu_spark.operators.wordlists import load_stopword_profiles
    from setu_spark.stages.lid import STOPWORD_PROFILES

    loaded = load_stopword_profiles()
    assert loaded == STOPWORD_PROFILES == LID_PROFILES
    assert {"en", "de", "fr", "es"} <= set(loaded)
    assert loaded["en"] == ("the", "a", "of", "and", "is")


def test_language_mappings_agree():
    langs = {r["language"] for r in load_language_mapping()}
    iso = load_iso_mapping()
    assert langs <= set(iso)
