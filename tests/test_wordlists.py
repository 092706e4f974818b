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


# ------------------------------------------------- flashtext boundary branch

def test_indic_keywords_match_boundary_branch():
    """Round-8 U6/U7 parity fix: every non-ASCII char is OUTSIDE
    flashtext's word-char set, so Indic keywords live entirely in the
    automaton's boundary branch — the previous word-start scanner could
    never match them at all. Vectors hand-derived from flashtext's
    control flow."""
    from setu_spark.functions.keywords import KeywordMatcher

    m = KeywordMatcher(["क", "कख"])
    assert m.extract("क") == [("क", 0, 1)]
    # longest wins through the boundary branch
    assert m.extract("कख") == [("कख", 0, 2)]
    # prefix completes when the continuation dies
    assert m.extract("कग") == [("क", 0, 1)]
    # substring matching in running Indic text (no word-start rule:
    # every char is a boundary char)
    m2 = KeywordMatcher(["बाल"])
    assert m2.extract("ननबालनन") == [("बाल", 2, 5)]
    # mixed-script text: word-char keywords keep their boundary rules
    m3 = KeywordMatcher(["slow", "बाल"])
    assert m3.extract("बाल slow बाल") == [
        ("बाल", 0, 3),
        ("slow", 4, 8),
        ("बाल", 9, 12),
    ]
    # and the dist shape rides the same path
    assert m3.dist("बाल slow बाल") == {"बाल": 2, "slow": 1}


def test_flashtext_quirks_replayed():
    """flashtext's two scan quirks, replayed deliberately (byte parity
    beats tidiness — the reference_vote_compat philosophy):
    (a) a failed word-char descent skips past the word AND its
    terminating boundary char, so a boundary-char keyword immediately
    after the failed word is missed; (b) after a boundary-branch match
    the scan resumes one PAST the match end, skipping an adjacent
    boundary-char keyword."""
    from setu_spark.functions.keywords import KeywordMatcher

    # (a) 'a' descends (prefix of 'abc'), dies at 'q', skip jumps past क
    m = KeywordMatcher(["abc", "क"])
    assert m.extract("aqक") == []
    # ...but with a space between, the keyword matches
    assert m.extract("aq क") == [("क", 3, 4)]
    # partial descent dying AT the boundary char also misses it (the
    # boundary is examined against the deep node, not the root)
    assert m.extract("abक") == []
    # (b) adjacent boundary-char keyword after a match is skipped
    m2 = KeywordMatcher(["क", "ग"])
    assert m2.extract("कग") == [("क", 0, 1)]
    # non-adjacent: both match
    assert m2.extract("क ग") == [("क", 0, 1), ("ग", 2, 3)]


def test_differential_fuzz_against_real_flashtext():
    """Differential check against the real flashtext package — the
    ground truth this module reimplements. Gated as an extra: the
    container has no flashtext; environments that do get the full
    randomized comparison."""
    flashtext = pytest.importorskip("flashtext")
    import random

    from setu_spark.functions.keywords import KeywordMatcher

    rng = random.Random(8)
    alphabet = list("ab _.क ख१slow")
    for trial in range(200):
        kws = list(
            {
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 4))).strip()
                for _ in range(rng.randint(1, 5))
            }
            - {""}
        )
        if not kws:
            continue
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        kp = flashtext.KeywordProcessor(case_sensitive=False)
        for k in kws:
            kp.add_keyword(k.lower())
        want = kp.extract_keywords(text.lower(), span_info=True)
        got = KeywordMatcher(kws).extract(text)
        assert got == [tuple(w) for w in want], (kws, text)
