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


#: WIDE alphabet (round-11 VERDICT task 6): the BMP fuzz above never
#: leaves the basic plane, but 100 TB of crawl text does — astral-plane
#: digits and letters (surrogate-pair territory in the JVM), combining
#: marks, and ZWJ/ZWNJ sequences are exactly where a JVM-vs-Python
#: char-class divergence would hide. Each entry is one CODEPOINT (or a
#: short cluster) chosen to probe a specific class boundary:
WIDE_CHARS = (
    list("ab1 .!\n")
    + [
        "𝟘",        # U+1D7D8 math double-struck zero — astral Nd
        "𑁨",        # U+11068 Brahmi digit two — astral Nd
        "１",        # U+FF11 fullwidth one — BMP Nd outside ASCII
        "²",        # U+00B2 superscript — No: isdigit-True, \\p{Nd}-False
        "①",        # U+2460 circled one — No (Numeric_Type=Digit)
        "五",        # CJK numeral — Lo, isnumeric-True, \\p{N}-False
        "𐌰",        # U+10330 Gothic letter — astral, unlisted script
        "😀",        # U+1F600 emoji — astral So
        "𞸀",        # U+1EE00 Arabic Mathematical — astral U15 block
        "𐹠",        # U+10E60 Rumi digit one — astral U15 block, No
        "‍",   # ZWJ — Cf, Common script
        "‌",   # ZWNJ — Cf, Common script
        "́",   # combining acute — Mn, Inherited script
        "॑",   # Devanagari stress mark — Mn, in-block
        "न", "ा", "।", "१", "٣",
    ]
)
WIDE_ALPHABET = st.sampled_from(WIDE_CHARS)

#: Indic conjunct / nukta clusters — the U9 normalizer's and U11
#: tokenizer's actual domain, appended by THEIR wide fuzzes
#: (test_normalize_properties.py, test_trivial_tokenize.py): ZWJ/ZWNJ
#: conjunct forms, precomposed vs decomposed nukta consonants (editors
#: silently NFC-mangle literals, hence escapes), chandrabindu.
INDIC_CLUSTERS = [
    "\u0915\u094d\u200d\u0937",  # conjunct with ZWJ (half-form request)
    "\u0915\u094d\u200c\u0937",  # conjunct with ZWNJ (explicit virama)
    "\u0958",                        # precomposed QA (ka + nukta)
    "\u0915\u093c",                 # decomposed ka + nukta
    "\u0929",                        # precomposed NNNA (na + nukta)
    "\u0928\u093c",                 # decomposed na + nukta
    "\u0901",                        # chandrabindu (folds to anusvara)
    "\u00a0",                        # NBSP (BASE_CHAR_MAP -> space)
]

WIDE_TEXTS = st.lists(
    st.text(alphabet=WIDE_ALPHABET, min_size=0, max_size=16),
    min_size=1,
    max_size=32,
)


def _in_blocks(ch: str, blocks) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in blocks)


def _py_symbol_ratio(s: str):
    """U15 ground truth from the committed block table — the
    reference's exact valid set: ASCII alnum, space, newline, listed
    script blocks; everything else is a symbol."""
    from setu_spark.functions.text import _REFERENCE_VALID_BLOCKS

    if not s:
        return None
    invalid = sum(
        1
        for ch in s
        if not (
            (ch.isascii() and ch.isalnum())
            or ch in " \n"
            or _in_blocks(ch, _REFERENCE_VALID_BLOCKS)
        )
    )
    return invalid / len(s)


def _py_num_punc_only(s: str, threshold: float = 0.4) -> bool:
    """U16 ground truth: the reference's ``s.isnumeric() or
    (invalid_ratio and invalid_ratio >= threshold)`` over its
    letters-only class (the committed _U16_LETTER_BLOCKS)."""
    from setu_spark.functions.text import _U16_LETTER_BLOCKS

    if not s:
        return False
    if s.isnumeric():
        return True
    invalid = sum(
        1
        for ch in s
        if not (
            (ch.isascii() and ch.isalpha())
            or ch in " \n"
            or _in_blocks(ch, _U16_LETTER_BLOCKS)
        )
    )
    ratio = invalid / len(s)
    return ratio > 0 and ratio >= threshold


def _py_is_number_nd(s: str) -> bool:
    """U5 as SHIPPED: every char in ``\\p{Nd}`` (Unicode decimal
    digits). Declared divergence D7 from Python ``str.isdigit``: CPython
    also accepts Numeric_Type=Digit NON-decimals (², ①, …) which no
    regex property reaches in the JVM or RE2 — see COVERAGE.md."""
    import unicodedata

    return len(s) > 0 and all(
        unicodedata.category(c) == "Nd" for c in s
    )


@settings(max_examples=16, deadline=None)
@given(WIDE_TEXTS)
def test_char_class_kernels_match_python_on_wide_unicode(spark, texts):
    """Astral / combining / ZWJ parity for U2-U5, U15-U17: one Spark
    job over the fuzz batch vs pure-Python twins built from the SAME
    committed constants (block tables, terminal tuples). A JVM regex
    that treated a surrogate pair as two chars, or a class that
    silently dropped an astral range, fails here."""
    from pyspark.sql import functions as F

    from setu_spark.functions.text import (
        is_num_or_punc_only,
        symbol_ratio,
    )

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
            symbol_ratio(F.col("t")).alias("sym"),
            is_num_or_punc_only(F.col("t")).alias("npo"),
        ).collect()
    }
    for i, t in enumerate(texts):
        r = rows[i]
        assert r.wc == len(t.split(" ")), (t, r.wc)
        assert r.cc == len(t), (t, r.cc)  # codepoints, not UTF-16 units
        assert r.bc == len(t.encode("utf-8")), t
        assert r.num == _py_is_number_nd(t), (t, r.num)
        assert r.term == _py_terminal_valid(t), t
        want_sym = _py_symbol_ratio(t)
        if want_sym is None:
            assert r.sym is None, t
        else:
            assert r.sym is not None and abs(r.sym - want_sym) < 1e-12, (
                t, r.sym, want_sym,
            )
        assert r.npo == _py_num_punc_only(t), (t, r.npo)


def test_u8_non_li_count_on_astral_and_joiners(spark):
    """U8 hand vectors for the planes the BMP fuzz never reaches. The
    class is the reference's verbatim complement (14 scripts + \\p{P} +
    \\s exempt), so Cf joiners (ZWJ/ZWNJ, script Common), Inherited
    combining marks, and unlisted astral scripts all COUNT — in both
    the reference's regex-module pattern and the JVM twin."""
    from pyspark.sql import functions as F

    from setu_spark.functions.text import non_li_char_count

    vectors = [
        ("नमस्ते abc", 0),      # in-script + Latin + space
        ("𐌰𐌱", 2),             # Gothic: astral, unlisted script
        ("😀", 1),              # emoji So
        ("a‍b", 1),        # ZWJ: Cf, Common — counts
        ("क‌ष", 1),        # ZWNJ between Devanagari — counts
        ("é", 1),         # combining acute: Inherited — counts
        # U+0951 stress mark is Script=INHERITED (Devanagari only via
        # scx, which neither Java \p{IsX} nor the reference's
        # \p{Script=X} consults) — counts in BOTH engines
        ("क॑", 1),
        ("का", 0),         # U+093E matra: Script=Devanagari proper
        ("𑠀", 0),              # U+11800 Dogra — astral but LISTED script
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(vectors)], ["i", "t"]
    )
    got = {
        r.i: r.n
        for r in df.select(
            "i", non_li_char_count(F.col("t")).alias("n")
        ).collect()
    }
    for i, (t, want) in enumerate(vectors):
        assert got[i] == want, (t, got[i], want)


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
    # q146 loads through load_table_parallel (round-13 input rebalance);
    # patch both loader names so the fixture swap keeps intercepting
    orig, orig_par = ts.load_table, ts.load_table_parallel
    ts.load_table = ts.load_table_parallel = lambda sp, d, n: docs
    try:
        hist = {
            r.novelty_decile: r.n_docs
            for r in ts.q146_ngram_novelty(spark, "x").collect()
        }
    finally:
        ts.load_table, ts.load_table_parallel = orig, orig_par
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
