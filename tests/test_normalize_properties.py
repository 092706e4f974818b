"""U9 normalizer wide-unicode parity (round-12 VERDICT task 6).

q67 hash-compares the Python ``TextNormalizer`` (engine, Arrow UDF)
against ``nfc_normalize(normalize_rules_sql(...))`` (oracle) end-to-end
— but only on the corpus's derived Devanagari, never on astral planes,
combining marks, or ZWJ/ZWNJ conjuncts, exactly where a
utf8proc-vs-CPython NFC divergence or a RE2-vs-str.replace class
divergence would hide. These fuzzes pin all three spellings of the
rule chain on that domain:

  * Python ``TextNormalizer.normalize`` (ground truth — the reference's
    IndicNLP semantics, reference filters.py:388-446),
  * the DuckDB twin ``normalize_rules_sql`` + ``nfc_normalize`` (what
    every oracle replays),
  * the Spark-native twin ``normalize_rules_column`` (public API;
    rule-table part only — Spark has no NFC builtin, which is why the
    production engine path keeps the Python normalizer in an Arrow
    UDF).

Zero divergences measured at introduction (3000 vectors × 2 configs
for the DuckDB pair; the NFC step agrees between utf8proc and
CPython's unicodedata on this domain). The real-indicnlp differential
for the same domain is extras-gated in test_plug_extras.py.
"""

from __future__ import annotations

import random

import duckdb

from test_text_properties import INDIC_CLUSTERS, WIDE_CHARS

from setu_spark.functions.normalize import (
    get_normalizer,
    normalize_rules_column,
    normalize_rules_sql,
    _rule_pairs,
    ZW_CHARS,
)

#: the normalizer's fuzz domain: the shared wide alphabet plus the
#: Indic conjunct/nukta clusters it actually exists to normalize, plus
#: the Urdu chars its 'urdu' rule table targets
ALPHA = WIDE_CHARS + INDIC_CLUSTERS + ["ی", "ي", "ك"]

#: (lang, remove_nuktas, fold_chandrabindu) configs under fuzz — q67's
#: exact config plus the defaults of both rule-table families
CONFIGS = [
    ("hindi", True, True),   # q67's config
    ("hindi", False, False),
    ("urdu", False, False),
    ("other", False, False),  # base table only (NBSP + zero-width)
]


def _vectors(n: int = 800, seed: int = 1301) -> list[str]:
    rng = random.Random(seed)
    return [
        "".join(rng.choice(ALPHA) for _ in range(rng.randint(0, 14)))
        for _ in range(n)
    ]


def test_python_matches_duckdb_twin_wide_fuzz():
    """The q67 oracle pair on the wide domain: Python normalizer (NFC
    form) vs the generated SQL chain + DuckDB nfc_normalize."""
    con = duckdb.connect()
    for lang, nuk, chand in CONFIGS:
        norm = get_normalizer(
            lang, form="NFC", remove_nuktas=nuk, fold_chandrabindu=chand
        )
        sql = (
            "SELECT nfc_normalize("
            + normalize_rules_sql("?", lang, nuk, chand)
            + ")"
        )
        for text in _vectors():
            py = norm.normalize(text)
            db = con.execute(sql, [text]).fetchone()[0]
            assert db == py, (lang, nuk, chand, repr(text))


def _py_rule_chain(text: str, lang: str, nuk: bool, chand: bool) -> str:
    """The rule-table part alone (no Unicode form) — what
    normalize_rules_column computes, straight from the shared pairs."""
    for ch in ZW_CHARS:
        text = text.replace(ch, "")
    for src, dst in _rule_pairs(lang, nuk, chand):
        text = text.replace(src, dst)
    return text


def test_spark_native_twin_matches_rule_chain_wide_fuzz(spark):
    """The Spark-native spelling on the wide domain, one job per
    config: JVM regexp_replace over the zero-width class + the replace
    chain must equal the Python chain char for char (surrogate pairs
    must ride the JVM class as single chars)."""
    from pyspark.sql import functions as F

    texts = _vectors(400)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "t"]
    )
    for lang, nuk, chand in CONFIGS:
        rows = dict(
            df.select(
                "i", normalize_rules_column(F.col("t"), lang, nuk, chand)
            ).collect()
        )
        for i, t in enumerate(texts):
            want = _py_rule_chain(t, lang, nuk, chand)
            assert rows[i] == want, (lang, nuk, chand, repr(t))


def test_nfc_agrees_on_clusters():
    """The NFC step in isolation on every committed cluster and their
    pairwise concatenations: utf8proc (DuckDB) vs CPython unicodedata.
    A Unicode-version skew between the two would surface here first."""
    import unicodedata

    con = duckdb.connect()
    vecs = list(INDIC_CLUSTERS)
    vecs += [a + b for a in INDIC_CLUSTERS for b in INDIC_CLUSTERS]
    for v in vecs:
        db = con.execute("SELECT nfc_normalize(?)", [v]).fetchone()[0]
        assert db == unicodedata.normalize("NFC", v), repr(v)
