"""Per-language text normalization (reference U9 semantics).

The reference wraps IndicNLP's ``IndicNormalizerFactory`` per language and
then applies Unicode NFKC (reference filters.py:388-446): every Indic
language maps to a normalizer (bodo/dogri/maithili → the hindi one,
kashmiri/sindhi → urdu, …) and english/manipuri/santhali/other get NFKC
only. IndicNLP is not in this container, so this module implements the
normalizer INTERFACE with a real, documented rule set rather than an
identity stub:

  * **script-independent base rules** (what IndicNLP's BaseNormalizer
    does): strip zero-width chars (ZWSP/ZWNJ/ZWJ U+200B-U+200D) and the
    byte-order mark, normalize NBSP (U+00A0) to a plain space;
  * **Devanagari rules**: decompose the precomposed nukta consonants
    (U+0929, U+0931, U+0934, U+0958-U+095F → base consonant + U+093C) so
    downstream operators see one canonical spelling; optionally drop the
    nukta entirely (``remove_nuktas``, the reference's flag) and fold
    chandrabindu to anusvara (U+0901 → U+0902, the reference's
    ``nasals_mode``);
  * **Unicode normalization form** as the final step (NFKC to match the
    reference; NFC when a DuckDB oracle must replay it — DuckDB ships
    ``nfc_normalize`` only).

Every rule is a plain ``str.translate``/replace table, so the same rule
set is expressible three ways: Python (ground truth + pandas UDF), native
Spark ``translate``/``regexp_replace`` (JVM, codegen'd — used by the
oracle'd query), and DuckDB SQL (the oracle). The per-language dispatch
mirrors the reference's ``normalizer_lang`` map shape.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------- rule tables

#: chars deleted everywhere (ZWSP, ZWNJ, ZWJ, BOM)
ZW_CHARS = "\u200b\u200c\u200d\ufeff"
#: 1:1 char rewrites applied everywhere (NBSP -> space)
BASE_CHAR_MAP = {"\u00a0": " "}

#: precomposed Devanagari nukta consonants -> (base, nukta) decomposition
#: (U+0929, U+0931, U+0934, U+0958-U+095F). U+0958-U+095F are Unicode
#: composition exclusions (NFC keeps them decomposed); the other three are
#: recomposed by a later NFC — decomposing them here still matters because
#: the nukta-removal and any char-level rules run BEFORE the final form.
#: The table is derived from NFD so the codepoints are provably right.
DEVANAGARI_NUKTA_DECOMP = {
    chr(cp): unicodedata.normalize("NFD", chr(cp))
    for cp in (0x0929, 0x0931, 0x0934, *range(0x0958, 0x0960))
}
NUKTA = "\u093c"
CHANDRABINDU, ANUSVARA = "\u0901", "\u0902"


class TextNormalizer:
    """Base normalizer: zero-width strip + NBSP fold + a Unicode form.
    Subclasses add script-specific char maps (IndicNLP-factory shape)."""

    #: script-specific multi-char rewrites, applied after the base rules
    char_decomp: dict[str, str] = {}

    def __init__(
        self,
        form: str = "NFKC",
        remove_nuktas: bool = False,
        fold_chandrabindu: bool = False,
    ):
        self.form = form
        self.remove_nuktas = remove_nuktas
        self.fold_chandrabindu = fold_chandrabindu

    def normalize(self, text: str) -> str:
        if text is None:
            return None
        for ch in ZW_CHARS:
            text = text.replace(ch, "")
        for src, dst in BASE_CHAR_MAP.items():
            text = text.replace(src, dst)
        for src, dst in self.char_decomp.items():
            text = text.replace(src, dst)
        if self.remove_nuktas:
            text = text.replace(NUKTA, "")
        if self.fold_chandrabindu:
            text = text.replace(CHANDRABINDU, ANUSVARA)
        return unicodedata.normalize(self.form, text)


class DevanagariNormalizer(TextNormalizer):
    char_decomp = DEVANAGARI_NUKTA_DECOMP


#: language → normalizer class (the reference's normalizer_lang map shape,
#: filters.py:410-432: several languages share a script normalizer;
#: None → base/NFKC only). Extend by assignment — the factory is a dict.
NORMALIZER_FOR_LANGUAGE: dict[str, type[TextNormalizer] | None] = {
    "hindi": DevanagariNormalizer,
    "marathi": DevanagariNormalizer,
    "nepali": DevanagariNormalizer,
    "sanskrit": DevanagariNormalizer,
    "bodo": DevanagariNormalizer,
    "dogri": DevanagariNormalizer,
    "maithili": DevanagariNormalizer,
    "konkani": DevanagariNormalizer,
    "english": None,
    "other": None,
}


def get_normalizer(lang: str, **kwargs) -> TextNormalizer:
    cls = NORMALIZER_FOR_LANGUAGE.get(lang) or TextNormalizer
    return cls(**kwargs)


def normalize_udf(lang: str = "other", **kwargs):
    """Arrow-batched normalization column for one language's rule set."""
    import pandas as pd
    from pyspark.sql.types import StringType

    norm = get_normalizer(lang, **kwargs)

    @F.pandas_udf(StringType())
    def _norm(texts):  # no hints: strings unresolvable in closure scope
        return texts.map(norm.normalize)

    return _norm


# ------------------------------------------------- native-expression form

def _rule_pairs(
    lang: str, remove_nuktas: bool, fold_chandrabindu: bool
) -> list[tuple[str, str]]:
    """The ordered (src, dst) replace chain shared by all three spellings
    of the normalizer (Python / Spark / DuckDB) — same order as
    :meth:`TextNormalizer.normalize`."""
    cls = NORMALIZER_FOR_LANGUAGE.get(lang) or TextNormalizer
    pairs = list(BASE_CHAR_MAP.items()) + list(cls.char_decomp.items())
    if remove_nuktas:
        pairs.append((NUKTA, ""))
    if fold_chandrabindu:
        pairs.append((CHANDRABINDU, ANUSVARA))
    return pairs


def normalize_rules_column(
    col: Column,
    lang: str = "hindi",
    remove_nuktas: bool = False,
    fold_chandrabindu: bool = False,
) -> Column:
    """The rule-table part of the normalizer (everything except the final
    Unicode form) as native Spark expressions: one regexp_replace for the
    zero-width class, then the ordered replace chain. JVM-side and
    codegen'd — the form used in the oracle'd query, where DuckDB replays
    the identical chain."""
    out = F.regexp_replace(col, f"[{ZW_CHARS}]", "")
    for src, dst in _rule_pairs(lang, remove_nuktas, fold_chandrabindu):
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def normalize_rules_sql(
    expr: str,
    lang: str = "hindi",
    remove_nuktas: bool = False,
    fold_chandrabindu: bool = False,
) -> str:
    """DuckDB twin of :func:`normalize_rules_column`."""
    out = f"regexp_replace({expr}, '[{ZW_CHARS}]', '', 'g')"
    for src, dst in _rule_pairs(lang, remove_nuktas, fold_chandrabindu):
        out = f"replace({out}, '{src}', '{dst}')"
    return out
