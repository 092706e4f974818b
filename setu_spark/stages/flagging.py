"""Flagging & filtering stage.

Rebuild of the reference's flagging_and_removal component (SURVEY.md §7
step 3): doc-stat thresholds → boolean flag columns (P9), config-gated
sequential filters (P6), and document removal as a **left-semi join**
(the reference expresses removal as an inner join against the survivors,
J5 — semantically a semi-join; left_semi avoids column duplication and
lets AQE pick broadcast when the survivor set is small).

Intended-semantics note: the reference writes ``has_character_repetition``
but reads ``has_char_repetition`` (defect, SURVEY.md §4.1) — one canonical
name here.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FlagConfig:
    min_line_count: int = 1          # flagging_and_removal.py:154-160
    #: mean WORDS per line at/below which a doc is short-lines-heavy
    #: (reference semantics + INCLUSIVE boundary; default 0 like
    #: perform_doc_flagging's signature, filters.py:676 — with the
    #: round-8 inclusive fix a 1.0 default would flag every
    #: single-word-line corpus)
    min_mean_line_len: float = 0.0
    flagged_word_ratio_threshold: float = 0.2
    #: non-Latin-Indic char fraction at/above which a doc flags
    #: (reference utilities.py:378-380, default non_li_char_threshold)
    non_li_threshold: float = 1.0
    char_repetition_threshold: float = 0.8
    word_repetition_threshold: float = 0.8
    line_count_filter: bool = True   # flagging_and_removal.py:169-229
    line_length_filter: bool = True
    flagged_word_filter: bool = True
    non_li_filter: bool = True       # flagging_and_removal.py:211-217
    char_repetition_filter: bool = False
    word_repetition_filter: bool = False


def flag_documents(doc_stats: DataFrame, cfg: FlagConfig | None = None) -> DataFrame:
    """P9: conditional boolean flags from doc-level statistics."""
    cfg = cfg or FlagConfig()
    out = doc_stats.withColumn(
        "has_less_lines", F.col("lines_count") <= cfg.min_line_count
    ).withColumn(
        "is_short_lines_heavy",
        # reference boundary is INCLUSIVE (utilities.py:376:
        # mean <= min_mean_line_len) — round-8 fix from `<`
        F.col("mean_line_length") <= cfg.min_mean_line_len,
    ).withColumn(
        "is_flagged_heavy",
        (F.col("flagged_words_count") / F.col("words_count"))
        >= cfg.flagged_word_ratio_threshold,
    )
    if "non_li_char_count" in doc_stats.columns:
        out = out.withColumn(
            "is_non_li_heavy",
            (F.col("non_li_char_count") / F.col("char_count"))
            >= cfg.non_li_threshold,
        )
    if "char_repetition_score" in doc_stats.columns:
        out = out.withColumn(
            "has_char_repetition",
            F.col("char_repetition_score") >= cfg.char_repetition_threshold,
        )
    if "word_repetition_score" in doc_stats.columns:
        out = out.withColumn(
            "has_word_repetition",
            F.col("word_repetition_score") >= cfg.word_repetition_threshold,
        )
    return out


def filter_documents(flagged: DataFrame, cfg: FlagConfig | None = None) -> DataFrame:
    """Sequential config-gated filters (the reference applies each filter as
    its own ``df.filter`` guarded by a config flag)."""
    cfg = cfg or FlagConfig()
    out = flagged
    if cfg.line_count_filter:
        out = out.filter(~F.col("has_less_lines"))
    if cfg.line_length_filter:
        out = out.filter(~F.col("is_short_lines_heavy"))
    if cfg.flagged_word_filter:
        out = out.filter(~F.col("is_flagged_heavy"))
    if cfg.non_li_filter and "is_non_li_heavy" in out.columns:
        out = out.filter(~F.col("is_non_li_heavy"))
    if cfg.char_repetition_filter and "has_char_repetition" in out.columns:
        out = out.filter(~F.col("has_char_repetition"))
    if cfg.word_repetition_filter and "has_word_repetition" in out.columns:
        out = out.filter(~F.col("has_word_repetition"))
    return out


def remove_documents(corpus: DataFrame, survivors: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """J5 as left_semi: keep corpus rows whose id survived filtering."""
    return corpus.join(
        survivors.select(id_col), id_col, "left_semi"
    )
