"""Analysis stage — the per-line / per-doc statistics pipeline.

Rebuild of the reference's AnalysisStage dataflow (SURVEY.md §3.2,
analysis.py:145-347) with the two big structural fixes:

  * all line metrics are native expressions (the reference uses 8 Python
    row-UDFs here — U2-U8 — which break codegen and pushdown);
  * the doc profile is ONE ``groupBy(doc_id).agg(...)`` (the reference
    computes six separate agg DataFrames and 6-way-joins them on doc_id,
    utilities.py:288-339 / SURVEY.md A7+J2 — six shuffles where one
    suffices).

Line split uses the reference's sentence-terminator semantics (U1: split
*keeping the delimiter*, via lookbehind regex) or a plain separator.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from setu_spark.functions.text import (
    byte_count,
    char_count,
    is_number,
    non_li_char_count,
    split_keep_delimiter,
    word_count,
)


@dataclass(frozen=True)
class AnalysisConfig:
    line_sep: str | None = None  #: None → sentence split with delimiter (U1)
    remove_only_number: bool = True  #: analysis.py:175
    flagged_words: tuple[str, ...] = field(default=())
    ngram_char_n: tuple[int, ...] = (5,)
    ngram_word_n: tuple[int, ...] = (3,)


def doc2lines(docs: DataFrame, cfg: AnalysisConfig,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """E1/E2: explode docs into (doc, pos, line) rows."""
    if cfg.line_sep is None:
        parts = split_keep_delimiter(F.col(text_col))
    else:
        parts = F.split(F.col(text_col), cfg.line_sep, -1)
    return docs.select(
        id_col, F.posexplode(parts).alias("pos", "line")
    )


def line_stats(lines: DataFrame, cfg: AnalysisConfig) -> DataFrame:
    """Per-line metrics — the U2-U8 battery as one narrow projection.

    ``flagged_words_count`` here is the JVM token-equality form (q44's
    scalable shape — single-token wordlists, exact-token hits). For
    reference-exact flashtext counting (case-insensitive, word
    boundaries, multi-word keywords, the boundary-branch Indic
    semantics), swap in ``functions/keywords.keyword_dist_udf`` — the
    q66-registered form; the two agree on lowercase single-word lists
    over punctuation-free tokens, which is what this stage's config
    contract documents."""
    c = F.col("line")
    out = lines.select(
        "*",
        is_number(c).alias("is_number"),
        word_count(c).alias("words_count"),
        char_count(c).alias("char_count"),
        byte_count(c).alias("bytes"),
        non_li_char_count(c).alias("non_li_char_count"),
    )
    if cfg.flagged_words:
        toks = F.filter(
            F.split(c, " ", -1), lambda w: w != F.lit("")
        )
        out = out.withColumn(
            "flagged_words_count",
            F.size(F.filter(toks, lambda w: w.isin(*cfg.flagged_words))),
        )
    else:
        out = out.withColumn("flagged_words_count", F.lit(0))
    if cfg.remove_only_number:
        out = out.filter(~F.col("is_number"))
    return out


def doc_profile(lstats: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """A7 in single-shuffle form: the whole doc-stats row in one agg."""
    return lstats.groupBy(id_col).agg(
        F.count("*").alias("lines_count"),
        F.sum("words_count").alias("words_count"),
        F.sum("char_count").alias("char_count"),
        F.sum("bytes").alias("bytes"),
        F.sum("flagged_words_count").alias("flagged_words_count"),
        F.sum("non_li_char_count").alias("non_li_char_count"),
        # line-length stats are measured in WORDS, the reference's
        # Spark-path semantics (utilities.py:327-329 passes
        # "words_count" into get_mean/min/max_line_length) — round-8
        # fix: these previously aggregated char_count. The char-based
        # variants stay available under explicit names.
        F.avg("words_count").alias("mean_line_length"),
        F.min("words_count").alias("min_line_length"),
        F.max("words_count").alias("max_line_length"),
        F.avg("char_count").alias("mean_line_chars"),
        F.min("char_count").alias("min_line_chars"),
        F.max("char_count").alias("max_line_chars"),
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("pos").cast("string"), F.col("char_count"))
                )
            )
        ).alias("line_length_map"),  # A8: nested map agg, map_from_entries
    )


def analyse(docs: DataFrame, cfg: AnalysisConfig | None = None,
            id_col: str = "doc_id") -> DataFrame:
    """doc → lines → line stats → doc profile, joined back to the doc
    (J7). The join is on the id — Spark co-partitions automatically."""
    cfg = cfg or AnalysisConfig()
    lines = doc2lines(docs, cfg, id_col)
    stats = doc_profile(line_stats(lines, cfg), id_col)
    return docs.join(stats, id_col, "left")
