"""Oracle-checked queries that run the actual pipeline stages.

These don't re-implement logic — they call the stage library
(cleaning/analysis/flagging/lid) on the ``documents`` table and declare a
DuckDB replay of the same semantics, so the correctness gate covers the
pipeline code paths themselves, not just standalone expressions.

The testdata corpus is space-separated word salad (no newlines), so the
chunk/line separator is ' ' here; the stages take the separator from
config (the reference's configurable split symbol, utilities.py:76-96).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from setu_spark.registry import register
from setu_spark.sources.io import load_table, load_table_parallel
from setu_spark.stages.analysis import AnalysisConfig, analyse
from setu_spark.stages.cleaning import CleanConfig, clean_documents
from setu_spark.stages.flagging import FlagConfig, filter_documents, flag_documents
from setu_spark.stages.lid import attach_lid

FLAGGED = ("slow", "error", "big")


# ---------------------------------------------------------------- q80
@register(
    "q80_clean_pipeline",
    oracle="""
    WITH chunks AS (
      SELECT doc_id, source,
             unnest(string_split(text, ' ')) AS chunk,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    kept AS (
      SELECT * FROM (
        SELECT doc_id, chunk, pos,
               count(*) OVER (PARTITION BY source, chunk) AS rep
        FROM chunks
      ) WHERE rep = 1
    ),
    reassembled AS (
      SELECT doc_id,
             string_agg(chunk, ' ' ORDER BY pos) AS text,
             count(*) AS kept_chunks
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           r.kept_chunks,
           length(r.text) AS cleaned_chars
    FROM documents d LEFT JOIN reassembled r ON d.doc_id = r.doc_id
    """,
)
def q80_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DocClean end to end on the real corpus: explode → filters (all pass:
    the word-salad has symbol_ratio 0) → repeated-chunk removal keyed on
    (source, chunk) → ordered reassembly → left join back (docs that lose
    every chunk keep NULL). Exercises E1, A5-as-window, E3, J4."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    cfg = CleanConfig(
        chunk_sep=" ",
        repeat_key="source",
        remove_terminal_invalid=False,
    )
    cleaned, _rejected = clean_documents(docs, cfg)
    return cleaned.select(
        "doc_id",
        "kept_chunks",
        F.length("text").alias("cleaned_chars"),
    )


# ---------------------------------------------------------------- q81
@register(
    "q81_flag_filter_survivors",
    oracle=f"""
    WITH lines AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS line
      FROM documents
    ),
    profile AS (
      SELECT doc_id,
             count(*) AS lines_count,
             CAST(sum(length(line)) AS BIGINT) AS char_count,
             -- line length is measured in WORDS (reference
             -- utilities.py:327-329); with ' '-separated lines each
             -- line is a single token, so the mean is exactly 1.0
             round(avg(CAST(len(string_split(line, ' ')) AS DOUBLE)), 6)
               AS mean_line_length,
             round(avg(length(line)), 6) AS mean_line_chars,
             CAST(count(*) FILTER (WHERE line IN {FLAGGED}) AS BIGINT)
               AS flagged_words_count
      FROM lines GROUP BY doc_id
    )
    SELECT doc_id, lines_count, char_count, mean_line_length,
           mean_line_chars, flagged_words_count
    FROM profile
    WHERE NOT (lines_count <= 20)
      AND NOT (mean_line_length <= 0.9)
      AND NOT (flagged_words_count / CAST(lines_count AS DOUBLE) >= 0.15)
    """,
)
def q81_flag_filter_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analysis → flagging → filtering, end to end: per-line stats, single-
    shuffle doc profile (A7), threshold flags (P9), config-gated filters
    (P6). Survivor schema mirrors the oracle's replay."""
    docs = load_table(spark, sf_dir, "documents")
    acfg = AnalysisConfig(line_sep=" ", flagged_words=FLAGGED)
    profiled = analyse(docs, acfg)
    # min_mean_line_len is in WORDS per line (reference semantics,
    # round-8 fix) with the reference's INCLUSIVE boundary: 0.9 keeps
    # the single-word-line corpus (mean exactly 1.0) alive while still
    # exercising the flag path
    fcfg = FlagConfig(
        min_line_count=20,
        min_mean_line_len=0.9,
        flagged_word_ratio_threshold=0.15,
    )
    # flags ratio in the reference is flagged/words; with single-word lines
    # words_count == lines_count, matching the oracle's ratio.
    flagged = flag_documents(profiled, fcfg)
    survivors = filter_documents(flagged, fcfg)
    return survivors.select(
        "doc_id",
        "lines_count",
        "char_count",
        F.round("mean_line_length", 6).alias("mean_line_length"),
        F.round("mean_line_chars", 6).alias("mean_line_chars"),
        "flagged_words_count",
    )


# ---------------------------------------------------------------- q82
def _lid_cnt_sql(lang: str) -> str:
    """Stopword-hit count for ``lang`` over the token list — the SQL
    twin of _HeuristicModel.predict's Σ toks.count(w) (profile words
    are distinct, so counting membership hits equals summing per-word
    occurrence counts)."""
    from setu_spark.stages.lid import STOPWORD_PROFILES

    words = ", ".join(f"'{w}'" for w in STOPWORD_PROFILES[lang])
    return (
        f"len(list_filter(string_split(text, ' '),"
        f" t -> list_contains([{words}], t)))"
    )


def _q82_oracle() -> str:
    from setu_spark.stages.lid import STOPWORD_PROFILES

    langs = sorted(STOPWORD_PROFILES)
    score_cols = ",\n             ".join(
        f"{_lid_cnt_sql(lg)} / CAST(greatest(len(string_split(text,"
        f" ' ')), 1) AS DOUBLE) AS s_{lg}"
        for lg in langs
    )
    # argmax on UNROUNDED scores, first max in lexicographic lang order
    # (Python's max(sorted(scores), key=score) tie rule); the zero-score
    # winner becomes 'und' with prob 0.0 (the detector's abstention).
    pred = "CASE greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    for lg in langs:
        pred += f" WHEN s_{lg} THEN '{lg}'"
    pred += " END"
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    return f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {score_cols}
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN {best} > 0 THEN {pred} ELSE 'und' END AS pred_lang,
           round({best}, 6) AS lid_prob,
           CASE WHEN {best} > 0 THEN {pred} ELSE 'und' END AS doc_lang
    FROM scored
    """


@register("q82_lid_predictions", oracle=_q82_oracle())
def q82_lid_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LID stage (mapInPandas + per-worker model cache + join-back, J1).
    The default single-detector ensemble is the deterministic stopword
    heuristic, so the stage is now ORACLE-CHECKED end to end (upgraded
    from the round-2..5 rows-only carve-out): the DuckDB replay
    reproduces the per-language hit-ratio scores as exact IEEE double
    divisions, the abstention rule (zero score → 'und', prob 0.0), and
    Python's max(sorted(scores)) lexicographic tie-break. ``lid_prob``
    rides float64 end-to-end (was float32, whose representation error
    is wider than the round-6 hash grid) and is rounded at 6 for the
    hashed output. Real model detectors (the ``.[lid]`` extra) replace
    the heuristic in deployment — THAT path stays inference-only by
    nature."""
    docs = load_table(spark, sf_dir, "documents")
    return attach_lid(docs).select(
        "doc_id",
        "lang",
        "pred_lang",
        F.round("lid_prob", 6).alias("lid_prob"),
        "doc_lang",
    )
