"""Gopher-style document quality rule battery (q99).

The reference's quality pass is per-line flag thresholds
(setu/filters.py + clean_analysis.py flag columns); this module adds
the corpus-level document rule battery every modern pretraining
pipeline runs (the Gopher / RefinedWeb / Dolma rule family): word-count
bounds, mean-word-length bounds, stopword-fraction floor, alphabetic-
word floor — each reported as its own boolean plus the combined verdict
so downstream can tune thresholds without recomputing signals.

Every signal is a native per-row expression (split + HOF filter +
arithmetic — no UDF, no shuffle); fractions are rounded to 6 digits
under the registry's cross-engine float discipline. At 100 TB the whole
battery rides the corpus scan: zero exchanges, one codegen stage.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from setu_spark.functions.hashes import hash64_sql
from setu_spark.caching import scoped_cache
from setu_spark.registry import register
from setu_spark.sources.io import load_table, load_table_parallel

#: Gopher-ish thresholds, scaled to the synthetic corpus (production
#: values: 50..100_000 words, mean word length 3..10, stopword floor
#: 0.06 over a real stopword list).
MIN_WORDS = 30
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_STOPWORD_FRAC = 0.05
MIN_ALPHA_FRAC = 0.8

#: Minimal English stopword set (the synthetic corpus's function words;
#: production loads per-language lists via operators/wordlists.py).
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def gopher_signals(docs: DataFrame, keep: tuple[str, ...] = ("doc_id",)
                   ) -> DataFrame:
    """The Gopher battery as a reusable projection: ``keep`` columns +
    signals + per-rule flags + the combined verdict over any DataFrame
    with a ``text`` column (queries AND the ``govern`` CLI stage share
    this). One codegen projection, zero exchanges."""
    t = F.split("text", " ", -1)
    n_words = F.size(t).cast("long")
    stop = F.size(
        F.filter(t, lambda w: w.isin(*STOPWORDS))
    )
    alpha = F.size(
        F.filter(t, lambda w: w.rlike("[A-Za-z]"))
    )
    sig = docs.select(
        *keep,
        n_words.alias("n_words"),
        F.round(
            (F.length("text") - (n_words - 1)) / n_words.cast("double"), 6
        ).alias("mean_word_len"),
        F.round(stop / n_words.cast("double"), 6).alias("stopword_frac"),
        F.round(alpha / n_words.cast("double"), 6).alias("alpha_frac"),
    )
    flag_wc = (F.col("n_words") < MIN_WORDS) | (
        F.col("n_words") > MAX_WORDS
    )
    flag_wl = (F.col("mean_word_len") < MIN_MEAN_WORD_LEN) | (
        F.col("mean_word_len") > MAX_MEAN_WORD_LEN
    )
    flag_stop = F.col("stopword_frac") < MIN_STOPWORD_FRAC
    flag_alpha = F.col("alpha_frac") < MIN_ALPHA_FRAC
    return sig.select(
        "*",
        flag_wc.alias("flag_word_count"),
        flag_wl.alias("flag_word_len"),
        flag_stop.alias("flag_stopword"),
        flag_alpha.alias("flag_alpha"),
        (~(flag_wc | flag_wl | flag_stop | flag_alpha)).alias("passes"),
    )


@register(
    "q99_gopher_quality_rules",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             round((length(text)
                    - (len(string_split(text, ' ')) - 1))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE),
                   6) AS mean_word_len,
             round(len(list_filter(string_split(text, ' '),
                                   w -> w IN ({_STOP_SQL})))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE),
                   6) AS stopword_frac,
             round(len(list_filter(string_split(text, ' '),
                                   w -> regexp_matches(w, '[A-Za-z]')))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE),
                   6) AS alpha_frac
      FROM documents
    )
    SELECT doc_id, n_words, mean_word_len, stopword_frac, alpha_frac,
           (n_words < {MIN_WORDS} OR n_words > {MAX_WORDS})
               AS flag_word_count,
           (mean_word_len < {MIN_MEAN_WORD_LEN}
            OR mean_word_len > {MAX_MEAN_WORD_LEN})
               AS flag_word_len,
           (stopword_frac < {MIN_STOPWORD_FRAC}) AS flag_stopword,
           (alpha_frac < {MIN_ALPHA_FRAC}) AS flag_alpha,
           NOT (n_words < {MIN_WORDS} OR n_words > {MAX_WORDS}
                OR mean_word_len < {MIN_MEAN_WORD_LEN}
                OR mean_word_len > {MAX_MEAN_WORD_LEN}
                OR stopword_frac < {MIN_STOPWORD_FRAC}
                OR alpha_frac < {MIN_ALPHA_FRAC}) AS passes
    FROM sig
    """,
)
def q99_gopher_quality_rules(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document Gopher rule battery: signals + per-rule flags + the
    combined verdict. Mean word length counts text chars minus the
    single-space separators (exact integer arithmetic before the one
    rounded divide, so both engines round the identical double).

    Scale shape: split once (the split is a single named projection both
    engines CSE), three HOF/size expressions over it, zero exchanges —
    the whole battery is one WholeStageCodegen span over the scan."""
    return gopher_signals(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------- q109
#: Per-language percentile floor: docs below this quality percentile
#: WITHIN their language are dropped (language-adaptive thresholding —
#: a fixed global cutoff would gut low-resource languages whose score
#: distributions sit lower).
PCTL_FLOOR = 0.10


@register(
    "q109_quality_percentile_gate",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id, lang,
             round(len(list_filter(string_split(text, ' '),
                                   w -> w IN ({_STOP_SQL})))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE),
                   6) AS stopword_frac
      FROM documents
    ),
    r AS (
      SELECT doc_id, lang, stopword_frac,
             percent_rank() OVER (PARTITION BY lang
                                  ORDER BY stopword_frac, doc_id) AS pr
      FROM sig
    )
    SELECT doc_id, lang, stopword_frac, round(pr, 6) AS pct_rank
    FROM r WHERE pr >= {PCTL_FLOOR}
    """,
)
def q109_quality_percentile_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Language-adaptive quality gate: rank every document by a quality
    proxy (stopword fraction) WITHIN its language and keep those at or
    above the {PCTL_FLOOR:.0%} percentile — per-group relative
    thresholding, the calibration step quality classifiers actually
    deploy with (absolute cutoffs don't transfer across languages).

    percent_rank is the exact rational (rank-1)/(n-1) with a doc_id
    tiebreak, so both engines produce bit-identical doubles. Scale note:
    the per-lang sort window is exact-twin semantics for oracle scale; at
    100 TB the same gate is q115_quality_sketch_gate — approx-quantile
    thresholds (the q84 sketch family) joined back broadcast, one scan,
    no global sort."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ", -1)
    sig = docs.select(
        "doc_id",
        "lang",
        F.round(
            F.size(F.filter(t, lambda w: w.isin(*STOPWORDS)))
            / F.size(t).cast("double"),
            6,
        ).alias("stopword_frac"),
    )
    # NULLS LAST to match DuckDB's ASC default (Spark's is nulls-first):
    # a NULL-text doc has a NULL score and must rank ABOVE every real
    # score, not poison the low percentiles
    pr = F.percent_rank().over(
        Window.partitionBy("lang").orderBy(
            F.col("stopword_frac").asc_nulls_last(),
            F.col("doc_id").asc_nulls_last(),
        )
    )
    return (
        sig.withColumn("pr", pr)
        .filter(F.col("pr") >= PCTL_FLOOR)
        .select(
            "doc_id",
            "lang",
            "stopword_frac",
            F.round("pr", 6).alias("pct_rank"),
        )
    )


# ---------------------------------------------------------------- q115
@register(
    "q115_quality_sketch_gate",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id, lang,
             round(len(list_filter(string_split(text, ' '),
                                   w -> w IN ({_STOP_SQL})))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE),
                   6) AS stopword_frac
      FROM documents
    ),
    t AS (
      SELECT lang, quantile_disc(stopword_frac, {PCTL_FLOOR}) AS thresh
      FROM sig GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.stopword_frac,
           round(t.thresh, 6) AS lang_threshold
    FROM sig s JOIN t USING (lang)
    WHERE s.stopword_frac >= t.thresh
    """,
)
def q115_quality_sketch_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of q109's language-adaptive quality gate — the
    variant q109's docstring promises: per-language thresholds from the
    MERGEABLE quantile sketch (approx_percentile, the q84 operator), not
    a per-language sort window. Two scans of the signal projection, ZERO
    sorts: the threshold aggregate map-side combines to |langs| rows,
    broadcasts back, and the gate is a filter riding the corpus scan.
    q109's exact percent_rank window is a full per-language sort — with
    few, huge languages that's a skewed global sort at scale (its 20×
    sweep reads 5.0×, the worst in PERF.md); this plan replaces it with
    an O(accuracy)-state sketch and a broadcast hash join, the shape
    that holds at 1000 executors. Plan-pinned in test_skew_and_plans.py
    (BroadcastHashJoin present; no Sort, no Window, no SortMergeJoin).

    Hash-green oracle: at driver scale n per language ≪ accuracy, so
    the GK summary is rank-exact and returns precisely DuckDB's
    ``quantile_disc`` element (same ceil(p·n) rank convention — the q84
    verification); the kept set and the threshold column then agree
    exactly. Ties at the threshold are safe: the gate compares VALUES,
    so which duplicate the engines pick is immaterial."""
    from setu_spark.operators.sketches import PCT_ACCURACY

    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ", -1)
    # the signal projection feeds both the threshold aggregate and the
    # gate — cache it (q52's discipline) so the text split runs once;
    # measured 3.6s -> ~2s at the 20x corpus
    sig = docs.select(
        "doc_id",
        "lang",
        F.round(
            F.size(F.filter(t, lambda w: w.isin(*STOPWORDS)))
            / F.size(t).cast("double"),
            6,
        ).alias("stopword_frac"),
    )
    sig = scoped_cache("q115_quality_sketch_gate", sig)
    thresholds = sig.groupBy("lang").agg(
        F.expr(
            f"approx_percentile(stopword_frac, {PCTL_FLOOR}, {PCT_ACCURACY})"
        ).alias("thresh")
    )
    return (
        sig.join(F.broadcast(thresholds), "lang")
        .filter(F.col("stopword_frac") >= F.col("thresh"))
        .select(
            "doc_id",
            "lang",
            "stopword_frac",
            F.round("thresh", 6).alias("lang_threshold"),
        )
    )


# ---------------------------------------------------------------- q100
@register(
    "q100_dataset_card",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id, lang,
             md5(text) AS text_key,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             n_chars,
             (len(string_split(text, ' ')) >= {MIN_WORDS}
              AND len(string_split(text, ' ')) <= {MAX_WORDS}
              AND round((length(text)
                         - (len(string_split(text, ' ')) - 1))
                        / CAST(len(string_split(text, ' ')) AS DOUBLE), 6)
                  BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN}
              AND round(len(list_filter(string_split(text, ' '),
                                        w -> w IN ({_STOP_SQL})))
                        / CAST(len(string_split(text, ' ')) AS DOUBLE), 6)
                  >= {MIN_STOPWORD_FRAC}
              AND round(len(list_filter(string_split(text, ' '),
                                        w -> regexp_matches(w, '[A-Za-z]')))
                        / CAST(len(string_split(text, ' ')) AS DOUBLE), 6)
                  >= {MIN_ALPHA_FRAC}) AS passes
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(*) - count(DISTINCT text_key) AS BIGINT)
               AS n_dup_docs,
           round((count(*) - count(DISTINCT text_key))
                 / CAST(count(*) AS DOUBLE), 6) AS dup_frac,
           round(sum(CASE WHEN passes THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS quality_pass_frac
    FROM sig
    GROUP BY lang
    """,
)
def q100_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card table: per-language doc/word/char totals, exact-
    duplicate count and rate (md5 text keys — engine-portable), and the
    fraction passing the q99 Gopher battery. One query emits the summary
    a corpus release ships — the capstone composition of the counting,
    dedup, and quality families.

    Scale shape: one scan computes every per-doc signal in codegen; the
    single exchange is a per-lang aggregate whose distinct-count runs on
    fixed-width 128-bit keys (md5), partial-agg'd map-side. At 100 TB
    this is the same two-stage plan — |langs| final rows."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ", -1)
    n_words = F.size(t).cast("long")
    mean_wl = F.round(
        (F.length("text") - (n_words - 1)) / n_words.cast("double"), 6
    )
    stop_frac = F.round(
        F.size(F.filter(t, lambda w: w.isin(*STOPWORDS)))
        / n_words.cast("double"),
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter(t, lambda w: w.rlike("[A-Za-z]")))
        / n_words.cast("double"),
        6,
    )
    passes = (
        (n_words >= MIN_WORDS)
        & (n_words <= MAX_WORDS)
        & mean_wl.between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        & (stop_frac >= MIN_STOPWORD_FRAC)
        & (alpha_frac >= MIN_ALPHA_FRAC)
    )
    sig = docs.select(
        "lang",
        F.md5("text").alias("text_key"),
        n_words.alias("n_words"),
        "n_chars",
        passes.alias("passes"),
    )
    return sig.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        (F.count("*") - F.countDistinct("text_key"))
        .cast("long")
        .alias("n_dup_docs"),
        F.round(
            (F.count("*") - F.countDistinct("text_key"))
            / F.count("*").cast("double"),
            6,
        ).alias("dup_frac"),
        F.round(
            F.sum(F.when(F.col("passes"), 1).otherwise(0))
            / F.count("*").cast("double"),
            6,
        ).alias("quality_pass_frac"),
    )


# ---------------------------------------------------------------- q103
#: Deterministic snapshot simulation moduli: the "previous" corpus
#: version lacks doc_id % PREV_ABSENT == 0 (those are "added" now), the
#: "current" version lacks doc_id % CUR_ABSENT == 0 (those were
#: "removed"), and docs with doc_id % CHANGED == 0 carry a different
#: text in the previous version ("changed").
PREV_ABSENT = 7
CUR_ABSENT = 11
CHANGED = 5


@register(
    "q103_snapshot_diff",
    oracle=f"""
    WITH prev AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % {CHANGED} = 0
                      THEN text || ' v1' ELSE text END) AS k,
             n_chars
      FROM documents WHERE doc_id % {PREV_ABSENT} <> 0
    ),
    cur AS (
      SELECT doc_id, md5(text) AS k, n_chars
      FROM documents WHERE doc_id % {CUR_ABSENT} <> 0
    )
    SELECT CASE WHEN p.doc_id IS NULL THEN 'added'
                WHEN c.doc_id IS NULL THEN 'removed'
                WHEN p.k <> c.k THEN 'changed'
                ELSE 'unchanged' END AS status,
           count(*) AS n_docs,
           CAST(sum(coalesce(c.n_chars, 0)) AS BIGINT) AS cur_chars,
           CAST(sum(coalesce(p.n_chars, 0)) AS BIGINT) AS prev_chars
    FROM prev p FULL OUTER JOIN cur c USING (doc_id)
    GROUP BY 1
    """,
)
def q103_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff — the incremental-versioning audit (what a
    crawl refresh changed): added / removed / changed / unchanged doc
    counts and char volumes between two corpus versions, compared by
    content hash. The versions here are deterministic md5-stable slices
    of the documents table (simulating a refresh); on real data the two
    sides are two parquet snapshots.

    Scale shape: one full-outer sort-merge join on doc_id comparing
    fixed-width md5 keys — at 100 TB both snapshots bucket by doc_id at
    ingest (`write_compacted`/bucketBy), making this join co-located
    with zero shuffle; the aggregate is 4 rows after map-side partials.
    DuckDB's USING join exposes a coalesced key, matched by joining on
    the column name in Spark."""
    docs = load_table(spark, sf_dir, "documents")
    # presence is a FLAG column, not hash-IS-NULL: md5(NULL text) is
    # NULL for a row that EXISTS in the snapshot, and reading that as
    # 'added'/'removed' misclassifies every NULL-text doc (the oracle
    # keys presence on the joined doc_id). NULL-vs-NULL hashes then
    # fall through the <> to 'unchanged' in both engines.
    prev = docs.filter(F.col("doc_id") % PREV_ABSENT != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % CHANGED == 0,
                F.concat(F.col("text"), F.lit(" v1")),
            ).otherwise(F.col("text"))
        ).alias("pk"),
        F.col("n_chars").alias("p_chars"),
        F.lit(True).alias("in_prev"),
    )
    cur = docs.filter(F.col("doc_id") % CUR_ABSENT != 0).select(
        "doc_id",
        F.md5("text").alias("ck"),
        F.col("n_chars").alias("c_chars"),
        F.lit(True).alias("in_cur"),
    )
    joined = prev.join(cur, "doc_id", "full_outer")
    status = (
        F.when(F.col("in_prev").isNull(), "added")
        .when(F.col("in_cur").isNull(), "removed")
        .when(F.col("pk") != F.col("ck"), "changed")
        .otherwise("unchanged")
        .alias("status")
    )
    return joined.groupBy(status).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.coalesce("c_chars", F.lit(0)))
        .cast("long")
        .alias("cur_chars"),
        F.sum(F.coalesce("p_chars", F.lit(0)))
        .cast("long")
        .alias("prev_chars"),
    )


# ---------------------------------------------------------------- q104
#: Compression-ratio floor below which a document is flagged as
#: low-entropy (boilerplate / repetition compresses hard; the classic
#: Dolma/Gopher "zlib ratio" signal).
MIN_ZLIB_RATIO = 0.35


#: zlib's worst-case expansion on incompressible input: the 2-byte
#: header + 4-byte adler trailer + 5 bytes of stored-block framing per
#: 64 KiB block. 64 + n/1000 dominates that comfortably (the per-block
#: term is ~0.008%), yet a broken UDF (garbage sizes, dropped None
#: handling) still lands far outside it. On a 47-byte doc the measured
#: overhead is 6 bytes — a pure-ratio ceiling like 1.1 would flag tiny
#: honest docs, so the bound is absolute, not relative.
ZLIB_SLACK_BYTES = 64


def compression_signals(docs: DataFrame) -> DataFrame:
    """Per-document zlib compression ratio (compressed/original bytes) —
    the cheap entropy proxy quality pipelines threshold on: boilerplate,
    templated spam, and runaway repetition compress far below natural
    text. stdlib zlib inside an Arrow-batched pandas UDF (C-speed per
    row, one JVM<->Python crossing per batch); zero shuffle, rides the
    corpus scan like every other per-row signal. Planted-fixture tests
    pin the semantics (repetitive text flags, high-entropy doesn't)."""
    import zlib

    @F.pandas_udf("long")
    def zbytes(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
            if t is not None
            else 0
        )

    orig = F.octet_length("text").cast("long")
    return docs.select(
        "doc_id",
        orig.alias("orig_bytes"),
        zbytes("text").alias("compressed_bytes"),
    ).select(
        "*",
        F.round(
            F.col("compressed_bytes")
            / F.greatest(F.col("orig_bytes"), F.lit(1)).cast("double"),
            6,
        ).alias("zlib_ratio"),
    ).select(
        "*",
        (F.col("zlib_ratio") < MIN_ZLIB_RATIO).alias("flag_low_entropy"),
    )


@register(
    "q104_compression_ratio",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS orig_bytes,
           TRUE AS ratio_ok
    FROM documents WHERE text IS NOT NULL
    """,
)
def q104_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-witness form of :func:`compression_signals` (no SQL engine
    exposes zlib, so the raw compressed size can't be oracle'd — the
    round-4 `no_oracle` hole). The hashed output carries the columns both
    engines CAN agree on exactly — doc_id and the utf-8 byte length the
    ratio denominates over — plus ``ratio_ok``, the Spark-computed
    invariant that the compressed size landed in
    (0, orig + {ZLIB_SLACK_BYTES} + orig/1000] — zlib always emits >0
    bytes, and its worst-case expansion (header + stored-block framing)
    stays under that absolute slack. The oracle answers literal TRUE: a
    broken UDF (None handling, size sign, denominator) flips the bool
    and fails the hash. NULL-text rows are dropped on BOTH sides (q116's
    convention) — without the symmetric filter a future null-bearing
    testdata generation would flip ratio_ok to False against the
    oracle's unconditional TRUE, an opaque mismatch instead of a scoped
    one (round-5 review). Distribution-level semantics stay pinned by
    the planted fixtures in tests/test_quality.py."""
    sig = compression_signals(
        load_table(spark, sf_dir, "documents").na.drop(subset=["text"])
    )
    ceiling = (
        F.col("orig_bytes")
        + F.lit(ZLIB_SLACK_BYTES)
        + (F.col("orig_bytes") / F.lit(1000)).cast("long")
    )
    return sig.select(
        "doc_id",
        "orig_bytes",
        (
            (F.col("compressed_bytes") > 0)
            & (F.col("compressed_bytes") <= ceiling)
        ).alias("ratio_ok"),
    )


# ---------------------------------------------------------------- q105
#: Source-overlap gram width (word bigrams: wide enough to beat shared
#: vocabulary, narrow enough that honest overlap exists).
OVERLAP_N = 2


@register(
    "q105_source_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT source, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= {OVERLAP_N}
    ),
    grams AS (
      SELECT DISTINCT source, t[i] || ' ' || t[i+1] AS g
      FROM toks, unnest(range(1, len(t))) AS u(i)
      WHERE i < len(t)
    ),
    sizes AS (SELECT source, count(*) AS n FROM grams GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_shared
      FROM grams a JOIN grams b USING (g)
      WHERE a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared,
           round(n_shared / CAST(sa.n + sb.n - n_shared AS DOUBLE), 6)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    """,
)
def q105_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise corpus-overlap matrix between sources: exact Jaccard of
    word-{OVERLAP_N}-gram sets — "how much does crawl A repeat crawl B",
    the due-diligence table before mixing corpora (the exact companion
    of q93's banded cross-corpus near-dup).

    Scale shape: distinct (source, gram) collapses each source to its
    gram set in one partial-agg'd shuffle; the gram self-join fans out
    at most C(|sources|, 2) pairs per gram — bounded by the SOURCE
    count squared, independent of corpus size (the unbounded-token-join
    trap q53 had is structurally absent). Gram keys are xxhash64 of the
    token slice (fixed-width, no gram strings); the oracle counts raw
    strings — counts agree absent 64-bit collisions, q64's argument."""
    # CPU-heavy per-row stage downstream; single-row-group scan would
    # serialize it on one core (round-13, guide §2.5/§6) — no-op at scale
    docs = load_table_parallel(spark, sf_dir, "documents")
    t = F.split("text", " ", -1)
    grams = (
        docs.filter(F.size(t) >= OVERLAP_N)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - (OVERLAP_N - 1)),
                    lambda i: F.xxhash64(F.slice(t, i, OVERLAP_N)),
                )
            ).alias("g"),
        )
        .distinct()
    )
    sizes = grams.groupBy("source").agg(F.count("*").alias("n"))
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(b, "g")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n").alias("na")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n").alias("nb")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------- q127
#: Classifier-based quality filter (the GPT-3 / LLaMA "quality
#: classifier" pipeline step): a linear model over hashed bag-of-words
#: features scores every document, and a Pareto-noised threshold keeps
#: high-score docs with probability increasing in the score (Brown et
#: al. 2020, Appendix A: keep iff pareto(alpha=9) > 1 - score) so the
#: kept set is score-weighted rather than a hard cutoff that clones the
#: classifier's biases. The reference has no learned-filter surface at
#: all (its gates are fixed thresholds, flagging_and_removal.py:154-160).
#: Weights here are md5-derived so both engines agree; production loads
#: a trained weight vector instead (a |CQ_BUCKETS|-row broadcast dim
#: joined on the bucket — same plan shape, broadcast hash join).
CQ_BUCKETS = 4096
CQ_GAIN = 8.0
CQ_PARETO_ALPHA = 9.0
CQ_UMOD = 1 << 20


#: sigmoid(GAIN * s/n) twice in the oracle (score col + keep rule) — a
#: named CTE column keeps them the identical expression.
_CQ_W_SQL = (
    f"(({hash64_sql('CAST(b AS VARCHAR)', salt='cqw')} % 2001) - 1000)"
)
_CQ_U_SQL = (
    f"({hash64_sql('CAST(doc_id AS VARCHAR)', salt='cqp')}"
    f" % {CQ_UMOD} + 1) / CAST({CQ_UMOD + 1} AS DOUBLE)"
)


@register(
    "q127_classifier_quality_filter",
    oracle=f"""
    WITH wd AS (
      SELECT doc_id,
             {hash64_sql("word", salt="cq")} % {CQ_BUCKETS} AS b
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents) x
    ),
    per AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum({_CQ_W_SQL}) AS DOUBLE) / 1000.0 AS s
      FROM wd GROUP BY doc_id
    ),
    sc AS (
      SELECT doc_id, n_words,
             1 / (1 + exp(-{CQ_GAIN} * (s / n_words))) AS score
      FROM per
    )
    SELECT doc_id, n_words,
           round(score, 6) AS quality_score,
           (round(pow(1 - ({_CQ_U_SQL}), {-1.0 / CQ_PARETO_ALPHA}) - 1, 6)
            > round(1 - score, 6)) AS keep
    FROM sc
    """,
)
def q127_classifier_quality_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hashed-linear-model quality score + Pareto keep rule per doc.

    score = sigmoid(GAIN * mean_w) where mean_w averages per-word
    weights w[h(word) % B]; keep iff pareto_sample(doc) > 1 - score,
    with the Pareto draw inverse-CDF'd from an md5-uniform of doc_id
    (engine-portable randomness, the q86/q124 discipline).

    Scale shape: one explode -> map-combined (doc, word) aggregate ->
    bucket/weight lookup on those VOCABULARY-SCALED rows -> final
    groupBy(doc_id). The {CQ_BUCKETS}-entry weight vector is computed
    DRIVER-SIDE and shipped as an array literal consumed via
    ``element_at`` — the production shape exactly (a trained vector
    loads on the driver and broadcasts with the plan). Form shootout
    at the 100x corpus: inline per-token weight md5 ~100s; broadcast
    weight-table JOIN 50s (the join re-evaluated the md5 key across
    its boundary); per-token md5 + array lookup 34.5s; grouping raw
    words FIRST so the md5 touches (doc, distinct-word) rows instead
    of tokens: 16.8s — adopted. The sum is exact INTEGER milliweights
    (weights are multiples of 1e-3 by construction) divided once at
    the end — order-independent and engine-exact like a decimal sum,
    at long cost.

    Round-14 form: the per-doc aggregate is ONE ``mapInPandas`` pass
    (guide §4.2/§5) instead of explode → groupBy(doc, word) →
    groupBy(doc). Two things motivated it, both measured: (a) the old
    plan shipped the 4096-entry weight vector as a ``F.lit(array)``
    literal — py4j converts it ELEMENT-WISE, 2.5-3.3 s of pure driver
    time per query construction (the dominant cost at bench scale, and
    constant at any scale); the kernel carries the weights in its
    Python closure instead (~33 KB with the serialized function).
    (b) the explode shuffled every (doc, word) row twice and ran the
    md5 bucket hash in the JVM per aggregate row; the kernel computes
    the identical exact milliweight sum per doc in one pass with a
    per-batch word→weight cache (Zipf: hits dominate), so the plan has
    ZERO shuffles. Sums are identical by commutativity (exact integer
    arithmetic, same md5 formula — pinned by
    test_q127_matches_python_reimplementation and the DuckDB oracle);
    docs with NULL text vanish from explode output exactly as the
    kernel skips them. The scan rides ``load_table_parallel`` so the
    kernel stage fills the fleet instead of one row-group core."""
    import hashlib

    from setu_spark.functions.hashes import HEX_DIGITS, hash64

    docs = load_table_parallel(spark, sf_dir, "documents")
    # driver-side weight vector — formula-identical to the oracle's SQL
    # derivation (md5 parity pinned by test_q127_matches_python_
    # reimplementation); in production this is the trained model's
    # weight array, loaded from a file here instead
    weights = [
        (
            int(
                hashlib.md5(f"cqw|{i}".encode()).hexdigest()[:HEX_DIGITS],
                16,
            )
            % 2001
        )
        - 1000
        for i in range(CQ_BUCKETS)
    ]

    def per_doc(batches, _w=weights):
        from collections import Counter

        cache: dict[str, int] = {}

        def wfor(word: str) -> int:
            v = cache.get(word)
            if v is None:
                b = (
                    int(
                        hashlib.md5(
                            ("cq|" + word).encode()
                        ).hexdigest()[:HEX_DIGITS],
                        16,
                    )
                    % CQ_BUCKETS
                )
                v = cache[word] = _w[b]
            return v

        for pdf in batches:
            ids, nw, sm = [], [], []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["text"]):
                if text is None:
                    continue  # explode of a NULL split emits no rows
                words = text.split(" ")  # keeps empties, like split(-1)
                ids.append(doc_id)
                nw.append(len(words))
                sm.append(
                    sum(wfor(w) * c for w, c in Counter(words).items())
                )
            yield pd.DataFrame(
                {"doc_id": ids, "n_words": nw, "s_milli": sm}
            )

    per = docs.select("doc_id", "text").mapInPandas(
        per_doc, "doc_id long, n_words long, s_milli long"
    ).select(
        "doc_id",
        "n_words",
        (F.col("s_milli").cast("double") / 1000.0).alias("s"),
    )
    score = 1 / (1 + F.exp(-CQ_GAIN * (F.col("s") / F.col("n_words"))))
    u = (
        hash64(F.col("doc_id").cast("string"), salt="cqp") % CQ_UMOD + 1
    ) / float(CQ_UMOD + 1)
    pareto = F.pow(1 - u, F.lit(-1.0 / CQ_PARETO_ALPHA)) - 1
    return per.select(
        "doc_id",
        "n_words",
        F.round(score, 6).alias("quality_score"),
        (F.round(pareto, 6) > F.round(1 - score, 6)).alias("keep"),
    )


# ---------------------------------------------------------------- q145
def _pearson_sql(n, sx, sy, sxx, syy, sxy, alias: str) -> str:
    """Exact-moment Pearson r as one deterministic IEEE sequence: every
    moment is an exact BIGINT sum, so numerator/denominator are single
    int→double conversions and the fp work is two sqrts, one multiply,
    one divide — identical in both engines."""
    num = f"{n}*{sxy} - {sx}*{sy}"
    dx = f"{n}*{sxx} - {sx}*{sx}"
    dy = f"{n}*{syy} - {sy}*{sy}"
    return (
        f"CASE WHEN {dx} = 0 OR {dy} = 0 THEN NULL"
        f" ELSE round(CAST({num} AS DOUBLE)"
        f" / (sqrt(CAST({dx} AS DOUBLE)) * sqrt(CAST({dy} AS DOUBLE))), 6)"
        f" END AS {alias}"
    )


def _pearson_col(n, sx, sy, sxx, syy, sxy):
    num = (n * sxy - sx * sy).cast("double")
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    r = num / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double")))
    return F.when((dx == 0) | (dy == 0), F.lit(None)).otherwise(
        F.round(r, 6)
    )


@register(
    "q145_quality_signal_correlation",
    oracle=f"""
    WITH m AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
             n_chars AS c,
             CAST(length(text)
                  - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS BIGINT) AS g
      FROM documents
    ),
    s AS (
      SELECT lang, count(*) AS n,
             CAST(sum(w) AS BIGINT) AS sw,
             CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(g) AS BIGINT) AS sg,
             CAST(sum(w*w) AS BIGINT) AS sww,
             CAST(sum(c*c) AS BIGINT) AS scc,
             CAST(sum(g*g) AS BIGINT) AS sgg,
             CAST(sum(w*c) AS BIGINT) AS swc,
             CAST(sum(w*g) AS BIGINT) AS swg
      FROM m GROUP BY lang
    )
    SELECT lang, n AS n_docs,
           {_pearson_sql('n', 'sw', 'sc', 'sww', 'scc', 'swc',
                         'corr_words_chars')},
           {_pearson_sql('n', 'sw', 'sg', 'sww', 'sgg', 'swg',
                         'corr_words_digits')}
    FROM s
    """,
)
def q145_quality_signal_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language Pearson correlation between quality signals
    (word count vs char count; word count vs digit count) — the
    redundancy audit a filter battery needs before shipping: two
    signals correlated at ~1 gate the same documents, so one of them
    buys no selectivity and its threshold fights the other's.

    Scale shape: ONE map-side-combinable groupBy — per-row integer
    signals (split size, length arithmetic; no UDF) reduced to exact
    integer moments (n, Σx, Σy, Σx², Σy², Σxy) per language, then r is
    closed-form per group. State is 10 BIGINTs × |langs|; nothing else
    moves — the shape survives any corpus size. Float discipline:
    Spark's corr() (streaming double covariance) is order-dependent
    across partitions; exact integer moments make the result
    partition-layout-independent AND cross-engine hashable. Overflow
    bound: Σxy terms stay < 2^63 up to ~10^13 docs/group at this
    corpus's row widths; widen the moments to DECIMAL(38,0) past that."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.size(F.split(F.col("text"), " ", -1)).cast("long")
    g = (
        F.length("text")
        - F.length(F.regexp_replace(F.col("text"), "[0-9]", ""))
    ).cast("long")
    m = docs.select(
        "lang", w.alias("w"), F.col("n_chars").alias("c"), g.alias("g")
    )
    s = m.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("w").alias("sw"),
        F.sum("c").alias("sc"),
        F.sum("g").alias("sg"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
        F.sum(F.col("w") * F.col("c")).alias("swc"),
        F.sum(F.col("w") * F.col("g")).alias("swg"),
    )
    n, sw, sc, sg = F.col("n"), F.col("sw"), F.col("sc"), F.col("sg")
    return s.select(
        "lang",
        n.alias("n_docs"),
        _pearson_col(
            n, sw, sc, F.col("sww"), F.col("scc"), F.col("swc")
        ).alias("corr_words_chars"),
        _pearson_col(
            n, sw, sg, F.col("sww"), F.col("sgg"), F.col("swg")
        ).alias("corr_words_digits"),
    )


# ---------------------------------------------------------------- q147
#: Rule names in gopher_signals flag-column order.
RULE_NAMES = ("word_count", "word_len", "stopword", "alpha")


def _ablation_sql() -> str:
    # Built ON TOP of q99's registered oracle string (nested CTE), so
    # the two queries' flag semantics cannot drift by construction.
    from setu_spark.registry import ORACLES

    cases = ", ".join(
        f"CASE WHEN flag_{r} THEN '{r}' END" for r in RULE_NAMES
    )
    return f"""
    WITH q99 AS ({ORACLES["q99_gopher_quality_rules"]}),
    failed AS (
      SELECT doc_id,
             list_filter([{cases}], x -> x IS NOT NULL) AS fl
      FROM q99
    ),
    pairs AS (
      SELECT f.doc_id, a.ra AS rule_a, b.rb AS rule_b
      FROM failed f, unnest(fl) AS a(ra), unnest(fl) AS b(rb)
      UNION ALL
      SELECT doc_id, fl[1] AS rule_a, 'ONLY' AS rule_b
      FROM failed WHERE len(fl) = 1
    )
    SELECT rule_a, rule_b, count(*) AS n_docs
    FROM pairs GROUP BY ALL
    """


@register("q147_quality_rule_ablation", oracle=_ablation_sql())
def q147_quality_rule_ablation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rule-battery ablation matrix for the Gopher filters: for every
    pair of rules, how many documents BOTH catch (diagonal = each
    rule's raw fail count), plus an `ONLY` row per rule counting the
    documents that rule alone gates. The threshold-tuning companion to
    q145's signal correlation: a rule whose fail set is ⊆ another's
    co-failure cell and whose ONLY count is ~0 can be dropped without
    admitting a single extra document — measured, not guessed, before
    a 100 TB filtering run.

    Scale shape: ONE corpus scan (q99's zero-exchange signal battery),
    the per-row failed-rule list fanned into its ≤4×4 pair array plus
    the sole-gate marker entirely inside the row (nested HOF transform,
    typed-empty via a zero-length slice — no union-of-two-scans, no
    join), then one map-combined groupBy over a ≤|rules|²+|rules| key
    space. Output is O(1) regardless of corpus size."""
    sig = gopher_signals(load_table(spark, sf_dir, "documents"))
    failed = F.array_compact(
        F.array(
            *[
                F.when(F.col(f"flag_{r}"), F.lit(r))
                for r in RULE_NAMES
            ]
        )
    )
    rows = sig.select(failed.alias("fl"))
    pairs = F.flatten(
        F.transform(
            F.col("fl"),
            lambda a: F.transform(
                F.col("fl"),
                lambda b: F.struct(
                    a.alias("rule_a"), b.alias("rule_b")
                ),
            ),
        )
    )
    only = F.when(
        F.size("fl") == 1,
        F.array(
            F.struct(
                F.element_at("fl", 1).alias("rule_a"),
                F.lit("ONLY").alias("rule_b"),
            )
        ),
    ).otherwise(F.slice(pairs, 1, 0))
    return (
        rows.select(F.explode(F.concat(pairs, only)).alias("p"))
        .select("p.rule_a", "p.rule_b")
        .groupBy("rule_a", "rule_b")
        .agg(F.count("*").alias("n_docs"))
    )
