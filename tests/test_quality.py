"""Quality-family semantics the oracles can't pin: the zlib entropy
signal (no SQL twin exists) on planted fixtures, plus a Gopher-battery
spot check against hand-computed values."""

from __future__ import annotations

from pyspark.sql import functions as F

from setu_spark.operators.quality import (
    MIN_STOPWORD_FRAC,
    MIN_WORDS,
)


def test_compression_ratio_flags_low_entropy(spark, tmp_path):
    """Repetitive text must flag, high-entropy text must not — the whole
    point of the signal."""
    import os
    import random

    from setu_spark.operators.quality import (
        compression_signals,
        q104_compression_ratio,
    )
    from setu_spark.sources.io import load_table

    random.seed(11)
    rows = [
        (1, "spam " * 400),  # pure repetition -> tiny ratio
        (2, " ".join(
            "".join(random.choices("abcdefghijklmnopqrstuvwxyz", k=8))
            for _ in range(400)
        )),  # random words -> ratio near/above the floor
    ]
    d = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.parquet(os.path.join(d, "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in compression_signals(load_table(spark, d, "documents")).collect()
    }
    assert out[1]["flag_low_entropy"] and out[1]["zlib_ratio"] < 0.05
    assert not out[2]["flag_low_entropy"]
    # ratio is compressed/original on utf-8 bytes
    assert out[2]["orig_bytes"] == len(rows[1][1].encode())
    # the registered witness form: every fixture doc satisfies the bound
    wit = {r["doc_id"]: r for r in q104_compression_ratio(spark, d).collect()}
    assert all(r["ratio_ok"] for r in wit.values())
    assert wit[2]["orig_bytes"] == out[2]["orig_bytes"]


def test_gopher_battery_hand_computed(spark, tmp_path):
    import os

    from setu_spark.operators.quality import q99_gopher_quality_rules

    text = "the quick brown fox jumps over the lazy dog again today yes"
    short = "too short"
    rows = [(1, text), (2, short)]
    d = str(tmp_path / "docs2.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in q99_gopher_quality_rules(spark, d).collect()}
    r1 = out[1]
    assert r1["n_words"] == 12
    # 'the' twice of 12 words
    assert abs(r1["stopword_frac"] - round(2 / 12, 6)) < 1e-9
    assert r1["alpha_frac"] == 1.0
    assert r1["flag_word_count"]  # 12 < MIN_WORDS=30
    assert MIN_WORDS > 12 and MIN_STOPWORD_FRAC < 2 / 12
    r2 = out[2]
    assert r2["n_words"] == 2 and r2["flag_word_count"]
    assert not r2["passes"]


def test_q115_sketch_gate_agrees_with_exact_on_separated_scores(spark, tmp_path):
    """Planted fixture where the approx (sketch-threshold) and exact
    (percent_rank) gates provably agree: per-lang scores are
    well-separated around the 10% floor, so both conventions cut at the
    same document boundary."""
    import os

    from setu_spark.operators.quality import (
        q109_quality_percentile_gate,
        q115_quality_sketch_gate,
    )

    # 20 docs per lang; stopword_frac is monotone in doc index because
    # doc i has i stopwords out of 20 words -> fracs 0/20..19/20, far
    # apart relative to any sketch error at this size.
    rows = []
    did = 0
    for lang in ("en", "hi"):
        for i in range(20):
            words = ["the"] * i + [f"w{j}x" for j in range(20 - i)]
            rows.append((did, " ".join(words), lang))
            did += 1
    d = str(tmp_path / "docs115.parquet")
    spark.createDataFrame(rows, "doc_id long, text string, lang string").withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text").cast("long")).write.parquet(
        os.path.join(d, "documents.parquet")
    )
    exact = {
        (r.doc_id, r.lang)
        for r in q109_quality_percentile_gate(spark, d).collect()
    }
    approx = {
        (r.doc_id, r.lang) for r in q115_quality_sketch_gate(spark, d).collect()
    }
    # q109 keeps percent_rank >= 0.10 -> drops the bottom 2 of 20 per
    # lang ((rank-1)/19 < 0.10 for ranks 1-2); q115 keeps frac >=
    # disc-quantile element at rank ceil(0.10*20)=2 -> drops only rank 1.
    # The conventions differ by exactly the rank-2 doc; both must be
    # supersets of ranks 3.. and subsets of ranks 2..
    assert len(approx) in (len(exact), len(exact) + 2), (
        len(exact),
        len(approx),
    )
    assert exact <= approx
    for lang in ("en", "hi"):
        kept = sorted(i for i, lg in approx if lg == lang)
        assert len(kept) in (18, 19)


def test_quality_signal_correlation_exact_cases(spark):
    """q145 on planted data: chars = 2·words exactly → r = 1.0;
    digit count constant → zero variance → NULL (never NaN/div-zero);
    single-row group → NULL both."""
    import setu_spark.operators.quality as q

    def doc(i, lang, k):
        text = " ".join(["w"] * k)          # k words, zero digits
        return (i, lang, text, 2 * k)       # n_chars := 2·words
    docs = spark.createDataFrame(
        [doc(1, "xx", 3), doc(2, "xx", 5), doc(3, "xx", 8),
         doc(4, "yy", 4)],
        ["doc_id", "lang", "text", "n_chars"],
    )
    orig = q.load_table
    q.load_table = lambda sp, d, n: docs
    try:
        rows = {
            r.lang: r
            for r in q.q145_quality_signal_correlation(spark, "x").collect()
        }
    finally:
        q.load_table = orig
    assert rows["xx"].n_docs == 3
    assert rows["xx"].corr_words_chars == 1.0
    assert rows["xx"].corr_words_digits is None   # zero digit variance
    assert rows["yy"].corr_words_chars is None    # single row: dx = 0


def test_quality_rule_ablation_planted_cells(spark):
    """q147 cells on planted docs: a doc failing word_count ONLY
    (long-enough words, stopwords present, but < MIN_WORDS of them),
    and a doc failing nothing, must yield exactly the diagonal cell
    plus its ONLY row. Note '1 a word' style docs fail several rules
    at once — the planted single-failure doc is crafted to pass the
    other three."""
    import setu_spark.operators.quality as q

    # 10 words (< MIN_WORDS=30): mean len in [3,10], 2/10 stopwords
    # >= 0.05, all alphabetic -> ONLY flag_word_count fires.
    short = "the quick brown foxes jump over the lazy sleepy dogs"
    # 35 words, same mix -> passes everything.
    ok = " ".join(["the quick brown foxes jumps"] * 7)
    docs = spark.createDataFrame(
        [(1, short), (2, ok)], ["doc_id", "text"]
    )
    orig = q.load_table
    q.load_table = lambda sp, d, n: docs
    try:
        cells = {
            (r.rule_a, r.rule_b): r.n_docs
            for r in q.q147_quality_rule_ablation(spark, "x").collect()
        }
    finally:
        q.load_table = orig
    assert cells == {
        ("word_count", "word_count"): 1,
        ("word_count", "ONLY"): 1,
    }


def test_char_repetition_topk_is_floor_sqrt(spark):
    """U10 boundary pin (round-8 fix): the reference's k is
    int(sqrt(distinct)) — FLOOR, not ceil (filters.py:565). With 2
    distinct 5-grams {aaaaa:2, aaaab:1}, floor takes the top 1
    (score 2/3); ceil would take both (score 1.0)."""
    from setu_spark.operators.textstats import _char_rep_udf

    row = (
        spark.createDataFrame([("aaaaaab",)], ["text"])
        .select(_char_rep_udf("text").alias("r"))
        .select("r.*")
        .head()
    )
    assert row.total_ngrams == 3
    assert abs(row.repetition_score - 0.666667) < 1e-9
