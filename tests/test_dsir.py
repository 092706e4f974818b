"""DSIR importance weighting (q124) semantics on a planted fixture:
documents written in the target domain's vocabulary must out-weigh
documents from a disjoint vocabulary, and the weight must be exactly
zero-information when target and raw distributions coincide."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from setu_spark.operators.curation import q124_dsir_importance


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_target_vocab_docs_outweigh_disjoint_vocab(spark, tmp_path):
    # target domain (lang='en') speaks {alpha..delta}; the off-domain
    # pool speaks {zig..zag}. A held-out doc in target vocabulary must
    # get a strictly higher log-weight than one in off-domain vocabulary.
    en = "alpha beta gamma delta " * 20
    off = "zig zag zap zoom " * 20
    rows = [
        (1, en.strip(), "en"),
        (2, en.strip(), "en"),
        (3, off.strip(), "de"),
        (4, off.strip(), "de"),
        (5, en.strip(), "fr"),   # target-vocab text, non-target lang
        (6, off.strip(), "es"),  # off-vocab text
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in q124_dsir_importance(spark, d).collect()}
    assert out[5]["dsir_logw"] > out[6]["dsir_logw"]
    assert out[1]["dsir_logw"] > out[3]["dsir_logw"]
    # weights are finite and the sample key differs from the raw weight
    # (the Gumbel perturbation is applied)
    for r in out.values():
        assert r["sample_key"] != r["dsir_logw"]


def test_identical_distributions_give_near_zero_weight(spark, tmp_path):
    # when every doc is in the target domain, p == q bucket-for-bucket
    # up to the smoothing totals, so log-weights collapse toward 0 and
    # are identical across identical docs.
    rows = [(i, "one two three four five", "en") for i in range(4)]
    d = _write_docs(spark, tmp_path, rows)
    out = q124_dsir_importance(spark, d).collect()
    ws = {r["dsir_logw"] for r in out}
    assert len(ws) == 1
    assert abs(next(iter(ws))) < 1e-6
