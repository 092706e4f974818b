#!/usr/bin/env python
"""Measure the PRODUCTION ordering of the fuzzy-dedup funnel on the
20×-replicated stress corpus: exact dedup → MinHash+LSH candidate pairs
(q52 shape) → bounded edit-distance verify (q108 shape).

PERF.md documents why q108 is absent from the raw 20× sweep: N×
replication inflates TRUE duplicate pairs quadratically (C(N,2) per
doc), which is exactly what running exact dedup FIRST removes — the
replicated copies are byte-identical, so the funnel's verify stage only
ever sees overlap-sized candidate volume. This script measures that
claim instead of asserting it.

Usage: python tools/funnel_sweep.py [stress_dir]   (default /tmp/stress100k)
Prints one JSON line with per-stage wall seconds and candidate counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import operator


def main() -> None:
    stress = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress100k"
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from setu_spark.operators.dedup import (
        EDIT_SIM_THRESHOLD,
        NUM_PERM,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from setu_spark.session import get_spark

    spark = get_spark("funnel-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(stress, "documents.parquet"))
    out: dict = {"corpus": stress, "load_start": round(os.getloadavg()[0], 2)}

    # stage 1: exact dedup — one shuffle on the 128-bit content hash;
    # survivors materialized (localCheckpoint) so later stages measure
    # their own cost, not a recomputation of stage 1
    t0 = time.perf_counter()
    survivors = (
        docs.withColumn("content_hash", F.md5("text"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("content_hash").orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn", "content_hash")
        .localCheckpoint()
    )
    out["n_docs"] = docs.count()
    out["n_survivors"] = survivors.count()
    out["t_exact_dedup"] = round(time.perf_counter() - t0, 2)

    # stage 2: q52-shaped LSH pairs on the SURVIVOR corpus
    t0 = time.perf_counter()
    sig = minhash_signatures(survivors).cache()
    pairs = lsh_candidate_pairs(sig)
    sa, sb = sig.alias("sa"), sig.alias("sb")
    eq = [
        (F.col(f"sa.m{j}") == F.col(f"sb.m{j}")).cast("int")
        for j in range(NUM_PERM)
    ]
    est = functools.reduce(operator.add, eq) / float(NUM_PERM)
    verified_pairs = (
        pairs.join(sa, pairs.id_a == F.col("sa.doc_id"))
        .join(sb, pairs.id_b == F.col("sb.doc_id"))
        .filter(est >= 0.5)
        .select("id_a", "id_b", F.round(est, 6).alias("est_jaccard"))
        .localCheckpoint()
    )
    out["n_lsh_pairs"] = verified_pairs.count()
    out["t_lsh_pairs"] = round(time.perf_counter() - t0, 2)

    # stage 3: q108-shaped bounded edit verify on those pairs
    from fractions import Fraction

    t0 = time.perf_counter()
    max_len = survivors.agg(F.max(F.length("text"))).first()[0] or 0
    k = int((1 - Fraction(str(EDIT_SIM_THRESHOLD))) * max_len)
    da = survivors.select(
        F.col("doc_id").alias("id_a"), F.col("text").alias("text_a")
    )
    db = survivors.select(
        F.col("doc_id").alias("id_b"), F.col("text").alias("text_b")
    )
    lev = (
        verified_pairs.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("text_a", "text_b", k).alias("edit_dist"),
            F.greatest(F.length("text_a"), F.length("text_b")).alias(
                "max_len"
            ),
        )
    )
    sim = 1 - F.col("edit_dist") / F.col("max_len").cast("double")
    confirmed = lev.filter(
        (F.col("edit_dist") >= 0) & (sim >= EDIT_SIM_THRESHOLD)
    )
    out["n_confirmed"] = confirmed.count()
    out["t_edit_verify"] = round(time.perf_counter() - t0, 2)
    out["load_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
