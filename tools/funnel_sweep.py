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

def main() -> None:
    stress = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress100k"
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from setu_spark.operators.dedup import (
        edit_verify,
        lsh_candidate_pairs,
        minhash_signatures,
        pair_est_jaccard,
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

    # stage 2: q52's exact pipeline (shared helpers) on the SURVIVOR corpus
    t0 = time.perf_counter()
    sig = minhash_signatures(survivors).cache()
    verified_pairs = pair_est_jaccard(
        sig, lsh_candidate_pairs(sig)
    ).localCheckpoint()
    out["n_lsh_pairs"] = verified_pairs.count()
    out["t_lsh_pairs"] = round(time.perf_counter() - t0, 2)

    # stage 3: q108's exact bounded edit verify (shared helper)
    t0 = time.perf_counter()
    confirmed = edit_verify(survivors, verified_pairs)
    out["n_confirmed"] = confirmed.count()
    out["t_edit_verify"] = round(time.perf_counter() - t0, 2)
    out["load_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
