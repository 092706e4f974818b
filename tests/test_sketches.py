"""Sketch aggregates (operators.sketches): bounded-witness queries.

Round 5 made both sketch queries fully hash-checkable (scalar rows,
exact twin columns, Spark-computed ``approx_ok`` vs oracle TRUE) — the
parity gate itself lives in test_oracle_parity.py; the tests here pin
the witness semantics locally: the booleans must actually be True (a
broken sketch fails HERE first, with a readable message, before it
fails as an opaque hash mismatch at the driver), and the approx value's
rank error is bounded directly.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE


def test_q28_witness_booleans_true(spark):
    rows = entrymod.queries()["q28_approx_distinct_parts"](
        spark, SF_ORACLE
    ).collect()
    assert rows
    for r in rows:
        assert r.approx_ok, r
        assert r.exact_parts > 0 and r.n_items >= r.exact_parts, r


def test_q84_witness_booleans_and_rank_error(spark):
    from setu_spark.sources.io import load_table

    from pyspark.sql import functions as F

    from setu_spark.operators.sketches import PCT_ACCURACY, QUANTILES

    rows = entrymod.queries()["q84_approx_quantiles"](
        spark, SF_ORACLE
    ).collect()
    assert rows
    # The raw sketch estimate is no longer a hashed output column (q28
    # witness pattern: the value is scale-bound, the bounded approx_ok
    # witness is not) — recompute it here to pin the rank bound.
    #
    # WHY approx_q cannot be hashed at scale (divergence ledger D5,
    # COVERAGE.md — do not silently re-hash it in a refactor): Spark's
    # QuantileSummaries COMPRESSES once a group exceeds ~10k rows
    # regardless of the accuracy knob, so the returned data value stops
    # being the deterministic quantile_disc element DuckDB computes —
    # q84 was hash-green at sf0.01 and red at sf0.1 with bit-identical
    # code. The GK contract guarantees only the rank bound asserted
    # below; `approx_ok` (the bounded-error witness) is the invariant,
    # the raw estimate is not, and only the witness rides the oracle
    # hash.
    probes = "array(" + ", ".join(str(q) for q in QUANTILES) + ")"
    approx = {
        (r.o_orderpriority, i): v
        for r in load_table(spark, SF_ORACLE, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr(
                f"approx_percentile(o_totalprice, {probes}, {PCT_ACCURACY})"
            ).alias("aq")
        )
        .collect()
        for i, v in enumerate(r.aq)
    }
    # approx_percentile returns an ACTUAL data value (no interpolation),
    # so the right bound is on its RANK: rank error ≤ 1/accuracy plus
    # the 1/n discreteness of small groups.
    vals: dict[str, list[float]] = {}
    for v in (
        load_table(spark, SF_ORACLE, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ):
        vals.setdefault(v.o_orderpriority, []).append(v.o_totalprice)
    for r in rows:
        assert r.approx_ok, r
        group = sorted(vals[r.o_orderpriority])
        n = len(group)
        assert r.n_orders == n
        aq = approx[(r.o_orderpriority, QUANTILES.index(r.probe))]
        rank = sum(1 for v in group if v <= aq) / n
        assert abs(rank - r.probe) <= 2 / n + 1e-3, r


def test_sketch_queries_are_hash_checked():
    oracles = entrymod.oracle_sql()
    assert "q28_approx_distinct_parts" in oracles
    assert "q84_approx_quantiles" in oracles


def test_q121_witness_and_planted_skew(spark, tmp_path):
    """All witness booleans true on the corpus, and the space-saving
    guarantee holds on a planted adversarial shape: a long tail of
    distinct tokens (heap pressure) must not evict the true heavy
    hitters from the bounded local counters."""
    import os

    from pyspark.sql import functions as F

    from setu_spark.operators.sketches import TOPK, q121_heavy_hitters

    rows = entrymod.queries()["q121_heavy_hitters"](
        spark, SF_ORACLE
    ).collect()
    assert len(rows) == TOPK
    assert all(r.approx_found for r in rows), rows
    assert [r.rank for r in rows] == list(range(1, TOPK + 1))

    # planted skew: 5 tokens with 1000 hits each + 20k singletons
    heavy = " ".join(f"hh{i}" for i in range(5)) + " "
    docs = [(i, heavy * 200) for i in range(5)] + [
        (100 + i, " ".join(f"tail{i}_{j}" for j in range(100)))
        for i in range(200)
    ]
    d = str(tmp_path / "skew121")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        os.path.join(d, "documents.parquet")
    )
    out = q121_heavy_hitters(spark, d).collect()
    top5 = {r.tok for r in out if r.rank <= 5}
    assert top5 == {f"hh{i}" for i in range(5)}
    assert all(r.approx_found for r in out if r.rank <= 5)
