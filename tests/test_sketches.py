"""Sketch aggregates (analytics.sketches): rows-only queries pinned
locally against their exact twin columns."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE


def test_q28_approx_within_rsd(spark):
    rows = entrymod.queries()["q28_approx_distinct_parts"](
        spark, SF_ORACLE
    ).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_parts - r.exact_parts) <= max(
            0.05 * r.exact_parts, 2
        ), r


def test_q84_approx_quantiles_close(spark):
    from setu_spark.operators.sketches import QUANTILES
    from setu_spark.sources.io import load_table

    rows = entrymod.queries()["q84_approx_quantiles"](
        spark, SF_ORACLE
    ).collect()
    assert rows
    # approx_percentile returns an ACTUAL data value (no interpolation),
    # so the right bound is on its RANK, not its distance to the
    # interpolated exact quantile: rank error ≤ 1/accuracy plus the
    # 1/n discreteness of small groups.
    vals: dict[str, list[float]] = {}
    for v in (
        load_table(spark, SF_ORACLE, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ):
        vals.setdefault(v.o_orderpriority, []).append(v.o_totalprice)
    for r in rows:
        group = sorted(vals[r.o_orderpriority])
        n = len(group)
        assert len(r.approx_q) == len(r.exact_q) == len(QUANTILES)
        for q, a in zip(QUANTILES, r.approx_q):
            rank = sum(1 for v in group if v <= a) / n
            assert abs(rank - q) <= 2 / n + 1e-3, (r.o_orderpriority, q, a)


def test_sketch_queries_are_rows_only():
    oracles = entrymod.oracle_sql()
    assert "q28_approx_distinct_parts" not in oracles
    assert "q84_approx_quantiles" not in oracles
