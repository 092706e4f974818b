"""Mergeable-sketch aggregates — the approximate forms every 100 TB
profile job uses where the exact aggregate would shuffle unboundedly.

Sketch values are engine-specific (HLL register layouts / t-digest
centroids differ between Spark and DuckDB), so these register as
ROWS-ONLY queries; each result carries its EXACT twin column so the
approximation error is visible in the output, and local tests pin the
error bound (tests/test_wordlists.py::test_q28…, test_sketches.py).

  q28  approx_count_distinct (HyperLogLog++) vs exact countDistinct
  q84  approx_percentile (t-digest-style quantile sketch) vs exact
       percentile

Both sketches are MERGEABLE: partial states combine associatively, so
they map-side combine into a few KB per group regardless of group
cardinality — the property the exact forms lack (exact distinct ships
every distinct value; exact percentile ships every value)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from setu_spark.registry import register
from setu_spark.sources.io import load_table

#: q84 quantile probes and accuracy knob (10k ≈ 0.01% rank error).
QUANTILES = (0.25, 0.5, 0.9)
PCT_ACCURACY = 10_000


# ---------------------------------------------------------------- q28
@register("q28_approx_distinct_parts")  # rows-only: HLL sketches are
# engine-specific, so the estimate can't hash-match a different engine;
# the exact twin column in the result shows estimate quality instead
def q28_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to its exact twin — the
    sketch the 100 TB path uses for cardinality profiling (SURVEY §2.4's
    absent-from-reference distinct-aggregate family): the HLL sketch
    map-side combines into a few KB per group regardless of cardinality,
    where exact countDistinct shuffles every distinct (group, value) pair.
    rsd=0.01 bounds relative error at ~1%; the query returns both so the
    bound is visible in the result, and the rows-only driver check plus a
    local assertion in tests pin it."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------- q84
@register("q84_approx_quantiles")  # rows-only: quantile-sketch centroid
# placement is engine-specific; exact twins ride along instead
def q84_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile next to the exact percentile (q21's operator) —
    the quantile form that survives 100 TB: the sketch is mergeable and
    map-side combined (state is O(accuracy), ~KBs), where exact
    percentile materializes every value of the group on one reducer.
    Accuracy {PCT_ACCURACY} bounds rank error at 1/{PCT_ACCURACY};
    tests/test_sketches.py pins the value error against the exact twin."""
    orders = load_table(spark, sf_dir, "orders")
    probes = "array(" + ", ".join(str(q) for q in QUANTILES) + ")"
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.expr(
            f"approx_percentile(o_totalprice, {probes}, {PCT_ACCURACY})"
        ).alias("approx_q"),
        F.expr(f"percentile(o_totalprice, {probes})").alias("exact_q"),
    )
