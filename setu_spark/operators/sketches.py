"""Mergeable-sketch aggregates — the approximate forms every 100 TB
profile job uses where the exact aggregate would shuffle unboundedly.

  q28  approx_count_distinct (HyperLogLog++) vs exact countDistinct
  q84  approx_percentile (Greenwald-Khanna quantile summary) vs exact
       percentile

Both sketches are MERGEABLE: partial states combine associatively, so
they map-side combine into a few KB per group regardless of group
cardinality — the property the exact forms lack (exact distinct ships
every distinct value; exact percentile ships every value).

Verification contract (the bounded-witness pattern): sketch INTERNALS
are engine-specific, so the driver can't diff raw sketch state — but
each query's OUTPUT is fully hash-checkable:

  * exact twin columns replay bit-identically in DuckDB (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont`` — verified empirically,
    interpolation formula and float order agree; ``countDistinct`` ≡
    ``count(DISTINCT ...)``);
  * the sketch's estimate is checked Spark-side as a BOUND — a boolean
    ``approx_ok`` column the oracle matches with literal TRUE, so a
    sketch drifting outside its published error bound flips the hash;
  * q84's quantile sketch goes further: at driver scale (n per group ≪
    accuracy=10k) the GK summary is rank-exact, and its rank convention
    matches DuckDB's ``quantile_disc`` (verified element-for-element at
    sf0.01 and sf0.001), so even ``approx_q`` is hash-checked.

Results are exploded to one SCALAR row per (group, probe) — no
array-typed result columns (the driver's canonicalizer sorts rows with
pandas, and array cells crash its hash step; round-4 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from setu_spark.registry import register
from setu_spark.sources.io import load_table

#: q84 quantile probes and accuracy knob (10k ≈ 0.01% rank error).
QUANTILES = (0.25, 0.5, 0.9)
PCT_ACCURACY = 10_000

#: Witness bounds: generous multiples of each sketch's published error
#: (HLL rsd=0.01 → 5σ; GK rank error 1/10k, plus the disc-vs-interpolated
#: gap which dominates at small n — ~1% at n≈300). A sketch regression
#: blows these up.
DISTINCT_REL_BOUND = 0.05
QUANTILE_REL_BOUND = 0.05


# ---------------------------------------------------------------- q28
@register(
    "q28_approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           count(*) AS n_items,
           TRUE AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q28_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to its exact twin — the
    sketch the 100 TB path uses for cardinality profiling (SURVEY §2.4's
    absent-from-reference distinct-aggregate family): the HLL sketch
    map-side combines into a few KB per group regardless of cardinality,
    where exact countDistinct shuffles every distinct (group, value) pair.

    Bounded-witness check: ``approx_ok`` asserts the HLL estimate is
    within {DISTINCT_REL_BOUND:.0%} of the exact count (5× the rsd=0.01
    standard error) — computed Spark-side, hash-matched against the
    oracle's literal TRUE, so the estimate drifting out of bound is a
    driver-visible failure, while the raw engine-specific estimate stays
    out of the hashed output."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count("*").alias("n_items"),
    )
    rel_err = F.abs(F.col("approx") - F.col("exact_parts")) / F.col(
        "exact_parts"
    ).cast("double")
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "n_items",
        (rel_err <= DISTINCT_REL_BOUND).alias("approx_ok"),
    )


# ---------------------------------------------------------------- q84
def _q84_oracle() -> str:
    arms = [
        f"""SELECT o_orderpriority,
           CAST({p} AS DOUBLE) AS probe,
           count(*) AS n_orders,
           round(quantile_cont(o_totalprice, {p}), 6) AS exact_q,
           round(quantile_disc(o_totalprice, {p}), 6) AS approx_q,
           TRUE AS approx_ok
    FROM orders GROUP BY o_orderpriority"""
        for p in QUANTILES
    ]
    return "\n    UNION ALL\n    ".join(arms)


@register("q84_approx_quantiles", oracle=_q84_oracle())
def q84_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile next to the exact percentile — the quantile form
    that survives 100 TB: the sketch is mergeable and map-side combined
    (state is O(accuracy), ~KBs), where exact percentile materializes
    every value of the group on one reducer (exact twin is oracle-scale
    semantics only; production drops it).

    One scalar row per (priority, probe). Both value columns hash-check:
    Spark ``percentile`` interpolates identically to DuckDB
    ``quantile_cont`` (bit-equal doubles, verified at sf0.01/sf0.001);
    and because n per group ≪ accuracy={PCT_ACCURACY} at driver scale,
    the GK summary is rank-exact and returns precisely the element
    DuckDB's ``quantile_disc`` picks (rank = ceil(p·n), same tie
    behavior — verified element-for-element). ``approx_ok`` additionally
    pins the relative error ≤ {QUANTILE_REL_BOUND:.0%} Spark-side (the
    bound that remains meaningful at 100 TB where n ≫ accuracy and
    rank-exactness no longer holds)."""
    orders = load_table(spark, sf_dir, "orders")
    probes = "array(" + ", ".join(str(q) for q in QUANTILES) + ")"
    agg = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.expr(
            f"approx_percentile(o_totalprice, {probes}, {PCT_ACCURACY})"
        ).alias("aq"),
        F.expr(f"percentile(o_totalprice, {probes})").alias("eq"),
    )
    probe_lits = F.array(*[F.lit(float(q)) for q in QUANTILES])
    ex = agg.select(
        "o_orderpriority",
        "n_orders",
        "eq",
        "aq",
        F.posexplode(probe_lits).alias("i", "probe"),
    )
    exact_q = F.element_at("eq", F.col("i") + 1)
    approx_q = F.element_at("aq", F.col("i") + 1)
    rel_err = F.abs(approx_q - exact_q) / F.abs(exact_q)
    return ex.select(
        "o_orderpriority",
        "probe",
        "n_orders",
        F.round(exact_q, 6).alias("exact_q"),
        F.round(approx_q, 6).alias("approx_q"),
        (rel_err <= QUANTILE_REL_BOUND).alias("approx_ok"),
    )
