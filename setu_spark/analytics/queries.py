"""Relational analytics corpus over the TPC-H-ish testdata.

Exercises the operator families the reference uses (SURVEY.md §2.2-§2.8:
projections, predicate filters, equi-joins, multi-metric aggregation) plus
the families the reference lacks but any analytics surface needs (§2.3/§2.4
"missing-but-required": broadcast joins, semi/anti joins, windows, rollup/
cube, distinct aggregates, top-k, set ops).

Scale notes (100 TB stance), applied throughout:
  * fact-fact joins (orders⋈lineitem) are shuffle hash/sort-merge on the
    join key — Spark co-partitions both sides; AQE handles skew;
  * every dim join (region/nation/supplier/part/customer) is explicitly
    ``F.broadcast`` — dims stay small even at SF100k, so no shuffle of the
    fact side for those joins;
  * aggregations are single ``groupBy().agg(...)`` calls (one shuffle with
    map-side partial aggregation) — never the reference's
    one-agg-per-metric-then-join pattern (SURVEY.md A7/J2);
  * windows partition on high-cardinality keys (custkey, nationkey) so
    state per partition stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from setu_spark.registry import DSUM, dsum, register
from setu_spark.sources.io import load_table, load_table_parallel

REVENUE = "l_extendedprice * (1 - l_discount)"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------- q01
@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity', 'sum_qty')},
           {DSUM('l_extendedprice', 'sum_base_price')},
           {DSUM(REVENUE, 'sum_disc_price')},
           {DSUM(f'{REVENUE} * (1 + l_tax)', 'sum_charge')},
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate, the pure-Spark fast path.

    Plan check: single exchange on (returnflag, linestatus) after a partial
    aggregate; shipdate predicate pushed to the parquet scan."""
    li = load_table_parallel(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(_rev_col(), "sum_disc_price"),
            dsum(_rev_col() * (1 + F.col("l_tax")), "sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------- q02
@register(
    "q02_top_parts_by_revenue",
    oracle=f"""
    SELECT p.p_partkey, p.p_name,
           {DSUM(REVENUE, 'revenue')}
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name
    ORDER BY revenue DESC, p_partkey
    LIMIT 10
    """,
)
def q02_top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + top-k. ``part`` is a dim (2k rows at sf0.01,
    still tiny at SF100k) → broadcast, so lineitem never shuffles for the
    join; top-k is TakeOrderedAndProject (no global sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(dsum(_rev_col(), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(10)
    )


# ---------------------------------------------------------------- q03
@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {DSUM(REVENUE, 'revenue')},
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, order_date, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast the filtered customer dim into orders,
    shuffle-join orders⋈lineitem on orderkey, aggregate, top-k."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg(dsum(_rev_col(), "revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------- q05
@register(
    "q05_region_nation_revenue",
    oracle=f"""
    SELECT n.n_name, {DSUM(REVENUE, 'revenue')}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q05_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: one fact-fact shuffle join (orders⋈lineitem); every
    dim hop (customer, supplier, nation⋈region) broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(_rev_col(), "revenue"))
    )


# ---------------------------------------------------------------- q06
@register(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT {DSUM('l_extendedprice * l_discount', 'promo_revenue')},
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure pushed-down predicate + global aggregate.
    All four predicates reach the parquet scan (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "promo_revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------- q07
@register(
    "q07_customer_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate NULLS LAST, o_orderkey) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def q07_customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running window aggregate. Partitioned by custkey (high cardinality →
    scales out; per-partition state is one customer's order history).

    NULL order dates (real ingest has them) sort NULLS LAST explicitly
    in both engines — Spark's ASC default is NULLS FIRST, DuckDB's is
    NULLS LAST, a silent running-sum divergence on any NULL-planted
    corpus (round-11 NULL wave). The orderkey tiebreak keeps the
    undated tail deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_last("o_orderdate"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


# ---------------------------------------------------------------- q08
@register(
    "q08_supplier_rank_in_nation",
    oracle=f"""
    WITH rev AS (
      SELECT s.s_nationkey, s.s_suppkey, {DSUM(REVENUE, 'revenue')}
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey, s.s_suppkey
    )
    SELECT n.n_name, rev.s_suppkey, rev.revenue,
           rank() OVER (PARTITION BY rev.s_nationkey
                        ORDER BY rev.revenue DESC, rev.s_suppkey) AS rnk
    FROM rev JOIN nation n ON rev.s_nationkey = n.n_nationkey
    """,
)
def q08_supplier_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() window over an aggregate, dim joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey")
        .agg(dsum(_rev_col(), "revenue"))
    )
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("revenue"), F.asc("s_suppkey")
    )
    return (
        rev.join(F.broadcast(nation), rev.s_nationkey == nation.n_nationkey)
        .select("n_name", "s_suppkey", "revenue", F.rank().over(w).alias("rnk"))
    )


# ---------------------------------------------------------------- q09
@register(
    "q09_sales_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
             AS gid,
           count(*) AS n_items,
           {DSUM('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q09_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets + grouping_id — absent from the reference
    (SURVEY.md §2.4), built-in here."""
    li = load_table_parallel(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count("*").alias("n_items"),
        dsum(F.col("l_quantity"), "sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "n_items", "sum_qty")


# ---------------------------------------------------------------- q10
@register(
    "q10_late_shipment_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def q10_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join with a non-equi residual
    condition (the reference realizes its only semi-filter as an inner join,
    SURVEY.md J5 — left_semi avoids duplicating matches)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------- q11
@register(
    "q11_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q11_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join (absent from reference, SURVEY.md §2.7)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------- q12
@register(
    "q12_supplier_part_breadth",
    oracle="""
    SELECT l_suppkey,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_items
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def q12_supplier_part_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate (expands to two-phase agg in Spark; scales as a
    shuffle on (suppkey, partkey) then (suppkey))."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------- q13
@register(
    "q13_segment_acctbal",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           {DSUM('c_acctbal', 'total_acctbal')},
           min(c_acctbal) AS min_acctbal,
           max(c_acctbal) AS max_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q13_segment_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "customer")
    return li.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        dsum(F.col("c_acctbal"), "total_acctbal"),
        F.min("c_acctbal").alias("min_acctbal"),
        F.max("c_acctbal").alias("max_acctbal"),
    )


# ---------------------------------------------------------------- q14
@register(
    "q14_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap_days
    FROM orders
    """,
)
def q14_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() window — days since the customer's previous order (NULL for
    the first)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    )


# ---------------------------------------------------------------- q15
@register(
    "q15_status_priority_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
             AS gid,
           count(*) AS n_orders,
           {DSUM('o_totalprice', 'total_price')}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q15_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice"), "total_price"),
    ).select(
        "o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price"
    )


# ---------------------------------------------------------------- q16
@register(
    "q16_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def q16_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the scalable top-k-per-key pattern
    (no global sort; one shuffle on the partition key)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------- q17
@register(
    "q17_rich_customers_minus_buyers",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def q17_rich_customers_minus_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (EXCEPT) — absent from the reference (SURVEY.md §2.7)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    buyers = orders.select(F.col("o_custkey").alias("c_custkey"))
    return rich.subtract(buyers)  # EXCEPT (distinct) semantics


# ---------------------------------------------------------------- q20
@register(
    "q20_repeat_buyers_intersection",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders
    WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def q20_repeat_buyers_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (INTERSECT, distinct semantics) — customers active in
    both 1995 and 1996. With q17's EXCEPT and the as-of join's unionByName
    this completes the set-op family (SURVEY.md §2.7: absent from the
    reference, built-in here). Spark plans INTERSECT as a left-semi
    aggregate — one shuffle per side on the key."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("c_custkey")
    )
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return y95.intersect(y96)


# ---------------------------------------------------------------- q21
@register(
    "q21_price_percentiles",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 6) AS p90
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q21_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (`percentile` ≡ DuckDB `quantile_cont`,
    both linear-interpolation). Exact percentile needs the group's values
    together — at 100 TB prefer `approx_percentile` (t-digest, mergeable,
    map-side combined); the exact form is declared here because the oracle
    can check it bit-for-bit."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
    )


# ---------------------------------------------------------------- q22
@register(
    "q22_part_name_drift",
    oracle="""
    SELECT a.p_partkey,
           levenshtein(a.p_name, b.p_name) AS edit_dist,
           length(a.p_name) AS name_len
    FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
    """,
)
def q22_part_name_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family over a self-join: `levenshtein` between
    consecutive part names (the edit-distance primitive the fuzzy-match
    tier uses after LSH candidate generation — never all-pairs). Self-join
    on key+1 stays a co-partitioned merge after one shuffle."""
    part = load_table(spark, sf_dir, "part")
    a = part.alias("a")
    b = part.alias("b")
    return a.join(
        b, F.col("b.p_partkey") == F.col("a.p_partkey") + 1
    ).select(
        F.col("a.p_partkey").alias("p_partkey"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias(
            "edit_dist"
        ),
        F.length(F.col("a.p_name")).alias("name_len"),
    )


# ---------------------------------------------------------------- q23
@register(
    "q23_monthly_seasonality",
    oracle=f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(month(o_orderdate) AS INT) AS month_num,
           CAST(quarter(o_orderdate) AS INT) AS quarter_num,
           count(*) AS n_orders,
           {DSUM('o_totalprice', 'revenue')}
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q23_monthly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function family (`date_format`/`month`/`quarter` with a pushed
    date-range predicate): revenue by calendar month. The range predicate
    reaches the parquet scan; at 100 TB with date-partitioned data it
    becomes partition pruning."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.month("o_orderdate").alias("month_num"),
            F.quarter("o_orderdate").alias("quarter_num"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), "revenue"),
        )
    )


# ---------------------------------------------------------------- q24
@register(
    "q24_price_math_profile",
    oracle="""
    SELECT l_linestatus,
           count(*) AS n,
           round(CAST(sum(CAST(ln(l_extendedprice) AS DECIMAL(28,12)))
                      AS DOUBLE) / count(*), 6) AS avg_log_price,
           round(sqrt(CAST(sum(CAST(l_quantity * l_quantity
                                    AS DECIMAL(18,6))) AS DOUBLE)
                      / count(*)), 6) AS rms_qty,
           CAST(sum(CAST(ceil(l_extendedprice / 1000) AS BIGINT)) AS BIGINT)
             AS price_kilobuckets,
           round(max(abs(l_discount - 0.05)), 6) AS max_discount_dev
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q24_price_math_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar family (ln/sqrt/ceil/abs) inside one map-side-combined
    aggregate. Float averages go through the exact-decimal route ((28,12)
    for ln terms, (18,6) for plain prices — exact,
    order-independent — plain avg() sums doubles in partition order, which
    can flip the 6th rounded digit between engines); min/max/integer sums
    are order-independent already.

    Round-14: the round-13 input rebalance is REVERTED here per the
    no-keep-at-parity rule — wave-3 read 0.96×, the round-13 closing
    A/B 1.02×, and the round-14 6-rep focused A/B confirmed parity
    (bench_records/ab_r14_q24.json): the decimal-sum aggregate is
    map-side combined, so the serial scan stage carries too little
    per-row work to clear the measured ≳0.7 s rebalance break-even."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_log = (
        F.sum(F.log(F.col("l_extendedprice")).cast("decimal(28,12)"))
        .cast("double")
        / F.count("*")
    )
    msq = (
        F.sum(
            (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(18,6)")
        ).cast("double")
        / F.count("*")
    )
    return li.groupBy("l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(avg_log, 6).alias("avg_log_price"),
        F.round(F.sqrt(msq), 6).alias("rms_qty"),
        F.sum(
            F.ceil(F.col("l_extendedprice") / 1000).cast("bigint")
        ).cast("bigint").alias("price_kilobuckets"),
        F.round(F.max(F.abs(F.col("l_discount") - 0.05)), 6).alias(
            "max_discount_dev"
        ),
    )


# ---------------------------------------------------------------- q25
@register(
    "q25_name_normalization",
    oracle="""
    SELECT s_suppkey,
           upper(s_name) AS name_upper,
           trim(lower(s_name)) AS name_lower,
           lpad(CAST(s_suppkey AS VARCHAR), 9, '0') AS key_padded,
           replace(s_name, '#', '-') AS name_dashed,
           split_part(s_name, '#', 1) AS name_prefix,
           length(s_name) AS name_len
    FROM supplier
    """,
)
def q25_name_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar family (upper/lower/trim/lpad/replace/split_part) —
    the normalization pass every entity-resolution pipeline starts with.
    Pure per-row codegen'd expressions, zero shuffles."""
    sup = load_table(spark, sf_dir, "supplier")
    return sup.select(
        "s_suppkey",
        F.upper("s_name").alias("name_upper"),
        F.trim(F.lower("s_name")).alias("name_lower"),
        F.lpad(F.col("s_suppkey").cast("string"), 9, "0").alias(
            "key_padded"
        ),
        F.replace(F.col("s_name"), F.lit("#"), F.lit("-")).alias(
            "name_dashed"
        ),
        F.split_part(F.col("s_name"), F.lit("#"), F.lit(1)).alias(
            "name_prefix"
        ),
        F.length("s_name").alias("name_len"),
    )


# ---------------------------------------------------------------- q26
@register(
    "q26_conditional_aggregates",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_totalprice > 200000) AS n_large,
           {DSUM("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END",
                 'urgent_revenue')},
           round(count(*) FILTER (WHERE o_totalprice > 200000)
                 / CAST(count(*) AS DOUBLE), 6) AS large_share
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q26_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation family (FILTER / CASE-routed sums) — one
    pass over the fact table computing several filtered metrics at once
    instead of one scan per metric; all map-side combined."""
    orders = load_table(spark, sf_dir, "orders")
    large = (F.col("o_totalprice") > 200000).cast("long")
    return orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(large).alias("n_large"),
        dsum(
            F.when(
                F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")
            ).otherwise(F.lit(0.0)),
            "urgent_revenue",
        ),
        F.round(F.sum(large) / F.count("*").cast("double"), 6).alias(
            "large_share"
        ),
    )


# ---------------------------------------------------------------- q27
@register(
    "q27_unified_activity_ledger",
    oracle=f"""
    WITH ledger AS (
      SELECT 'order' AS entry_kind, o_custkey AS entity_id,
             o_totalprice AS amount
      FROM orders
      UNION ALL
      SELECT 'lineitem' AS entry_kind, l_suppkey AS entity_id,
             l_extendedprice AS amount
      FROM lineitem
    )
    SELECT entry_kind,
           count(*) AS n_entries,
           count(DISTINCT entity_id) AS n_entities,
           {DSUM('amount', 'total_amount')}
    FROM ledger
    GROUP BY entry_kind
    """,
)
def q27_unified_activity_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of heterogeneous facts into one normalized ledger, then a
    single aggregate over the union — the set-op family's bag semantics
    (q17 EXCEPT and q20 INTERSECT are the distinct forms). `unionByName`
    keeps the columns aligned by name; at scale the union is free (no
    shuffle — each side streams into the same aggregation)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.lit("order").alias("entry_kind"),
        F.col("o_custkey").alias("entity_id"),
        F.col("o_totalprice").alias("amount"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit("lineitem").alias("entry_kind"),
        F.col("l_suppkey").alias("entity_id"),
        F.col("l_extendedprice").alias("amount"),
    )
    return (
        orders.unionByName(li)
        .groupBy("entry_kind")
        .agg(
            F.count("*").alias("n_entries"),
            F.countDistinct("entity_id").alias("n_entities"),
            dsum(F.col("amount"), "total_amount"),
        )
    )


# ---------------------------------------------------------------- q106
#: Pivot column domain, declared explicitly: Spark otherwise runs an
#: extra distinct JOB to discover it, and at 100 TB column discovery
#: must never scan the fact table (the reference has no pivot at all —
#: SURVEY.md §2.4 covers only plain/rollup/cube shapes).
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q106_event_type_pivot",
    oracle=f"""
    SELECT user_id,
           {", ".join(
               f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
               f" AS n_{t}" for t in EVENT_TYPES
           )}
    FROM events
    GROUP BY user_id
    """,
)
def q106_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one row per user, one count column per event type — the
    wide-format export every BI/feature-store handoff asks for.

    Scale shape: with the pivot domain DECLARED (values list), Spark
    compiles this to a single groupBy(user_id) whose aggregate buffer
    holds |types| counters — one partial-agg'd shuffle, identical to the
    oracle's FILTER-routed conditional aggregation; no per-type scans,
    no domain-discovery job."""
    from setu_spark.operators.events import load_events

    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0)
        .select(
            "user_id",
            *[F.col(t).alias(f"n_{t}") for t in EVENT_TYPES],
        )
    )


# ---------------------------------------------------------------- q107
@register(
    "q107_grouping_sets_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) * 2
                + grouping(o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q107_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the irregular multi-level report
    rollup/cube can't express ((status), (priority), ()) without paying
    for the (status, priority) cross level. Declared through the SQL API
    (``spark.sql`` over a temp view): grouping sets have no DataFrame
    builder, and the engine's surface includes SQL-first users.

    Scale shape: Spark expands grouping sets into one Expand + single
    partial-agg'd shuffle — rows replicate once per set (3× here), never
    once per group; same plan family as q15's cube."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("q107_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) * 2
                    + grouping(o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS total_price
        FROM q107_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------- q134
#: Trailing-window width in days for the RANGE-frame rolling revenue.
TRAIL_DAYS = 30


@register(
    "q134_trailing_range_revenue",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           CAST(date_diff('day', DATE '1990-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS day_ord,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
                  PARTITION BY o_custkey
                  ORDER BY CAST(date_diff('day', DATE '1990-01-01',
                                          CAST(o_orderdate AS DATE))
                                AS BIGINT)
                  RANGE BETWEEN {TRAIL_DAYS - 1} PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS trail_revenue
    FROM orders
    """,
)
def q134_trailing_range_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-customer trailing {TRAIL_DAYS}-day revenue via a true RANGE
    window frame spanning exactly {TRAIL_DAYS} distinct day ordinals
    (frame = {TRAIL_DAYS}-1 PRECEDING..CURRENT, since the current day
    is day 1 of the window) — the interval-framed moving aggregate
    (SURVEY §2.5
    names ``rangeBetween`` as part of the rebuild's window surface;
    q07/q96 exercise only ROWS frames). RANGE frames differ observably
    from ROWS: all orders on the same (customer, day) are frame PEERS
    and every one of them sees the full peer group's sum, and gaps in
    the date axis shrink the frame — semantics a ROWS frame cannot
    express without a self-join.

    The ORDER BY key is an integer day ordinal (days since 1990-01-01)
    so both engines frame over identical integers — timestamp-typed
    RANGE frames have engine-specific interval semantics; integer
    ordinals do not. Revenue sums are DECIMAL(18,6)-exact inside the
    frame (order-independent), cast back to double.

    Scale shape: one hash-partitioned sort window per customer — the
    same shuffle/sort cost as any per-key window (q07); frame
    evaluation is the sliding two-pointer pass inside each partition,
    linear in rows."""
    orders = load_table(spark, sf_dir, "orders")
    day_ord = F.datediff(
        F.to_date("o_orderdate"), F.to_date(F.lit("1990-01-01"))
    ).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("day_ord"))
        .rangeBetween(-(TRAIL_DAYS - 1), 0)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            day_ord.alias("day_ord"),
            F.col("o_totalprice").cast("decimal(18,6)").alias("p"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "day_ord",
            F.sum("p").over(w).cast("double").alias("trail_revenue"),
        )
    )


# ---------------------------------------------------------------- q136
@register(
    "q136_order_distribution_stats",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS BIGINT) AS price_quartile,
           round(cume_dist() OVER w, 6) AS cdist,
           nth_value(o_totalprice, 2) OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_highest_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice NULLS LAST, o_orderkey)
    """,
)
def q136_order_distribution_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The remaining analytic-window trio in one pass: ``ntile`` (equal-
    count quartile buckets — NOT the value-rank deciles q102 computes),
    ``cume_dist`` (empirical CDF position), and ``nth_value`` with an
    explicit full-partition frame (the runner-up price every row can
    see). The (price, orderkey) tie-break gives a total order, so
    cume_dist has no peer groups and every value is engine-stable.

    Scale shape: one hash-partitioned sort window per priority — all
    three functions evaluate in the same single window pass (one
    exchange, one sort); nth_value's unbounded frame reads the
    partition's materialized run, not a second shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    # NULL prices sort NULLS LAST explicitly in BOTH directions and both
    # engines: Spark defaults NULLS FIRST on ASC, and un-priced orders
    # must neither occupy quartile 1 nor become the "second highest"
    # (round-11 NULL wave)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc_nulls_last("o_totalprice"), "o_orderkey"
    )
    wd = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.desc_nulls_last("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.nth_value("o_totalprice", 2).over(wd).alias(
            "second_highest_price"
        ),
    )
