"""Join-zoo operators beyond the reference's equi-join-only surface.

The reference has exactly one join shape — shuffle equi-join on column
lists (SURVEY.md §2.3, broadcast explicitly disabled). The analytics
surface needs the rest of the zoo; semi/anti/broadcast live in
``analytics/queries.py`` (q10/q11, q02-q05); this module adds the two
non-equi shapes with their scalable formulations:

  * **range join** (predicate ``lo <= x < hi``): broadcast the band table —
    a non-equi condition against a broadcast side is a BroadcastNestedLoop
    join whose inner side is tiny, i.e. O(rows × bands) local work and zero
    shuffle. Never express a range join fact×fact without banding.
  * **as-of join** (latest right row with ``r.ts <= l.ts`` per key): the
    union + windowed ``last(ignorenulls)`` formulation — one shuffle on the
    key, no per-row probing, deterministic tie handling (a right row at
    exactly ``l.ts`` counts, matching DuckDB's ``ASOF JOIN`` ``<=``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from setu_spark.registry import DSUM, dsum, register
from setu_spark.operators.events import load_events
from setu_spark.sources.io import load_table

PRICE_BANDS = [
    ("low", 0.0, 20_000.0),
    ("mid", 20_000.0, 60_000.0),
    ("high", 60_000.0, 1e18),
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Generic as-of join: for every left row, attach the latest right-side
    ``value_cols`` with ``right_ts <= left_ts`` on the same ``key``.

    Union + window ``last(ignorenulls)`` — scales as one shuffle on key
    (contrast: a naive join + groupBy-max is two shuffles plus a join
    explosion when right is dense)."""
    l_tag = left.withColumnRenamed(left_ts, "_ts").withColumn(
        "_is_left", F.lit(1)
    )
    r_tag = right.select(
        key, F.col(right_ts).alias("_ts"), *value_cols
    ).withColumn("_is_left", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows at the same _ts sort first (_is_left=0) so "<=" matches
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return (
        filled.filter(F.col("_is_left") == 1)
        .drop("_is_left", *value_cols)
        .withColumnRenamed("_ts", left_ts)
    )


# ---------------------------------------------------------------- q18
@register(
    "q18_order_price_bands",
    oracle=f"""
    SELECT b.band, count(*) AS n_orders, {DSUM('o.o_totalprice', 'band_total')}
    FROM orders o
    JOIN (VALUES {', '.join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)})
         AS b(band, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def q18_order_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against a broadcast band table (BroadcastNestedLoop with
    a 3-row inner side — zero shuffle for the join itself)."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, ["band", "lo", "hi"])
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), "band_total"),
        )
    )


# ---------------------------------------------------------------- q19
@register(
    "q19_asof_last_signup",
    oracle="""
    WITH evts AS (SELECT event_id, user_id, ts, value FROM events
                  WHERE event_type <> 'signup' AND ts IS NOT NULL),
    signups AS (SELECT user_id, ts FROM events
                WHERE event_type = 'signup' AND ts IS NOT NULL)
    SELECT e.event_id, e.user_id,
           epoch_us(e.ts) AS ts_us,
           epoch_us(s.ts) AS signup_us
    FROM evts e
    ASOF LEFT JOIN signups s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def q19_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attach each event's most recent prior (or simultaneous)
    signup. Checked against DuckDB's native ASOF JOIN.

    A NULL timestamp is NO event time (round-11 NULL wave): an as-of
    join is order-dependent, so NULL-ts rows are excluded on BOTH sides
    in both engines. Left implicit, the engines invent opposite
    answers: DuckDB's ASOF sort-merge places a NULL probe after every
    signup and matches the LATEST one, while the Spark window form
    yields NULL — a silent divergence, not a semantic choice."""
    ev = load_events(spark, sf_dir).filter(F.col("ts_us").isNotNull())
    targets = ev.filter(F.col("event_type") != "signup").select(
        "user_id", "event_id", "ts_us"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts_us").alias("signup_us")
    )
    joined = asof_join(
        targets,
        signups.select("user_id", F.col("signup_us").alias("_ts"), "signup_us"),
        key="user_id",
        left_ts="ts_us",
        right_ts="_ts",
        value_cols=["signup_us"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("asof_signup_us").alias("signup_us"),
    )
