"""Event-stream analytics over the ``events`` table (batch form).

The reference has no streaming/event surface at all (SURVEY.md §2.12);
this module supplies the batch semantics — tumbling windows, sessionization,
keyed dedup, share-of-window — expressed so that the exact same aggregation
logic runs under Structured Streaming (see ``setu_spark/streaming/jobs.py``,
which reuses these shapes with ``readStream`` + watermarks).

Timestamp determinism: all event-time arithmetic runs in integer
microseconds (``ts_us``), exact and identical in both engines (DuckDB side
is ``epoch_us(ts)``). How ``ts_us`` is derived depends on the physical
parquet type, which has changed across testdata generations — see
:func:`load_events` for the dtype dispatch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from setu_spark.registry import DSUM, dsum, register
from setu_spark.sources.io import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds
HOUR_US = 3_600_000_000


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with an exact integer-µs event-time column ``ts_us``.

    The physical type of ``ts`` has varied across testdata generations:
    TIMESTAMP(NANOS) (readable only as int64 via the ``nanosAsLong`` conf)
    and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ / TIMESTAMP). Dispatch on
    the *loaded* dtype rather than assuming either:

    - ``bigint``  → the nanos conf kicked in; ``ts div 1000`` truncates to
      µs exactly like DuckDB's ns→µs coercion (floor for post-epoch data).
    - ``timestamp_ntz`` → pure wall-clock µs since the epoch via
      ``timestampdiff(MICROSECOND, ...)`` on NTZ values — arithmetic with
      NO session-timezone dependence (DuckDB's ``epoch_us`` on the same
      naive parquet values is the identical integer). Earlier rounds
      instead forced the session TZ to UTC and cast; that permanently
      mutated a harness-provided session's ``spark.sql.session.timeZone``
      for every later query — the round-4 ADVICE side-effect, now gone.
    - ``timestamp`` (tz-aware instant) → ``unix_micros(ts)``, which is
      timezone-independent by definition.

    ``nanosAsLong`` lives in ``session.DEFAULT_CONF``; the guarded ensure
    below exists because the driver's correctness harness hands us a session
    built elsewhere, and a NANOS-typed file would throw at read without it.
    It is a no-op on µs-typed files (and, unlike a TZ flip, cannot change
    the semantics of any already-working query).

    The ``value`` column must still be the double the oracles assume — a
    future testdata generation flipping it (e.g. to decimal) fails loudly
    HERE instead of as an opaque hash mismatch 50 queries later (the
    round-3 ts lesson, applied to the remaining numeric column)."""
    from setu_spark.session import ensure_sql_conf

    ensure_sql_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    dtypes = dict(ev.dtypes)
    if dtypes.get("value") != "double":
        raise TypeError(
            f"events.value expected double, got {dtypes.get('value')!r} — "
            "testdata schema drift; extend the load_events dispatch "
            "(operators/events.py) the way the ts dtypes are handled"
        )
    ts_dtype = dtypes["ts"]
    if ts_dtype == "bigint":
        ts_us = F.expr("ts div 1000")
    elif ts_dtype == "timestamp_ntz":
        ts_us = F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
    else:
        ts_us = F.unix_micros(F.col("ts"))
    return ev.withColumn("ts_us", ts_us)


# ---------------------------------------------------------------- q70
@register(
    "q70_hourly_event_stats",
    oracle=f"""
    SELECT (epoch_us(ts) // {HOUR_US}) * 3600 AS bucket_start,
           event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           {DSUM('value', 'total_value')}
    FROM events
    GROUP BY bucket_start, event_type
    """,
)
def q70_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (epoch-aligned — the batch twin of
    ``F.window(ts, '1 hour')``). One shuffle on (bucket, type)."""
    ev = load_events(spark, sf_dir)
    bucket = (F.expr(f"ts_us div {HOUR_US}") * 3600).alias("bucket_start")
    return ev.groupBy(bucket, "event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum(F.col("value"), "total_value"),
    )


# ---------------------------------------------------------------- q71
@register(
    "q71_user_sessions",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, value,
             epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                          > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    numbered AS (
      SELECT *,
             CAST(sum(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS BIGINT)
               AS session_no
      FROM seq
    )
    SELECT user_id, session_no,
           min(ts_us) AS session_start_us,
           max(ts_us) AS session_end_us,
           count(*) AS n_events,
           {DSUM('value', 'session_value')}
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def q71_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap (gaps-and-islands:
    lag → new-session flag → running sum → group). Batch twin of
    ``session_window(ts, '30 minutes')``; integer-microsecond arithmetic
    end to end. Scales as one shuffle on user_id (the window and the final
    group share the partitioning).

    A NULL timestamp is NO event time (round-11 NULL wave): an event
    with no time has no place in a session, so NULL-ts rows are
    excluded in both engines. Left implicit, Spark's NULLS-FIRST window
    order glues them into a phantom leading session while DuckDB's
    NULLS-LAST appends them to the final one."""
    ev = load_events(spark, sf_dir).filter(F.col("ts_us").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "value",
        "ts_us",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = seq.withColumn(
        "session_no", F.sum("is_new").over(w2).cast("bigint")
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        dsum(F.col("value"), "session_value"),
    )


# ---------------------------------------------------------------- q72
@register(
    "q72_first_event_per_user_type",
    oracle="""
    SELECT user_id, event_type, event_id, value
    FROM (
      SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events WHERE ts IS NOT NULL
    )
    WHERE rn = 1
    """,
)
def q72_first_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest event — the deterministic-survivor
    form of ``dropDuplicates`` (SURVEY.md P8 note) and the batch twin of
    streaming ``dropDuplicatesWithinWatermark``.

    A NULL timestamp is NO event time (round-11 NULL wave): "first by
    time" is undefined for an undated event, so NULL-ts rows are
    excluded in both engines — left implicit, Spark's NULLS-FIRST pick
    beats every dated event while DuckDB's NULLS-LAST never picks one."""
    ev = load_events(spark, sf_dir).filter(F.col("ts_us").isNotNull())
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_us", "event_id"
    )
    return (
        ev.select(
            "user_id",
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------- q73
@register(
    "q73_event_type_hourly_share",
    oracle=f"""
    WITH hourly AS (
      SELECT (epoch_us(ts) // {HOUR_US}) * 3600 AS bucket_start,
             event_type, count(*) AS n_events
      FROM events
      GROUP BY bucket_start, event_type
    )
    SELECT bucket_start, event_type, n_events,
           round(n_events / CAST(sum(n_events) OVER
                 (PARTITION BY bucket_start) AS DOUBLE), 6) AS share
    FROM hourly
    """,
)
def q73_event_type_hourly_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + windowed share-of-total (integer counts → exact ratio)."""
    ev = load_events(spark, sf_dir)
    bucket = (F.expr(f"ts_us div {HOUR_US}") * 3600).alias("bucket_start")
    hourly = ev.groupBy(bucket, "event_type").agg(
        F.count("*").alias("n_events")
    )
    w = Window.partitionBy("bucket_start")
    return hourly.select(
        "bucket_start",
        "event_type",
        "n_events",
        F.round(
            F.col("n_events") / F.sum("n_events").over(w).cast("double"), 6
        ).alias("share"),
    )


# ---------------------------------------------------------------- q74
@register(
    "q74_event_props_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           event_type
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
    """,
)
def q74_event_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON extraction from the ``props`` payload column +
    predicate on the extracted value (get_json_object stays JVM-side)."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.select(
        "event_id", k.alias("k_value"), "event_type"
    ).filter(F.col("k_value") >= 50)


# ---------------------------------------------------------------- q75
@register(
    "q75_user_totals",
    oracle=f"""
    SELECT user_id,
           count(*) AS n_events,
           {DSUM('coalesce(value, 0)', 'total_value')}
    FROM events
    GROUP BY user_id
    """,
)
def q75_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime totals — the batch twin of the custom stateful
    streaming operator (``streaming.jobs.running_user_totals``,
    applyInPandasWithState): the stream's final state per user must equal
    this aggregate. One map-side-combined shuffle on user_id."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        dsum(F.coalesce(F.col("value"), F.lit(0.0)), "total_value"),
    )


# ---------------------------------------------------------------- q76
HALF_HOUR_US = 1_800_000_000


@register(
    "q76_sliding_event_counts",
    oracle=f"""
    WITH contrib AS (
      -- an event at t belongs to the two 1h/30m sliding windows starting at
      -- floor(t, 30m) and floor(t, 30m) - 30m
      SELECT (epoch_us(ts) // {HALF_HOUR_US} - k) * 1800 AS win_start,
             event_type, value
      FROM events, unnest(range(0, 2)) AS u(k)
    )
    SELECT win_start, event_type,
           count(*) AS n_events,
           {DSUM('coalesce(value, 0)', 'total_value')}
    FROM contrib
    GROUP BY win_start, event_type
    """,
)
def q76_sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregate (1-hour windows every 30 minutes — the
    batch twin of ``F.window(ts, '1 hour', '30 minutes')``): each event is
    expanded to its window/slide = 2 member windows, then one map-side-
    combined shuffle. Shuffle volume is 2× events (generally
    window÷slide ×), the same cost model Structured Streaming pays for
    overlapping windows."""
    ev = load_events(spark, sf_dir)
    contrib = ev.select(
        "event_type",
        "value",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("k"),
        F.expr(f"ts_us div {HALF_HOUR_US}").alias("halfh"),
    ).select(
        ((F.col("halfh") - F.col("k")) * 1800).alias("win_start"),
        "event_type",
        "value",
    )
    return contrib.groupBy("win_start", "event_type").agg(
        F.count("*").alias("n_events"),
        dsum(F.coalesce(F.col("value"), F.lit(0.0)), "total_value"),
    )


# ---------------------------------------------------------------- q77
@register(
    "q77_event_funnel",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(epoch_us(ts)) FILTER (WHERE event_type = 'view') AS t_view,
             min(epoch_us(ts)) FILTER (WHERE event_type = 'click') AS t_click,
             min(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS t_buy
      FROM events
      GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(*) FILTER (WHERE t_view IS NOT NULL) AS n_viewed,
           count(*) FILTER (WHERE t_view IS NOT NULL
                            AND t_click > t_view) AS n_clicked_after_view,
           count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                            AND t_buy > t_click) AS n_full_funnel
    FROM firsts
    """,
)
def q77_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive funnel (view → click → purchase, by each user's
    FIRST occurrence time): one groupBy computing conditional min
    timestamps, then per-row ordering predicates — sequence analytics with
    a single shuffle on user_id, no self-joins, no windows over the raw
    event stream."""
    ev = load_events(spark, sf_dir)

    def first_ts(etype: str):
        return F.min(
            F.when(F.col("event_type") == etype, F.col("ts_us"))
        )

    firsts = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_buy"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    bought = clicked & (F.col("t_buy") > F.col("t_click"))
    # coalesce to 0: a funnel over zero users has zero completions in
    # both engines (the oracle's spelling already reads 0), but a bare
    # SQL sum over nothing is NULL — the only place the empty-corpus
    # sweep found the NULL-vs-0 split on a global aggregate
    def czero(c: Column, name: str) -> Column:
        return F.coalesce(c, F.lit(0)).alias(name)

    return firsts.agg(
        F.count("*").alias("n_users"),
        czero(F.sum(viewed.cast("long")), "n_viewed"),
        czero(F.sum(clicked.cast("long")), "n_clicked_after_view"),
        czero(F.sum(bought.cast("long")), "n_full_funnel"),
    )


# ---------------------------------------------------------------- q95
DAY_US = 24 * HOUR_US


@register(
    "q95_cohort_retention",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) // {DAY_US} AS day FROM events
    ),
    c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
    SELECT c.cohort_day, e.day - c.cohort_day AS age_days,
           count(DISTINCT e.user_id) AS active_users
    FROM e JOIN c USING (user_id)
    GROUP BY c.cohort_day, age_days
    """,
)
def q95_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day, then
    distinct-active counts per (cohort, days-since-first) cell — the
    classic product-analytics readout, here in integer-µs day buckets so
    both engines bucket identically.

    Scale shape: the cohort day is a MIN WINDOW over the user partition
    of the same projected rows (one shuffle on user_id — no
    groupBy-then-join diamond, the same collapse as q39/q88), then one
    partial-aggregated distinct-count shuffle on the (cohort, age)
    cell. Per-user state is one bigint; cells are
    O(days × days) — tiny forever."""
    ev = load_events(spark, sf_dir)
    e = ev.select(
        "user_id", F.expr(f"ts_us div {DAY_US}").alias("day")
    ).withColumn(
        "cohort_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    return e.groupBy(
        "cohort_day", (F.col("day") - F.col("cohort_day")).alias("age_days")
    ).agg(F.countDistinct("user_id").alias("active_users"))


# ---------------------------------------------------------------- q96
#: trailing buckets used as the anomaly baseline
ANOM_LOOKBACK = 6


@register(
    "q96_event_anomaly",
    oracle=f"""
    WITH counts AS (
      SELECT event_type, epoch_us(ts) // {HOUR_US} AS bucket,
             count(*) AS cnt
      FROM events WHERE ts IS NOT NULL
      GROUP BY event_type, bucket
    ),
    trail AS (
      SELECT event_type, bucket, cnt,
             sum(cnt) OVER w AS s,
             sum(cnt * cnt) OVER w AS sq,
             count(*) OVER w AS n
      FROM counts
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN {ANOM_LOOKBACK} PRECEDING
                            AND 1 PRECEDING)
    )
    SELECT event_type, bucket, cnt,
           round((cnt - s / CAST(n AS DOUBLE))
                 / sqrt((sq - s * s / CAST(n AS DOUBLE))
                        / CAST(n - 1 AS DOUBLE)), 6) AS zscore
    FROM trail
    WHERE n = {ANOM_LOOKBACK}
      AND (sq - s * s / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) > 0
    """,
)
def q96_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly score: each (event_type, hour) count
    z-scored against the previous {ANOM_LOOKBACK} hours — the streaming-
    monitor readout ("did click volume just spike") in its batch form.

    Cross-engine determinism by construction: the trailing mean/variance
    derive from SUMS OF INTEGER COUNTS (exact in any order in both
    engines) rather than avg/stddev aggregates, whose engine-specific
    accumulation (Welford vs naive) would race the round-6 hash gate.
    Zero-variance and short-history rows are excluded — a z-score
    against no baseline is noise, not signal.

    Scale shape: one shuffle to the (type, bucket) counts — cardinality
    O(types × hours), tiny forever — then a per-type ordered window over
    those counts; per-partition state is {ANOM_LOOKBACK} bigints.

    A NULL timestamp is NO event time (round-11 NULL wave): the NULL
    bucket is excluded in both engines BEFORE the ordered trailing
    window — left in, it sits at opposite ends of the bucket order
    (Spark NULLS FIRST, DuckDB NULLS LAST) and shifts every early
    row's baseline frame."""
    ev = load_events(spark, sf_dir).filter(F.col("ts_us").isNotNull())
    counts = ev.groupBy(
        "event_type", F.expr(f"ts_us div {HOUR_US}").alias("bucket")
    ).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-ANOM_LOOKBACK, -1)
    )
    trail = counts.select(
        "event_type",
        "bucket",
        "cnt",
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("sq"),
        F.count("*").over(w).alias("n"),
    )
    mean = F.col("s") / F.col("n").cast("double")
    var = (
        F.col("sq") - F.col("s") * F.col("s") / F.col("n").cast("double")
    ) / (F.col("n") - 1).cast("double")
    return (
        trail.filter((F.col("n") == ANOM_LOOKBACK) & (var > 0))
        .select(
            "event_type",
            "bucket",
            "cnt",
            F.round((F.col("cnt") - mean) / F.sqrt(var), 6).alias(
                "zscore"
            ),
        )
    )


# ---------------------------------------------------------------- q137
@register(
    "q137_props_schema_parse",
    oracle="""
    SELECT event_type,
           CAST(count(k) AS BIGINT) AS n_parsed,
           CAST(count(*) - count(k) AS BIGINT) AS n_unparsed,
           CAST(min(k) AS BIGINT) AS k_min,
           CAST(max(k) AS BIGINT) AS k_max,
           round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS k_avg
    FROM (
      SELECT event_type,
             CASE WHEN regexp_matches(props, '^\\{"k": -?[0-9]{1,18}\\}$')
                  THEN CAST(json_extract(props, '$.k') AS BIGINT)
             END AS k
      FROM events
    )
    GROUP BY event_type
    """,
)
def q137_props_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema'd semi-structured parsing: ``from_json`` decodes the whole
    ``props`` payload into a TYPED struct in one pass — the API a
    pipeline uses when it consumes many fields (q74's
    ``get_json_object`` re-parses the document per extracted path; a
    schema'd decode parses once and unparseable payloads surface as
    NULLs to count, not silent drops). A strict shape regexp gates the
    decode in both engines — their malformed-JSON semantics differ
    (NULL vs throw vs coerce), so off-shape payloads are counted as
    unparsed under one pinned rule. Per-type parse counts + typed
    min/max/exact-average of the decoded field.

    Scale shape: the JSON decode is a JVM-side projection riding the
    scan (no Python, no shuffle); one map-combined groupBy(event_type)
    follows. The integer average is exact-sum / count in both engines
    (registry float discipline)."""
    ev = load_events(spark, sf_dir)
    # strict shape guard BEFORE the decode, mirrored in the oracle: the
    # engines' failure semantics diverge on malformed payloads (Spark
    # from_json yields NULL; DuckDB json_extract THROWS, and coerces
    # string-typed numbers where Spark nulls them), so the parse
    # contract is pinned to the generated {"k": int} shape and anything
    # else counts as unparsed identically in both engines. The digit
    # count is bounded at 18 so every admitted integer fits BIGINT in
    # BOTH engines by construction: on a wider payload Spark from_json
    # NULLs (counted unparsed) but DuckDB CAST(... AS BIGINT) THROWS.
    # Anchor with \z, not $: Java's $ matches before a trailing '\n'
    # (a payload ending '}\n' would be shaped here but unshaped under
    # DuckDB's RE2 $, which only matches at true end-of-text). \z pins
    # both engines to the same end-of-input semantics.
    shaped = F.col("props").rlike('^\\{"k": -?[0-9]{1,18}\\}\\z')
    parsed = ev.select(
        "event_type",
        F.when(
            shaped,
            F.from_json(F.col("props"), "k BIGINT").getField("k"),
        ).alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_parsed"),
        (F.count("*") - F.count("k")).cast("long").alias("n_unparsed"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.round(F.sum("k").cast("double") / F.count("k"), 6).alias(
            "k_avg"
        ),
    )
