"""Structured Streaming surface over the events schema.

The reference is batch-only (SURVEY.md §2.12); this module is the
green-field streaming tier. Design rule: every streaming job shares its
aggregation logic with a batch twin in ``setu_spark/operators/events.py``
— the transformation is written once against a DataFrame and applied to
either ``spark.read`` or ``spark.readStream`` input, so the DuckDB oracle
can check the semantics in batch while the streaming tests check the
plumbing (watermarks, triggers, output modes, state).

Scale stance:
  * state is kept only in built-in stateful operators (windowed aggs,
    ``session_window``, ``dropDuplicatesWithinWatermark``) — bounded by the
    watermark, partitioned by the grouping keys;
  * watermark delay is a parameter: it bounds state size (and at 100 TB/day
    ingest, state *is* the capacity question);
  * sinks go through ``foreachBatch`` when they need batch-only features
    (e.g. partitioned parquet overwrite per window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: the events schema with a proper (µs) timestamp column — what a live
#: source (Kafka / file drop) would carry.
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of events parquet files."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


# --- shared batch/stream transformations --------------------------------

def hourly_event_stats(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windowed aggregate — streaming twin of q70 (same
    groups; window struct instead of epoch bucket)."""
    return events.groupBy(
        F.window("ts", "1 hour").alias("win"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """``session_window`` sessionization — streaming twin of q71's
    gaps-and-islands (same sessions; window end is last event + gap)."""
    return events.groupBy(
        F.session_window("ts", gap).alias("session"), "user_id"
    ).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("first_event"),
        F.max("ts").alias("last_event"),
    )


def with_watermark(events: DataFrame, delay: str = "2 hours") -> DataFrame:
    return events.withWatermark("ts", delay)


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Streaming keyed dedup — twin of q72 (first event wins). State for a
    key is dropped once the watermark passes, so memory is bounded by
    (keys arriving within the delay window), not the full history."""
    return events.dropDuplicatesWithinWatermark(
        keys or ["user_id", "event_type"]
    )


# --- runners -------------------------------------------------------------

def run_to_memory(
    df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> None:
    """Drain an availableNow stream into the in-memory table ``query_name``
    (test/debug sink)."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_parquet(
    df: DataFrame, out_dir: str, output_mode: str = "update"
) -> None:
    """foreachBatch sink: per-microbatch parquet append — the shape used
    when the sink needs batch-only features (dynamic partition overwrite,
    merge-style upserts)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --- custom stateful operator ---------------------------------------------

USER_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_USER_TOTALS_STATE = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (event count, value total), emitted on every update.
    The built-in stateful ops (windows, session_window, streaming dedup)
    cover the reference surface; this is the escape hatch for state shapes
    they can't express (SURVEY.md §2.12). Batch twin: q75_user_totals.

    State is one (bigint, double) pair per user — at 100 TB/day the state
    store scales with |active users|, not event volume. Production jobs add
    an event-time timeout to expire idle users; the availableNow test path
    keeps NoTimeout so the final update equals the batch aggregate."""
    import pandas as pd  # local: keep module import session/pandas-light

    def fn(key, pdf_iter, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=_USER_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sliding_event_counts(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes — streaming twin of q76
    (same per-window totals; window struct instead of epoch bucket)."""
    return events.groupBy(
        F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total_value"),
    )


# --- stream-static join ----------------------------------------------------

def enrich_with_user_profile(
    events: DataFrame, profile: DataFrame
) -> DataFrame:
    """Stream-static join: enrich the (possibly streaming) events flow
    with a per-user profile dimension — the canonical "join the firehose
    to the slowly-changing dim" pattern. The static side is broadcast, so
    the streaming side needs NO state and NO shuffle: each micro-batch is
    a map-side hash join (stateless → works in append mode with no
    watermark requirement). Left join keeps events from users the profile
    hasn't seen yet (cold-start rows get NULL profile columns).

    The same function body serves batch DataFrames — the stream≡batch
    equivalence test in tests/test_streaming.py feeds it both."""
    prof = F.broadcast(
        profile.select(
            "user_id",
            F.col("n_events").alias("profile_n_events"),
            F.col("total_value").alias("profile_total_value"),
        )
    )
    return events.join(prof, "user_id", "left").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "profile_n_events",
        F.when(
            F.col("profile_n_events") >= 3, F.lit("heavy")
        ).otherwise(F.lit("light")).alias("user_tier"),
    )


# --- stream-stream join ----------------------------------------------------

def clicks_followed_by_views(
    events: DataFrame, horizon: str = "30 minutes", delay: str = "2 hours"
) -> DataFrame:
    """Stream-stream time-bounded join: pair every click with the same
    user's views landing within ``horizon`` after it — the attribution
    join ("which views did this click lead to"). Both sides derive from
    the same flow; each carries its own watermark, and the join range
    condition lets Spark expire buffered state once the watermark passes
    click_ts + horizon — state is O(events inside the horizon window),
    never unbounded.

    On a batch DataFrame ``withWatermark`` is a no-op and the same body
    is the time-bounded self-join (the q18 range-join family), which is
    what the stream≡batch test compares against."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", delay)
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", delay)
    return clicks.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") >= F.col("click_ts"))
        & (
            F.col("view_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
        ),
    ).select("user_id", "click_id", "view_id", "click_ts", "view_ts")


# --- streaming ingest admission -------------------------------------------

def admission_decisions(
    new_docs: DataFrame, existing_hashes: DataFrame
) -> DataFrame:
    """Stream-static ingest admission — q122's exact-dup stage as a
    STREAM: each micro-batch of incoming documents joins the static
    existing-corpus content-hash table and emits (doc_id, status) with
    status ∈ {'exact_dup', 'novel'}. The hash table is the classic
    broadcastable dimension (~48 bytes per existing doc, no text), so
    the stream side never shuffles; at 100 TB the static side is the
    precomputed hash index the batch gate (operators/dedup.py q122)
    also reads, and the banded near-dup stage runs per micro-batch in
    ``foreachBatch`` over the same machinery (its two-sided distinct
    makes it a batch-only shape by Structured Streaming's rules).
    Stream ≡ batch is pinned in tests/test_streaming.py, and the
    decision logic itself is the SAME function the batch gate runs
    (operators/dedup.py ``exact_admission``), so the two paths cannot
    drift."""
    from setu_spark.operators.dedup import exact_admission

    return exact_admission(new_docs, existing_hashes)


def ann_admission_decisions(
    new_vecs: DataFrame, existing: DataFrame, out_dir: str
) -> None:
    """Streaming ANN ingest admission — q152's gate as a STREAM: each
    micro-batch of incoming ``(vec_id, embedding)`` rows probes the
    static existing-corpus hyperplane band index and appends
    (vec_id, status, best_cosine, n_candidates) decisions as parquet.

    Runs ``operators/dedup.ann_admission`` — the EXACT function the
    batch gate q152 registers — inside ``foreachBatch``: the banded
    verify is distinct + keyed-agg work (a batch-only shape by
    Structured Streaming's multi-aggregation rules), and admission is
    per-row independent against a static index, so the union of
    per-micro-batch decisions IS the batch result — pinned by
    tests/test_streaming.py. At 100 TB the static side is the
    precomputed bucketed ANN index every crawl batch probes; per-batch
    work is proportional to the new vectors × their bucket collisions."""
    from setu_spark.operators.dedup import ann_admission

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ann_admission(batch_df, existing).write.mode("append").parquet(
            out_dir
        )

    q = (
        new_vecs.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --- streaming heavy hitters (bounded-state frequent keys) --------------

#: Shards for the streaming Misra–Gries sketch: state is bounded at
#: HH_SHARDS × HH_M counters TOTAL regardless of how many distinct keys
#: the stream ever carries — the property that lets a frequent-keys
#: monitor run forever on an unbounded key domain (the batch twin with
#: the same summary is q121_heavy_hitters).
HH_SHARDS = 8
HH_M = 50

HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("seq", LongType()),
        StructField("key", LongType()),
        StructField("est_count", LongType()),
    ]
)

_HH_STATE = StructType(
    [
        StructField("seq", LongType()),
        StructField("keys", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def with_shard(events: DataFrame, n_shards: int = HH_SHARDS) -> DataFrame:
    """Deterministic shard assignment for the sketch state: the same
    key always lands on the same shard, so each shard's summary sees
    that key's full stream."""
    return events.withColumn(
        "shard", F.pmod(F.xxhash64("user_id"), F.lit(n_shards))
    )


def streaming_heavy_hitters(events: DataFrame, m: int = HH_M) -> DataFrame:
    """Frequent-keys sketch over a stream with HARD-BOUNDED state: a
    Misra–Gries summary of at most ``m`` counters per shard, maintained
    in ``applyInPandasWithState`` and re-emitted (full snapshot + a
    monotone ``seq``) on every update — consumers take the max-seq
    snapshot per shard, DROP the NULL-key sentinel rows (emitted when a
    decrement legitimately empties a summary, so every seq stays
    observable), and merge. Guarantee (Misra–Gries, mergeable
    form): every key whose true shard count exceeds N_shard/(m+1)
    survives in the summary, and estimates undercount by at most
    N_shard/(m+1); sharding by key hash partitions the guarantee
    cleanly across shards. Unlike ``groupBy(key).count()`` — whose
    state grows with |distinct keys| — this monitor runs forever on an
    unbounded key domain. Batch twin: q121_heavy_hitters (same summary
    per partition instead of per shard)."""
    import pandas as pd

    def fn(key, pdf_iter, state):
        if state.exists:
            seq, keys, counts = state.get
            counters = dict(zip(keys, counts))
        else:
            seq, counters = 0, {}
        for pdf in pdf_iter:
            for k, c in pdf["user_id"].value_counts().items():
                counters[int(k)] = counters.get(int(k), 0) + int(c)
            if len(counters) > m:
                # batched Misra-Gries decrement: subtract the (m+1)-th
                # largest count, drop non-positive -> at most m remain
                pivot = sorted(counters.values(), reverse=True)[m]
                counters = {
                    k: v - pivot for k, v in counters.items() if v > pivot
                }
        seq += 1
        state.update(
            (seq, list(counters.keys()), [int(v) for v in counters.values()])
        )
        # the decrement step can legitimately empty the summary (m+1
        # equal-count keys -> pivot equals every value); an empty yield
        # would leave no row at the new seq, and a consumer following
        # the max-seq-snapshot protocol would resurrect the PREVIOUS
        # snapshot. Emit a NULL-key sentinel so every seq is observable
        # and an empty summary reads as empty.
        keys = list(counters.keys()) or [None]
        vals = [int(v) for v in counters.values()] or [None]
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(keys),
                "seq": [seq] * len(keys),
                "key": keys,
                "est_count": vals,
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return with_shard(events).groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=_HH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
