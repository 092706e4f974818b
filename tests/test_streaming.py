"""Structured Streaming jobs: plumbing tests with file source + memory sink.

Strategy (SURVEY.md §2.12): each streaming job shares its transformation
with a batch twin, so batch-vs-stream equivalence on the same input is the
correctness check; watermark/dedup behavior is checked with crafted late
and duplicate rows.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from setu_spark.streaming.jobs import (
    dedup_within_watermark,
    hourly_event_stats,
    read_events_stream,
    run_foreach_batch_parquet,
    run_to_memory,
    sessionize,
    with_watermark,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + timedelta(minutes=m), uid, et, float(v), "{}")
            for i, (m, uid, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


@pytest.fixture()
def events_dir(spark):
    d = tempfile.mkdtemp(prefix="setu-stream-")
    rows = [
        # (minute, user, type, value) — spans 3 hours, 2 users
        (1, 1, "click", 1),
        (5, 1, "click", 2),
        (61, 1, "view", 3),
        (62, 2, "click", 4),
        (125, 2, "view", 5),
        (126, 1, "click", 6),
    ]
    _mk_events(spark, rows).coalesce(1).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_matches_batch_hourly(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    run_to_memory(
        hourly_event_stats(with_watermark(stream)), "hourly_mem"
    )
    got = {
        (r.win.start.isoformat(), r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM hourly_mem").collect()
    }
    batch = spark.read.parquet(events_dir)
    want = {
        (r.win.start.isoformat(), r.event_type): (r.n_events, r.total_value)
        for r in hourly_event_stats(batch).collect()
    }
    assert got == want
    assert len(got) == 5  # (h0 click), (h1 view), (h1 click), (h2 view), (h2 click)


def test_stream_sessionize_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_to_memory(
        sessionize(with_watermark(stream), gap="30 minutes"), "sess_mem"
    )
    got = sorted(
        (r.user_id, r.first_event.isoformat(), r.n_events)
        for r in spark.sql("SELECT * FROM sess_mem").collect()
    )
    batch = spark.read.parquet(events_dir)
    want = sorted(
        (r.user_id, r.first_event.isoformat(), r.n_events)
        for r in sessionize(batch, gap="30 minutes").collect()
    )
    assert got == want
    # user 1: sessions {min1,5}, {61}, {126} in time order; user 2: {62}, {125}
    assert [g[2] for g in got if g[0] == 1] == [2, 1, 1]


def test_dedup_within_watermark_drops_duplicates(spark):
    d = tempfile.mkdtemp(prefix="setu-stream-dedup-")
    try:
        rows = [
            (1, 1, "click", 1),
            (2, 1, "click", 1),   # duplicate key within watermark
            (3, 2, "click", 2),
            (4, 1, "view", 3),
        ]
        _mk_events(spark, rows).coalesce(1).write.mode("overwrite").parquet(d)
        stream = read_events_stream(spark, d)
        run_to_memory(
            dedup_within_watermark(with_watermark(stream, "1 hour")),
            "dedup_mem",
            output_mode="append",
        )
        out = spark.sql("SELECT user_id, event_type FROM dedup_mem").collect()
        assert sorted((r.user_id, r.event_type) for r in out) == [
            (1, "click"),
            (1, "view"),
            (2, "click"),
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_foreach_batch_sink(spark, events_dir):
    out = tempfile.mkdtemp(prefix="setu-stream-sink-")
    try:
        stream = read_events_stream(spark, events_dir)
        run_foreach_batch_parquet(
            stream.filter(F.col("event_type") == "click"),
            out,
            output_mode="append",
        )
        written = spark.read.parquet(out)
        assert written.count() == 4
        assert "batch_id" in written.columns
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_apply_in_pandas_with_state_matches_batch(spark, events_dir):
    """Custom stateful operator (applyInPandasWithState running per-user
    totals): the last update emitted per user equals the batch aggregate."""
    from setu_spark.streaming.jobs import (
        EVENTS_STREAM_SCHEMA,
        read_events_stream,
        running_user_totals,
        run_to_memory,
    )

    stream = read_events_stream(spark, events_dir)
    run_to_memory(
        running_user_totals(stream), "user_totals_stream", output_mode="update"
    )
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.table("user_totals_stream").collect()
    }

    batch = (
        spark.read.schema(EVENTS_STREAM_SCHEMA)
        .parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total_value"),
        )
    )
    want = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in batch.collect()
    }
    assert got == want


def test_stream_sliding_matches_batch(spark, events_dir):
    """Sliding windows under readStream equal the same aggregation on a
    static read (q76's streaming twin)."""
    from setu_spark.streaming.jobs import (
        read_events_stream,
        run_to_memory,
        sliding_event_counts,
    )

    stream = read_events_stream(spark, events_dir)
    run_to_memory(
        sliding_event_counts(stream), "sliding_stream", output_mode="complete"
    )
    got = {
        (r.win.start, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in spark.table("sliding_stream").collect()
    }
    batch = sliding_event_counts(spark.read.parquet(events_dir))
    want = {
        (r.win.start, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in batch.collect()
    }
    assert got == want


def test_stream_static_join_matches_batch(spark, events_dir):
    from setu_spark.streaming.jobs import enrich_with_user_profile

    batch = spark.read.parquet(events_dir)
    profile = batch.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    stream = read_events_stream(spark, events_dir)
    enriched = enrich_with_user_profile(stream, profile)
    assert enriched.isStreaming
    run_to_memory(enriched, "enriched_mem", output_mode="append")
    got = sorted(
        (r.event_id, r.user_id, r.profile_n_events, r.user_tier)
        for r in spark.sql("SELECT * FROM enriched_mem").collect()
    )
    want = sorted(
        (r.event_id, r.user_id, r.profile_n_events, r.user_tier)
        for r in enrich_with_user_profile(batch, profile).collect()
    )
    assert got == want
    assert len(got) == 6
    # user 1 has 4 events -> heavy; user 2 has 2 -> light
    tiers = {u: t for (_, u, _, t) in got}
    assert tiers == {1: "heavy", 2: "light"}


def test_stream_static_join_unknown_user(spark, events_dir):
    from setu_spark.streaming.jobs import enrich_with_user_profile

    batch = spark.read.parquet(events_dir)
    profile = batch.filter(F.col("user_id") == 1).groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    out = enrich_with_user_profile(batch, profile).collect()
    # user 2's events survive the left join with NULL profile -> light
    u2 = [r for r in out if r.user_id == 2]
    assert len(u2) == 2
    assert all(r.profile_n_events is None and r.user_tier == "light" for r in u2)


def test_stream_stream_join_matches_batch(spark):
    from setu_spark.streaming.jobs import clicks_followed_by_views

    d = tempfile.mkdtemp(prefix="setu-ssj-")
    try:
        rows = [
            (1, 1, "click", 1),   # event 0: paired with view@20
            (20, 1, "view", 2),   # event 1
            (35, 1, "click", 3),  # event 2: paired with view@50
            (50, 1, "view", 4),   # event 3 (49m after click@1 -> out)
            (200, 2, "click", 5), # event 4: view@290 is 90m later -> out
            (290, 2, "view", 6),  # event 5
        ]
        _mk_events(spark, rows).coalesce(1).write.mode("overwrite").parquet(d)
        stream = read_events_stream(spark, d)
        joined = clicks_followed_by_views(stream)
        assert joined.isStreaming
        run_to_memory(joined, "ssj_mem", output_mode="append")
        got = sorted(
            (r.user_id, r.click_id, r.view_id)
            for r in spark.sql("SELECT * FROM ssj_mem").collect()
        )
        batch = spark.read.parquet(d)
        want = sorted(
            (r.user_id, r.click_id, r.view_id)
            for r in clicks_followed_by_views(batch).collect()
        )
        assert got == want
        assert got == [(1, 0, 1), (1, 2, 3)]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_pii_and_quality_gate_matches_batch(spark):
    """The governance tier composes with readStream unchanged: PII
    redaction + the Gopher word-count gate are stateless projections, so
    the streaming micro-batch output must equal the batch output on the
    same files."""
    import tempfile, shutil

    from setu_spark.functions.pii import pii_count, redact_pii

    d = tempfile.mkdtemp(prefix="setu-pii-stream-")
    try:
        docs = spark.createDataFrame(
            [
                (1, "mail me a@b.io about account 1234567"),
                (2, "plain words only here"),
                (3, "host 10.0.0.1 retries"),
            ],
            "doc_id long, text string",
        )
        docs.coalesce(1).write.mode("overwrite").parquet(d)

        def gate(df):
            return df.select(
                "doc_id",
                redact_pii("text").alias("clean_text"),
                (
                    pii_count("text", "email")
                    + pii_count("text", "ipv4")
                    + pii_count("text", "id_num")
                ).alias("pii_hits"),
                (F.size(F.split("text", " ", -1)) >= 4).alias("keeps"),
            )

        batch = {r["doc_id"]: r for r in gate(spark.read.parquet(d)).collect()}
        stream = gate(
            spark.readStream.schema("doc_id long, text string").parquet(d)
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("pii_gate")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = {
            r["doc_id"]: r
            for r in spark.sql("select * from pii_gate").collect()
        }
        assert set(got) == set(batch)
        for k in batch:
            assert got[k] == batch[k]
        assert got[1]["pii_hits"] == 2 and "<EMAIL>" in got[1]["clean_text"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_admission_matches_batch_exact_stage(spark, tmp_path):
    """The streaming ingest gate's exact-dup decisions must equal the
    batch q122 gate's on the same split (q122's near_dup refinement is
    batch-only foreachBatch work, so its near_dup rows appear as
    'novel' here — assert exact-set equality and that refinement is the
    ONLY difference)."""
    import os

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from setu_spark.operators.dedup import CROSS_EXIST_MAX_HEX
    from setu_spark.sources.io import load_table
    from setu_spark.streaming.jobs import admission_decisions, run_to_memory

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    side = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    incoming_dir = str(tmp_path / "incoming")
    docs.filter(side > CROSS_EXIST_MAX_HEX).select(
        "doc_id", "text"
    ).write.parquet(incoming_dir)
    existing_hashes = docs.filter(side <= CROSS_EXIST_MAX_HEX).select(
        F.md5("text").alias("h")
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .parquet(incoming_dir)
    )
    run_to_memory(
        admission_decisions(stream, existing_hashes),
        "admission_stream",
        output_mode="append",
    )
    got = {
        r.doc_id: r.status
        for r in spark.sql("SELECT * FROM admission_stream").collect()
    }
    want = {
        r.doc_id: r.status
        for r in entrymod.queries()["q122_incremental_admission"](
            spark, sf
        ).collect()
    }
    assert set(got) == set(want)
    for doc_id, status in want.items():
        if status == "exact_dup":
            assert got[doc_id] == "exact_dup"
        else:  # batch 'near_dup' refines a stream 'novel'
            assert got[doc_id] == "novel"


def test_stream_ann_admission_matches_batch_gate(spark, tmp_path):
    """The streaming ANN ingest gate (foreachBatch over the SAME
    ann_admission function) must emit exactly the batch q152 gate's
    decisions: admission is per-row independent against the static band
    index, so micro-batching cannot change any row."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from setu_spark.operators.dedup import CROSS_EXIST_MAX_HEX
    from setu_spark.sources.io import load_table
    from setu_spark.streaming.jobs import ann_admission_decisions

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    side = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1)
    incoming_dir = str(tmp_path / "incoming_vecs")
    out_dir = str(tmp_path / "decisions")
    emb.filter(side > CROSS_EXIST_MAX_HEX).select(
        "vec_id", "embedding"
    ).repartition(4).write.parquet(incoming_dir)
    existing = emb.filter(side <= CROSS_EXIST_MAX_HEX).select(
        "vec_id", "embedding"
    )

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .parquet(incoming_dir)
    )
    ann_admission_decisions(stream, existing, out_dir)
    got = {
        r.vec_id: (r.status, r.best_cosine, r.n_candidates)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r.vec_id: (r.status, r.best_cosine, r.n_candidates)
        for r in entrymod.queries()["q152_ann_admission"](
            spark, sf
        ).collect()
    }
    assert got == want
    assert want, "split must leave a non-empty incoming side"


def test_streaming_heavy_hitters_bounded_state_finds_hitters(spark):
    """Misra-Gries frequent-keys monitor: state stays hard-bounded at
    m counters per shard, yet every key whose true count exceeds the
    N_shard/(m+1) undercount bound survives, with estimate <= exact
    (classic MG under-estimation) within that bound."""
    from setu_spark.streaming.jobs import (
        streaming_heavy_hitters,
        run_to_memory,
        read_events_stream,
        with_shard,
        EVENTS_STREAM_SCHEMA,
    )

    # skewed key stream: users 1..3 dominate, a long tail of singletons
    rows = []
    minute = 0
    for uid, n in [(1, 60), (2, 40), (3, 25)] + [(100 + i, 1) for i in range(200)]:
        for _ in range(n):
            rows.append((minute % 180, uid, "click", 1))
            minute += 1
    d = tempfile.mkdtemp(prefix="setu-hh-")
    try:
        _mk_events(spark, rows).coalesce(1).write.mode("overwrite").parquet(d)
        M = 8
        stream = read_events_stream(spark, d)
        run_to_memory(
            streaming_heavy_hitters(stream, m=M),
            "hh_stream",
            output_mode="update",
        )
        emitted = spark.table("hh_stream").toPandas()
        # take the max-seq snapshot per shard (full-snapshot emission)
        last = emitted[
            emitted.seq
            == emitted.groupby("shard").seq.transform("max")
        ]
        last = last[last.key.notna()]  # drop empty-summary sentinels
        # hard state bound per shard
        assert (last.groupby("shard").size() <= M).all()
        batch = with_shard(
            spark.read.schema(EVENTS_STREAM_SCHEMA).parquet(d)
        )
        exact = batch.groupBy("shard", "user_id").count().toPandas()
        shard_n = exact.groupby("shard")["count"].sum()
        est = {
            (r.shard, r.key): r.est_count for r in last.itertuples()
        }
        for r in exact.itertuples():
            bound = shard_n[r.shard] / (M + 1)
            got = est.get((r.shard, r.user_id), 0)
            # MG: estimate never exceeds exact, undercount <= bound
            assert got <= r.count
            assert r.count - got <= bound + 1e-9
            if r.count > bound:  # true heavy hitter must survive
                assert (r.shard, r.user_id) in est, (r.shard, r.user_id)
        # and the three planted hitters are all found
        found_keys = set(last.key)
        assert {1, 2, 3} <= found_keys
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_heavy_hitters_empty_summary_emits_sentinel(spark):
    """The Misra-Gries decrement can empty a shard's summary (m+1 keys
    with equal counts -> pivot equals every value). The operator must
    still emit a row at the new seq — a NULL-key sentinel — so the
    max-seq-snapshot protocol reads 'empty', never a stale snapshot."""
    from setu_spark.streaming.jobs import (
        streaming_heavy_hitters,
        run_to_memory,
        read_events_stream,
    )

    # 40 distinct singleton users: with m=1, every shard that receives
    # >= 2 equal-count keys empties its summary in the decrement
    rows = [(i % 180, 1000 + i, "click", 1) for i in range(40)]
    d = tempfile.mkdtemp(prefix="setu-hh-empty-")
    try:
        _mk_events(spark, rows).coalesce(1).write.mode("overwrite").parquet(d)
        stream = read_events_stream(spark, d)
        run_to_memory(
            streaming_heavy_hitters(stream, m=1),
            "hh_empty_stream",
            output_mode="update",
        )
        emitted = spark.table("hh_empty_stream").toPandas()
        assert len(emitted), "no updates emitted at all"
        last = emitted[
            emitted.seq == emitted.groupby("shard").seq.transform("max")
        ]
        # every shard's final snapshot is observable; empty summaries
        # appear as exactly one NULL-key sentinel row
        empty = last[last.key.isna()]
        nonempty = last[last.key.notna()]
        assert (empty.groupby("shard").size() <= 1).all()
        assert (nonempty.groupby("shard").size() <= 1).all()  # m=1 bound
        # at least one shard must have emptied with 40 singletons / m=1
        assert len(empty) >= 1
    finally:
        shutil.rmtree(d, ignore_errors=True)
