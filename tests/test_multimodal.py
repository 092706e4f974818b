"""Multimodal plumbing: binary columns, Arrow batch shapes, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from setu_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_stats,
    extract_features,
    frame_sample,
    synth_media_from_documents,
)


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma"), (2, "delta epsilon zeta"), (5, "x")],
        ["doc_id", "text"],
    )
    return synth_media_from_documents(docs)


def test_media_schema(media):
    kinds = {r.media_id: r.kind for r in media.collect()}
    assert kinds == {0: "image", 1: "audio", 2: "video", 5: "video"}
    [r] = media.filter(F.col("media_id") == 0).collect()
    assert bytes(r.payload) == b"alpha beta"


def test_decode_stats(media):
    out = {r.media_id: r for r in decode_stats(media).collect()}
    assert out[0].n_bytes == len(b"alpha beta")
    assert 0 < out[0].byte_mean < 255
    assert out[1].kind == "audio"


def test_decode_stats_oracle_parity_non_ascii(spark):
    """The q90 oracle must replay the Spark kernel's byte moments for
    NON-ASCII payloads too (round-6 ADVICE: the old per-char ascii()
    form silently assumed ASCII; the hex(encode(...)) form is exact for
    any UTF-8 text)."""
    import duckdb
    import pandas as pd

    from setu_spark.registry import ORACLES

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["plain ascii", "héllo wörld", "नमस्ते दुनिया", ""],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = {
        r.media_id: (r.n_bytes, r.byte_mean, r.byte_std)
        for r in con.execute(ORACLES["q90_media_decode_stats"]).df().itertuples()
    }
    docs = spark.createDataFrame(pdf)
    got = {
        r.media_id: (r.n_bytes, r.byte_mean, r.byte_std)
        for r in decode_stats(synth_media_from_documents(docs)).collect()
    }
    assert got == want
    # sanity: the non-ASCII rows really exercise multi-byte chars
    assert got[1][0] > len("héllo wörld")


def test_extract_features_deterministic(spark, media):
    a = {r.media_id: r.feature for r in extract_features(media).collect()}
    b = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())
    # distinct payloads → distinct features
    assert a[0] != a[1]


def test_frame_sample_offsets(media):
    rows = frame_sample(media, every_ms=50).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.frame_offset_ms)
    # only video rows sampled
    assert set(by_id) == {2, 5}
    # "delta epsilon zeta" = 18 chars → 180ms → offsets 0,50,100,150
    assert sorted(by_id[2]) == [0, 50, 100, 150]
    # "x" → 10ms → single frame at 0
    assert sorted(by_id[5]) == [0]


def test_features_feed_similarity(spark, media):
    """Extracted features work with the vector ops (cosine) unchanged."""
    from setu_spark.operators.similarity import cosine

    feats = extract_features(media)
    a = feats.alias("a")
    b = feats.alias("b")
    sims = (
        a.crossJoin(b)
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("ida"),
            F.col("b.media_id").alias("idb"),
            cosine(F.col("a.feature"), F.col("b.feature")).alias("sim"),
        )
        .collect()
    )
    assert len(sims) == 6
    assert all(-1.0 <= r.sim <= 1.0 for r in sims)


def test_resize_images_shapes_and_determinism(spark, media):
    from setu_spark.operators.multimodal import resize_images

    out = resize_images(media, width=8, height=4).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images and n_images > 0
    assert all(len(r.payload) == 8 * 4 for r in out)
    again = {r.media_id: bytes(r.payload) for r in resize_images(media, 8, 4).collect()}
    assert {r.media_id: bytes(r.payload) for r in out} == again
