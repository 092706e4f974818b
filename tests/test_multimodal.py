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


def _make_bmp(w, h, pixel_fn):
    """Uncompressed 24-bit bottom-up BI_RGB bitmap, built by hand."""
    import struct

    row = ((w * 3 + 3) // 4) * 4
    px = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up row order
        line = bytearray()
        for x in range(w):
            r, g, b = pixel_fn(x, y)
            line += bytes((b, g, r))  # BGR on disk
        line += b"\x00" * (row - len(line))
        px += line
    header = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0
    )
    return bytes(header + info + px)


def _make_wav(samples, width=2, ch=1, rate=8000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        fmt = {1: "B", 2: "<h", 4: "<i"}[width]
        wf.writeframes(b"".join(struct.pack(fmt, s) for s in samples))
    return buf.getvalue()


def test_stdlib_codecs_decode_real_formats():
    """The decode step is REAL for stdlib-decodable formats (BMP via
    struct, PCM WAV via wave) — not a deterministic fake: pixel and
    sample values round-trip exactly."""
    import numpy as np

    from setu_spark.operators.multimodal import (
        decode_bmp,
        decode_payload,
        decode_wav,
        sniff_format,
    )

    bmp = _make_bmp(3, 2, lambda x, y: (x * 10, y * 20, x + y))
    assert sniff_format(bmp) == "bmp"
    img = decode_bmp(bmp)
    assert img.shape == (2, 3, 3)
    assert tuple(img[1, 2]) == (20, 20, 3)  # (r, g, b) at x=2, y=1
    assert tuple(img[0, 0]) == (0, 0, 0)

    wav = _make_wav([0, 1000, -1000, 32767], width=2)
    assert sniff_format(wav) == "wav"
    arr = decode_wav(wav)
    assert arr.shape == (4, 1)
    assert arr.ravel().tolist() == [0, 1000, -1000, 32767]

    # dirty payloads fall back to the raw buffer, never raise
    fmt, raw = decode_payload(b"BM this is not a real bitmap")
    assert fmt == "raw" and len(raw) == 28
    fmt, raw = decode_payload("plain text".encode())
    assert fmt == "raw"


def test_resize_images_auto_codec_real_bmp(spark):
    """codec='auto' really decodes a BMP payload and nearest-neighbor
    resamples its pixels; undecodable payloads in the same batch fall
    back to the fake kernel instead of failing."""
    import numpy as np

    from setu_spark.operators.multimodal import resize_images

    bmp = _make_bmp(4, 4, lambda x, y: ((x // 2) * 255, 0, (y // 2) * 255))
    rows = [
        (0, "image", bytearray(bmp)),
        (3, "image", bytearray(b"not an image at all")),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {
        r.media_id: bytes(r.payload)
        for r in resize_images(media, width=2, height=2, codec="auto").collect()
    }
    img = np.frombuffer(out[0], np.uint8).reshape(2, 2, 3)
    # 2x2 nearest-neighbor of the quadrant pattern keeps the corners
    assert tuple(img[0, 0]) == (0, 0, 0)
    assert tuple(img[0, 1]) == (255, 0, 0)
    assert tuple(img[1, 1]) == (255, 0, 255)
    # fallback row: fake tiling to 2*2 bytes (1 byte/pixel fake contract)
    assert out[3] == b"not "


def test_resize_images_auto_codec_non_pixel_payloads_fall_back(spark):
    """codec='auto' must route DECODABLE-but-non-pixel payloads to the
    fake kernel, not the pixel resampler: a zero-frame WAV decodes to a
    (0, 1) array that would crash the index arithmetic, and a non-empty
    WAV sniffed in the image column would otherwise be 'resized' as
    int16 pixels with wraparound. Dirty corpora must not kill the batch."""
    from setu_spark.operators.multimodal import resize_images

    empty_wav = _make_wav([], width=2)  # valid RIFF/WAVE, zero frames
    tone_wav = _make_wav([0, 1000, -1000, 32767], width=2)
    rows = [
        (0, "image", bytearray(empty_wav)),
        (1, "image", bytearray(tone_wav)),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {
        r.media_id: bytes(r.payload)
        for r in resize_images(media, width=2, height=2, codec="auto").collect()
    }
    # both rows survive and take the fake tile/truncate path (4 bytes)
    assert out[0] == bytes(empty_wav)[:4]
    assert out[1] == bytes(tone_wav)[:4]


def test_resize_images_shapes_and_determinism(spark, media):
    from setu_spark.operators.multimodal import resize_images

    out = resize_images(media, width=8, height=4).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images and n_images > 0
    assert all(len(r.payload) == 8 * 4 for r in out)
    again = {r.media_id: bytes(r.payload) for r in resize_images(media, 8, 4).collect()}
    assert {r.media_id: bytes(r.payload) for r in out} == again
