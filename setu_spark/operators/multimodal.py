"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference pipeline is text-only; a training-data engine at 100 TB is
not. This module supplies the Spark-side plumbing for media processing:

  * media rows are ``(media_id, kind, payload binary, meta struct)`` — the
    payload is opaque bytes; everything relational (filtering, routing,
    partitioning, joins) happens on the typed columns so parquet scans
    never materialize payloads they don't need (column pruning);
  * decode / feature-extraction run as Arrow-batched ``mapInPandas`` — the
    payload crosses the JVM↔Python boundary once per batch, already
    column-pruned and predicate-filtered;
  * heavy work is partitioned by ``media_id`` hash — embarrassingly
    parallel, no shuffle before or after unless the caller asks for one.

The actual codecs (PIL / torchaudio / ffmpeg) are NOT in this container,
so the decode kernels are deterministic fakes behind an import-try: the
Spark plumbing (schemas, batch iteration, UDF signatures, partitioning) is
real and tested; swapping in a real codec changes only the marked inner
function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from setu_spark.registry import register
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_DIM = 16

DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_std", DoubleType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _real_codec_available() -> bool:
    try:  # pragma: no cover - container has no PIL
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: treat the payload bytes as the
    'pixel' buffer. A real implementation replaces ONLY this function with
    e.g. ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``."""
    return np.frombuffer(payload, dtype=np.uint8)


# ------------------------------------------------------ real codec tier
# Two media formats are decodable with the STANDARD LIBRARY alone, so
# the "decode step" stops being environment-blocked for them: BMP
# (struct-parsed uncompressed 24-bit BI_RGB — the interchange baseline)
# and WAV (PCM via the stdlib ``wave`` module). Everything else goes
# through the PIL seam when installed, else the deterministic fake.
# q90's byte-moment contract is untouched — these decoders serve the
# pixel/sample-level operators (resize codec="auto", feature extract
# deployments), not the byte-stats audit.


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB .bmp → uint8 array [h, w, 3] (RGB).
    Raises ValueError on any other BMP variant — callers fall back."""
    import struct

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        raise ValueError("only uncompressed 24-bit BI_RGB supported")
    flip = h > 0
    h = abs(h)
    row = ((w * 3 + 3) // 4) * 4  # rows pad to 4-byte boundaries
    if data_off + row * h > len(payload):
        raise ValueError("truncated BMP pixel array")
    buf = np.frombuffer(payload, np.uint8, count=row * h, offset=data_off)
    img = buf.reshape(h, row)[:, : w * 3].reshape(h, w, 3)
    if flip:  # positive height = bottom-up row order
        img = img[::-1]
    return img[..., ::-1].copy()  # BGR → RGB


def decode_wav(payload: bytes) -> np.ndarray:
    """PCM .wav → sample array [n_frames, n_channels] (uint8 for 8-bit,
    little-endian signed ints for 16/32-bit), via the stdlib ``wave``
    module. Raises on non-PCM/esoteric widths — callers fall back."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    dtype = {1: np.dtype(np.uint8), 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width {width}")
    arr = np.frombuffer(raw, dtype)
    return arr.reshape(-1, ch)


def sniff_format(payload: bytes) -> str:
    """Magic-byte format sniff: 'bmp' | 'wav' | 'unknown'."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def decode_payload(payload: bytes) -> tuple[str, np.ndarray]:
    """Best-effort real decode: (format, samples). BMP/WAV decode with
    the stdlib; other formats try the PIL seam when installed; anything
    unparseable falls back to ('raw', byte buffer) — same corpora-are-
    dirty stance as the cleaning stages (a payload claiming to be a BMP
    but truncated must not kill the batch)."""
    b = bytes(payload)
    fmt = sniff_format(b)
    try:
        if fmt == "bmp":
            return "bmp", decode_bmp(b)
        if fmt == "wav":
            return "wav", decode_wav(b)
        if _real_codec_available():  # pragma: no cover - no PIL here
            import io

            import PIL.Image

            return "pil", np.asarray(PIL.Image.open(io.BytesIO(b)))
    except Exception:
        pass
    return "raw", _fake_decode(b)


def resize_pixels(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an [h, w, c] (or [h, w]) image to
    [height, width, c] — index arithmetic only, no interpolation libs."""
    h, w = img.shape[0], img.shape[1]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return img[rows][:, cols]


def decode_stats(media: DataFrame) -> DataFrame:
    """Decode each payload and emit per-item stats. Arrow-batched; payloads
    never leave the executor as anything but summary numbers.

    Stats come from EXACT integer moments (Σx, Σx² over the byte
    buffer): mean = Σx/n and std = sqrt(n·Σx² − (Σx)²)/n are then one
    exact-int→double conversion, one sqrt, one division — the identical
    IEEE sequence a SQL replay computes, which is what upgraded q90
    from rows-only to hash-checked (np.mean/np.std's pairwise float
    reductions differ from an engine's streaming variance at ULP level;
    exact moments sidestep the comparison entirely)."""
    import math

    from setu_spark.operators.textstats import _round6

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, means, stds = [], [], []
            for p in pdf["payload"]:
                # NULL payload (e.g. a NULL-text source document) has
                # NO decode stats — NULL out, not zero (an empty buffer
                # is a real observation; a missing one is not). Matches
                # the SQL replay, where len(NULL)/aggregates of NULL
                # stay NULL.
                if p is None:
                    n_bytes.append(None)
                    means.append(None)
                    stds.append(None)
                    continue
                d = _fake_decode(p)
                n = len(d)
                n_bytes.append(n)
                if n == 0:
                    means.append(0.0)
                    stds.append(0.0)
                    continue
                xs = d.astype(np.int64)
                sx = int(xs.sum())
                sx2 = int((xs * xs).sum())
                means.append(_round6(sx / n))
                stds.append(_round6(math.sqrt(n * sx2 - sx * sx) / n))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(n_bytes, dtype="Int64"),
                    "byte_mean": pd.array(means, dtype="Float64"),
                    "byte_std": pd.array(stds, dtype="Float64"),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema=DECODE_SCHEMA
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Fixed-dim feature vector per media item (deterministic fake: md5
    expansion of the payload; a real model replaces the marked lines).
    Output feeds the similarity-search operators
    (setu_spark/operators/similarity.py) unchanged."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # real models would be loaded HERE, once per worker (see
        # setu_spark/stages/lid.py for the cache pattern)
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                # -- fake embedding: md5-seeded unit-ish vector ----------
                h = hashlib.md5(bytes(p)).digest()
                raw = np.frombuffer(
                    (h * ((4 * dim) // len(h) + 1))[: 4 * dim], dtype=np.uint32
                )
                vec = (raw % 1000).astype(np.float32) / 1000.0 - 0.5
                # --------------------------------------------------------
                feats.append(vec.tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats}
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset.
    The relational part (offset generation from typed metadata) is pure
    Spark — only the (stubbed) frame decode would touch the payload."""
    # NB: offsets come from typed METADATA only — no payload decode, so
    # this path is fully real with or without codecs installed. (Earlier
    # rounds raised here when a codec lib was importable; that made
    # `pip install .[media]` break a query whose semantics never needed
    # the codec — round-5 review finding.)
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_offset_ms"),
    )
    return frames


def _synth_media(spark, sf_dir: str) -> DataFrame:
    from setu_spark.sources.io import load_table

    return synth_media_from_documents(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------- q90
@register(
    "q90_media_decode_stats",
    oracle="""
    WITH h AS (
      SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ),
    -- true UTF-8 byte values parsed from the blob's hex dump: the
    -- Spark kernel folds the raw byte buffer, and per-char ascii()
    -- only equals the byte for ASCII input (round-6 ADVICE) — this
    -- form is exact for ANY payload
    b AS (
      SELECT media_id, kind, n_bytes,
             list_transform(generate_series(1, n_bytes),
               i -> 16 * (strpos('0123456789ABCDEF',
                                 hx[2*i-1:2*i-1]) - 1)
                    + (strpos('0123456789ABCDEF', hx[2*i:2*i]) - 1))
               AS bs
      FROM h
    ),
    m AS (
      SELECT media_id, kind, n_bytes,
             CAST(list_sum(bs) AS BIGINT) AS sx,
             CAST(list_sum(list_transform(bs, v -> v * v)) AS BIGINT)
               AS sx2
      FROM b
    )
    SELECT media_id, kind, n_bytes,
           CASE WHEN n_bytes = 0 THEN 0.0
                ELSE round(sx / CAST(n_bytes AS DOUBLE), 6)
           END AS byte_mean,
           CASE WHEN n_bytes = 0 THEN 0.0
                ELSE round(sqrt(CAST(n_bytes * sx2 - sx * sx AS DOUBLE))
                           / n_bytes, 6)
           END AS byte_std
    FROM m
    """,
)
def q90_media_decode_stats(spark, sf_dir: str) -> DataFrame:
    """Binary decode plumbing over synthesized payloads — UPGRADED from
    the rows-only carve-out to a hash-checked row: the deterministic
    fake decode reads the payload as its byte buffer, so the per-item
    stats are exact integer moments the oracle replays byte-for-byte
    (the oracle parses true UTF-8 bytes from ``hex(encode(text))`` —
    exact for ANY payload, not just ASCII). A REAL codec
    (``pip install .[media]``) replaces only ``_fake_decode``; that
    deployment path is inference-only by nature, exactly like q82's
    real-model tier."""
    return decode_stats(_synth_media(spark, sf_dir))


# ---------------------------------------------------------------- q91
@register(
    "q91_video_frame_offsets",
    oracle="""
    SELECT doc_id AS media_id,
           unnest(generate_series(0, greatest(10 * length(text) - 1, 0),
                                  1000)) AS frame_offset_ms
    FROM documents
    WHERE doc_id % 3 = 2
    """,
)
def q91_video_frame_offsets(spark, sf_dir: str) -> DataFrame:
    """Frame-sampling offsets from typed metadata — the relational half of
    video processing (payload untouched, so the parquet scan prunes it)."""
    return frame_sample(_synth_media(spark, sf_dir), every_ms=1000)


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: treat document text bytes as payloads
    so the binary plumbing runs against real testdata."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(48).alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.length("text") * 10).cast("int").alias("duration_ms"),
    )


# ---------------------------------------------------------------- q92
@register(
    "q92_media_bytes_by_kind",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           count(*) AS n_media,
           CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT)
             AS total_payload_bytes,
           max(10 * length(text)) AS max_duration_ms
    FROM documents
    GROUP BY 1
    """,
)
def q92_media_bytes_by_kind(spark, sf_dir: str) -> DataFrame:
    """Relational analytics over the media table's typed columns (kind,
    payload size, duration) — the everyday query class on a multimodal
    corpus. `octet_length(payload)` never decodes; at 100 TB the columnar
    scan reads the byte-length statistics, not the payload bytes."""
    media = _synth_media(spark, sf_dir)
    return media.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum(F.octet_length("payload")).alias("total_payload_bytes"),
        F.max("duration_ms").alias("max_duration_ms"),
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    media: DataFrame, width: int = 32, height: int = 24,
    codec: str = "fake",
) -> DataFrame:
    """Image resize over the binary payload column (the preprocessing step
    every vision-training pipeline runs). Plumbing is real — image rows
    filtered relationally, payload crosses to Python once per Arrow batch,
    output is a new binary column sized for the model.

    ``codec="fake"`` (default): deterministic payload truncation/tiling
    to the target byte count — the corpus payloads may not be decodable
    images at all, so a codec swap is a deliberate deployment change,
    never an import-sniffing side effect (round-5 review stance).
    ``codec="auto"``: REAL decode through :func:`decode_payload`
    (stdlib BMP today, PIL formats when installed) + nearest-neighbor
    resample; payloads that don't parse fall back to the fake kernel —
    dirty corpora must not kill the batch."""
    target = width * height  # fake: 1 byte per pixel

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                b = bytes(p)
                if codec == "auto":
                    fmt, img = decode_payload(b)
                    # Only pixel formats resample as pixels: a WAV sniffed in
                    # the image column must not be "resized" as int16 pixels,
                    # and a decodable-but-empty frame (zero-length axis) would
                    # crash the index arithmetic — both fall back to the fake
                    # kernel, same dirty-corpus stance as decode_payload.
                    if (
                        fmt in ("bmp", "pil")
                        and img.ndim >= 2
                        and img.shape[0] > 0
                        and img.shape[1] > 0
                    ):
                        out.append(
                            resize_pixels(img, width, height)
                            .astype(np.uint8)
                            .tobytes()
                        )
                        continue
                # -- fake resample: tile/truncate payload to target size --
                reps = (target // max(len(b), 1)) + 1
                out.append((b * reps)[:target])
                # ---------------------------------------------------------
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": width,
                    "out_height": height,
                    "payload": out,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(kernel, schema=RESIZE_SCHEMA)
    )


# ---------------------------------------------------------------- q101
#: Fixed media chunk width (test-scale; production uses e.g. 30_000 ms
#: windows for ASR / captioning batches).
CHUNK_MS = 500


@register(
    "q101_media_chunk_windows",
    oracle=f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             10 * length(text) AS duration_ms
      FROM documents
    ),
    chunks AS (
      SELECT media_id, kind, duration_ms,
             unnest(generate_series(0,
               greatest(CAST(floor((duration_ms + {CHUNK_MS} - 1)
                                   / ({CHUNK_MS} * 1.0)) AS INT) - 1, 0)))
               AS chunk_idx
      FROM media WHERE kind <> 'image'
    )
    SELECT media_id, kind, chunk_idx,
           chunk_idx * {CHUNK_MS} AS start_ms,
           least((chunk_idx + 1) * {CHUNK_MS}, duration_ms) AS end_ms
    FROM chunks
    """,
)
def q101_media_chunk_windows(spark, sf_dir: str) -> DataFrame:
    """Chunk audio/video into fixed {CHUNK_MS} ms processing windows from
    typed metadata alone — the batching step before any ASR/captioning
    decode (the decode itself stays in mapInPandas; THIS op never touches
    payload bytes, so the scan prunes the binary column entirely).

    Scale shape: per-row sequence explode sized by duration — output
    rows = sum(ceil(duration/chunk)), no shuffle, no payload I/O. At
    100 TB the chunk table is the join spine that routes payload slices
    to decode workers."""
    media = _synth_media(spark, sf_dir).filter(F.col("kind") != "image")
    last_idx = F.greatest(
        F.floor(
            (F.col("duration_ms") + CHUNK_MS - 1) / (CHUNK_MS * 1.0)
        ).cast("int")
        - 1,
        F.lit(0),
    )
    return media.select(
        "media_id",
        "kind",
        F.explode(F.sequence(F.lit(0), last_idx)).alias("chunk_idx"),
        "duration_ms",
    ).select(
        "media_id",
        "kind",
        "chunk_idx",
        (F.col("chunk_idx") * CHUNK_MS).alias("start_ms"),
        F.least(
            (F.col("chunk_idx") + 1) * CHUNK_MS, F.col("duration_ms")
        ).alias("end_ms"),
    )
