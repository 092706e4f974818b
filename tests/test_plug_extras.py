"""Deployment-plug smoke tests — one per optional extra.

Each real-model seam (README "Deployment plugs") ships a deterministic
stand-in so the engine is fully testable in a bare container; these
tests verify BOTH directions of the seam:

  * always: the stand-in is active and well-formed when the lib is absent;
  * skipped-unless-installed: with the extra present (`pip install
    .[html]` etc.), the seam actually picks up the real implementation —
    so a deployment can run `pytest tests/test_plug_extras.py` to prove
    its install worked.
"""

from __future__ import annotations

import importlib.util

import pandas as pd
import pytest


def _has(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


# ------------------------------------------------------------------ html
def test_extraction_seam_selects_implementation():
    from setu_spark.stages.extraction import _extract_impl, _fallback_extract

    impl = _extract_impl()
    if _has("trafilatura"):
        assert impl is not _fallback_extract
    else:
        assert impl is _fallback_extract
        out = impl("<html><script>x=1</script><p>hello  world</p></html>")
        assert "hello" in out and "x=1" not in out


@pytest.mark.skipif(not _has("trafilatura"), reason="html extra not installed")
def test_trafilatura_really_plugs_in():
    from setu_spark.stages.extraction import _extract_impl, _fallback_extract

    assert _extract_impl() is not _fallback_extract


# ------------------------------------------------------------------- lid
def test_lid_registry_accepts_real_model_shape():
    """The registry contract a fasttext wrapper must satisfy: a zero-arg
    factory returning an object with predict(Series) -> DataFrame(lang,
    prob). Register a conforming double, run the ensemble path, clean up."""
    from setu_spark.stages.lid import DETECTOR_FACTORIES, register_detector

    class _Fake:
        def predict(self, texts: pd.Series) -> pd.DataFrame:
            return pd.DataFrame(
                {"lang": ["xx"] * len(texts), "prob": [0.9] * len(texts)}
            )

    register_detector("_smoke", lambda: _Fake())
    try:
        model = DETECTOR_FACTORIES["_smoke"]()
        out = model.predict(pd.Series(["a", "b"]))
        assert list(out.columns) == ["lang", "prob"] and len(out) == 2
    finally:
        DETECTOR_FACTORIES.pop("_smoke", None)


@pytest.mark.skipif(not _has("fasttext"), reason="lid extra not installed")
def test_fasttext_importable_for_lid_plug():
    import fasttext  # noqa: F401


# ----------------------------------------------------------------- media
def test_media_codec_flag_matches_environment():
    """_real_codec_available reports the environment for this smoke test;
    it is NOT a behavior switch — the deterministic fake kernels stay
    active until a deployment replaces the marked lines (multimodal.py
    resize_images docstring)."""
    from setu_spark.operators.multimodal import _real_codec_available

    assert _real_codec_available() == _has("PIL")


def test_media_operators_run_regardless_of_codec_presence(spark):
    """Installing the media extra must never BREAK the media operators
    (round-5 review: the old guard raised NotImplementedError when PIL
    was importable): the metadata-only frame sampler and the fake-kernel
    resize both run whatever the environment has."""
    from pyspark.sql import functions as F

    from setu_spark.operators.multimodal import frame_sample, resize_images

    media = spark.createDataFrame(
        [(1, "video", 2500, bytearray(b"abc")), (2, "image", 0, bytearray(b"xyz"))],
        "media_id long, kind string, duration_ms long, payload binary",
    )
    offs = frame_sample(media, every_ms=1000).collect()
    assert [r.frame_offset_ms for r in offs] == [0, 1000, 2000]
    out = resize_images(media, 4, 2).collect()
    assert len(out) == 1 and len(out[0].payload) == 8  # image row only


@pytest.mark.skipif(not _has("PIL"), reason="media extra not installed")
def test_pillow_decodes_via_seam():
    import io

    import numpy as np
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.zeros((4, 4, 3), dtype=np.uint8)).save(buf, "PNG")
    assert np.asarray(Image.open(io.BytesIO(buf.getvalue()))).shape == (4, 4, 3)


def test_indicnlp_differential_normalization():
    """Differential check against the real IndicNLP normalizer — the
    library the reference wraps (filters.py:388-446). Gated as an
    extra: this container has no indicnlp; environments that do get a
    direct comparison on the rule subset this repo implements (zero-
    width strip, NBSP fold, nukta decomposition) over Devanagari text."""
    import pytest as _pytest

    indicnlp = _pytest.importorskip("indicnlp")
    import unicodedata

    from indicnlp.normalize.indic_normalize import IndicNormalizerFactory

    from setu_spark.functions.normalize import DevanagariNormalizer

    real = IndicNormalizerFactory().get_normalizer("hi")
    ours = DevanagariNormalizer(form="NFKC")
    vectors = [
        "क‍ख",               # ZWJ strip
        "नम स्ते",           # NBSP fold
        "क़ख़ग़",                  # precomposed nukta consonants
        "ऩऱऴ",     # the three recomposable nukta chars
        "हिन्दी में १२३ शब्द",
    ]
    for v in vectors:
        assert ours.normalize(v) == unicodedata.normalize(
            "NFKC", real.normalize(v)
        ), v
    # round-13: the wide domain too (astral planes, combining marks,
    # ZWJ/ZWNJ conjuncts, decomposed nuktas) — the same alphabet the
    # cross-engine fuzz pins everywhere (test_normalize_properties.py)
    import random

    from test_text_properties import INDIC_CLUSTERS, WIDE_CHARS

    rng = random.Random(1301)
    alpha = WIDE_CHARS + INDIC_CLUSTERS
    for _ in range(400):
        v = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        assert ours.normalize(v) == unicodedata.normalize(
            "NFKC", real.normalize(v)
        ), repr(v)
