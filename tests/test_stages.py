"""Pipeline-stage tests on synthetic fixtures (FIXTURES.md F1-F8 shapes).

The fixtures deliberately include what the oracle corpus can't: HTML/JS
blocks, symbol-heavy chunks, digit-only chunks, repeated chunks, terminal
'...' lines, NULL timestamps, duplicate doc_ids."""

from __future__ import annotations

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from setu_spark.stages.analysis import AnalysisConfig, analyse
from setu_spark.stages.cleaning import CleanConfig, clean_documents
from setu_spark.stages.extraction import run_extraction
from setu_spark.stages.flagging import (
    FlagConfig,
    filter_documents,
    flag_documents,
    remove_documents,
)
from setu_spark.stages.lid import attach_lid, predict_lid


# ----------------------------------------------------------- extraction

def test_extraction_stage(spark):
    d = tempfile.mkdtemp(prefix="setu-crawl-")
    try:
        recs = [
            {"doc_id": "a", "url": "u1", "source": "s", "timestamp": "t1",
             "html": "<html><script>var x=1;</script><p>Hello <b>world</b></p></html>"},
            {"doc_id": "a", "url": "u1", "source": "s", "timestamp": "t1",
             "html": "<p>dup doc_id</p>"},                      # dropped: dup id
            {"doc_id": "b", "url": "u2", "source": "s", "timestamp": None,
             "html": "<p>no timestamp</p>"},                    # dropped: null ts
            {"doc_id": "c", "url": "u3", "source": "s", "timestamp": "t3",
             "html": "<style>p{}</style>"},                     # empty extraction
            {"doc_id": "d", "url": "u4", "source": "s", "timestamp": "t4",
             "html": "plain text, no markup at all"},           # is-HTML gate
            {"doc_id": "e", "url": "u5", "source": "s", "timestamp": "t5",
             "html": "</p> lone end tag is not a Tag"},         # gate: end tag only
        ]
        with open(f"{d}/part-0.json", "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
        out = run_extraction(spark, f"{d}/*.json")
        rows = {r.doc_id: r for r in out.collect()}
        assert set(rows) == {"a", "c", "d", "e"}
        assert rows["a"].text == "Hello world"
        assert rows["a"].successful_extraction == "true"
        assert rows["c"].text is None
        assert rows["c"].successful_extraction == "false"
        # the reference's is-HTML gate (text_extraction.py:555): rows
        # with no parseable opening tag never reach the extractor
        for d_id in ("d", "e"):
            assert rows[d_id].text is None
            assert rows[d_id].successful_extraction == "false"
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ----------------------------------------------------------- cleaning

@pytest.fixture()
def dirty_docs(spark):
    return spark.createDataFrame(
        [
            # chunk repeated under same url (boilerplate) + good content
            (1, "u1", "nav menu\nreal content one.\n12345\n@#$%^&*"),
            (2, "u1", "nav menu\nreal content two."),
            (3, "u2", "only numbers here\n999"),
            (4, "u2", "@#$% @#$% @#$%"),   # all chunks rejected → NULL text
        ],
        ["doc_id", "url", "text"],
    )


def test_clean_documents(spark, dirty_docs):
    cfg = CleanConfig(symbol_threshold=0.5, repeat_key="url")
    cleaned, rejected = clean_documents(dirty_docs, cfg)
    by_id = {r.doc_id: r for r in cleaned.collect()}
    # "nav menu" repeats under u1 → removed from both docs
    assert by_id[1].text == "real content one."
    assert by_id[2].text == "real content two."
    # digit-only and symbol-heavy chunks dropped
    assert by_id[3].text == "only numbers here"
    # every chunk rejected → NULL text survives via left join (J4)
    assert by_id[4].text is None
    reasons = {
        (r.doc_id, r.reject_reason) for r in rejected.collect()
    }
    assert (1, "num_or_punc_only") in reasons
    assert (1, "symbol_heavy") in reasons
    assert (4, "symbol_heavy") in reasons


# ----------------------------------------------------------- analysis+flags

def test_analyse_flag_filter_remove(spark):
    docs = spark.createDataFrame(
        [
            (1, "one line only."),
            (2, "line one is fine.\nline two is fine.\nline three ok."),
            (3, "bad bad bad.\nbad words here."),
        ],
        ["doc_id", "text"],
    )
    profiled = analyse(
        docs, AnalysisConfig(line_sep="\n", flagged_words=("bad",))
    )
    prof = {r.doc_id: r for r in profiled.collect()}
    assert prof[2].lines_count == 3
    # "bad." (trailing punct) is a distinct token — only bare "bad" counts
    assert prof[3].flagged_words_count == 3
    # line length is in WORDS (reference utilities.py:327-329); the
    # char-based stat lives under mean_line_chars
    assert prof[1].mean_line_length == 3.0
    assert prof[1].mean_line_chars == 14.0

    cfg = FlagConfig(
        min_line_count=1, flagged_word_ratio_threshold=0.5,
        min_mean_line_len=2.0,
    )
    flagged = flag_documents(profiled, cfg)
    fl = {r.doc_id: r for r in flagged.collect()}
    assert fl[1].has_less_lines is True
    assert fl[3].is_flagged_heavy is True
    assert fl[2].has_less_lines is False

    survivors = filter_documents(flagged, cfg)
    assert [r.doc_id for r in survivors.collect()] == [2]

    kept = remove_documents(docs, survivors)
    assert [r.doc_id for r in kept.collect()] == [2]


# ----------------------------------------------------------- lid

def test_lid_heuristic_and_join(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog is here"),
            (2, "der hund und die katze das ist gut und schön"),
            (3, "le chat et le chien est la et les oiseaux"),
            (4, "xyzzy plugh qwerty"),
        ],
        ["doc_id", "text"],
    )
    preds = {r.doc_id: r for r in predict_lid(docs).collect()}
    assert preds[1].pred_lang == "en"
    assert preds[2].pred_lang == "de"
    assert preds[3].pred_lang == "fr"
    assert preds[4].pred_lang == "und"

    with_lang = attach_lid(docs)
    assert "doc_lang" in with_lang.columns
    assert with_lang.count() == 4
    # threshold abstention (intended semantics, not the reference defect)
    strict = {
        r.doc_id: r.pred_lang
        for r in predict_lid(docs, probability_threshold=0.9).collect()
    }
    assert set(strict.values()) == {"und"}


def test_lid_ensemble_vote(spark):
    """U19 intended vote semantics: majority of non-abstaining detectors,
    deterministic tie-break, threshold abstention, per-model label map."""
    import pandas as pd

    from setu_spark.stages.lid import register_detector

    class _Fixed:
        def __init__(self, lang, prob):
            self.lang, self.prob = lang, prob

        def predict(self, texts):
            return pd.DataFrame(
                {"lang": [self.lang] * len(texts),
                 "prob": [self.prob] * len(texts)}
            )

    register_detector("fake_de_strong", lambda: _Fixed("de", 0.95))
    register_detector("fake_de_weak", lambda: _Fixed("de", 0.10))
    register_detector("fake_fr_weak", lambda: _Fixed("fr", 0.10))

    docs = spark.createDataFrame(
        [(1, "the cat and the dog is here on the mat")], ["doc_id", "text"]
    )
    # two de votes vs one en (stopword) -> majority de
    row = predict_lid(
        docs, detectors=("stopword", "fake_de_strong", "fake_de_weak")
    ).collect()[0]
    assert row.pred_lang == "de"
    assert abs(row.lid_prob - 0.95) < 1e-6  # strongest of winner's voters
    assert row.model_langs["stopword"] == "en"
    assert row.model_langs["fake_de_strong"] == "de"

    # threshold: weak voters abstain, the strong one decides alone
    row = predict_lid(
        docs,
        detectors=("fake_de_weak", "fake_fr_weak", "fake_de_strong"),
        probability_threshold=0.5,
    ).collect()[0]
    assert row.pred_lang == "de"

    # 1-1 tie breaks lang-ascending (deterministic, not input-order)
    row = predict_lid(
        docs, detectors=("fake_fr_weak", "fake_de_weak")
    ).collect()[0]
    assert row.pred_lang == "de"


def test_lid_charngram_detector(spark):
    docs = spark.createDataFrame(
        [
            (1, "the weather there was something they thought"),
            (2, "durch schnee und eis chillen die eichhörnchen"),
        ],
        ["doc_id", "text"],
    )
    preds = {
        r.doc_id: r.pred_lang
        for r in predict_lid(docs, detectors=("charngram",)).collect()
    }
    assert preds[1] == "en"
    assert preds[2] == "de"


def test_lid_real_model_file_path(spark):
    """U19's real-model tier, executed not stubbed (round-6 VERDICT task
    6): the vendored few-KB fasttext-architecture artifact loads FROM
    DISK on the Python workers through the registered factory, batch-
    predicts, joins the majority vote, and abstains below the
    probability threshold — the full deployment path of a production
    lid.bin, at fixture scale."""
    import os

    from setu_spark.stages.lid import TINY_LID_PATH

    # the artifact is a real committed file, not a test-generated temp
    assert os.path.isfile(TINY_LID_PATH)
    assert 0 < os.path.getsize(TINY_LID_PATH) < 64 * 1024
    # and it must live INSIDE the installed package tree so
    # [tool.setuptools.package-data] setu_spark = ["data/**/*"] ships it
    # on pip install (a repo-root data/ path only exists in a checkout)
    import setu_spark

    pkg_dir = os.path.dirname(os.path.abspath(setu_spark.__file__))
    assert os.path.commonpath(
        [pkg_dir, os.path.abspath(TINY_LID_PATH)]
    ) == pkg_dir

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog is in the house"),
            (2, "der hund und die katze ist nicht da"),
            (3, "zzz qqq xxx"),  # no vocabulary hits -> uniform softmax
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r
        for r in predict_lid(docs, detectors=("tinylid",)).collect()
    }
    assert rows[1].pred_lang == "en" and rows[1].lid_prob > 0.9
    assert rows[2].pred_lang == "de" and rows[2].lid_prob > 0.9
    # softmax always emits a label; with no threshold it votes...
    assert rows[3].lid_prob == 0.25  # uniform over the 4 labels
    # ...and with one above that uniform floor, it ABSTAINS -> und
    strict = {
        r.doc_id: r
        for r in predict_lid(
            docs, detectors=("tinylid",), probability_threshold=0.5
        ).collect()
    }
    assert strict[3].pred_lang == "und" and strict[3].lid_prob == 0.0
    assert strict[1].pred_lang == "en"

    # ensemble: the file model votes alongside the heuristic tiers and
    # the per-model label map records its prediction
    row = predict_lid(
        docs.filter("doc_id = 1"),
        detectors=("tinylid", "stopword", "charngram"),
    ).collect()[0]
    assert row.pred_lang == "en"
    assert row.model_langs["tinylid"] == "en"


def test_entry_module_imports_without_session():
    """The driver imports __spark_entry__ before (or without) creating a
    SparkSession; module import must never require an active session
    (regression: DDL-string pandas_udf return types parse through the
    session at decoration time)."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-c", "import __spark_entry__"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_double_space_trim_quirk(spark):
    """U18 (reference utilities.py:124-127): with the quirk flag on, a
    chunk starting with exactly two spaces loses one on reassembly; off
    (default), chunks join verbatim."""
    from setu_spark.stages.cleaning import CleanConfig, clean_documents

    docs = spark.createDataFrame(
        [(1, "plain\n  indented\n   deep")], ["doc_id", "text"]
    )
    base = CleanConfig(
        chunk_sep="\n", repeated_chunk_filter=False, repeat_key="doc_id",
        remove_only_num_or_punc_chunks=False, chunk_length_filter=False,
    )
    import dataclasses

    off, _ = clean_documents(docs, base)
    on, _ = clean_documents(
        docs, dataclasses.replace(base, double_space_trim_quirk=True)
    )
    assert off.head().text == "plain\n  indented\n   deep"
    assert on.head().text == "plain\n indented\n  deep"


def test_lid_reference_vote_compat_makes_threshold_noop(spark):
    """SURVEY §4.1: the reference's hard_vote counts a vote in BOTH
    branches of the probability check (lid.py:575-578), so the
    threshold is a no-op there. reference_vote_compat=True replays
    that defect exactly; the default replays the intended semantics."""
    import pandas as pd

    from setu_spark.stages.lid import predict_lid, register_detector

    class _Fixed:
        def __init__(self, lang, prob):
            self.lang, self.prob = lang, prob

        def predict(self, texts):
            return pd.DataFrame(
                {"lang": [self.lang] * len(texts),
                 "prob": [self.prob] * len(texts)}
            )

    register_detector("cmp_hi_de", lambda: _Fixed("de", 0.95))
    register_detector("cmp_lo_fr1", lambda: _Fixed("fr", 0.10))
    register_detector("cmp_lo_fr2", lambda: _Fixed("fr", 0.12))

    docs = spark.createDataFrame([(1, "xyz")], ["doc_id", "text"])
    dets = ("cmp_hi_de", "cmp_lo_fr1", "cmp_lo_fr2")
    # intended: the two weak fr voters abstain below 0.5 -> de wins
    intended = predict_lid(
        docs, detectors=dets, probability_threshold=0.5
    ).collect()[0]
    assert intended.pred_lang == "de"
    # compat: threshold is a no-op, both fr votes count -> fr majority
    compat = predict_lid(
        docs,
        detectors=dets,
        probability_threshold=0.5,
        reference_vote_compat=True,
    ).collect()[0]
    assert compat.pred_lang == "fr"
    assert abs(compat.lid_prob - 0.12) < 1e-6
