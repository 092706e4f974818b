"""Sequence packing (curation.pack_sequences): packing invariants."""

from __future__ import annotations

import __spark_entry__ as entrymod
from setu_spark.operators.curation import SEQ_LEN, pack_sequences
from setu_spark.sources.io import load_table
from tests.conftest import SF_ORACLE


def _rows(spark):
    return entrymod.queries()["q94_sequence_packing"](
        spark, SF_ORACLE
    ).collect()


def test_every_doc_packed_exactly_once(spark):
    rows = _rows(spark)
    doc_ids = [r.doc_id for r in rows]
    n_docs = load_table(spark, SF_ORACLE, "documents").count()
    assert len(doc_ids) == len(set(doc_ids)) == n_docs


def test_no_sequence_over_budget(spark):
    fills: dict[int, int] = {}
    for r in _rows(spark):
        fills[r.seq_id] = fills.get(r.seq_id, 0) + r.words_count
    assert fills
    assert max(fills.values()) <= SEQ_LEN


def test_utilization_floor(spark):
    fills: dict[int, int] = {}
    for r in _rows(spark):
        fills[r.seq_id] = fills.get(r.seq_id, 0) + r.words_count
    # greedy next-fit on ~54-word docs: average fill must beat 50%
    assert sum(fills.values()) / (len(fills) * SEQ_LEN) > 0.5


def test_packing_deterministic(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    a = sorted((r.doc_id, r.seq_id) for r in pack_sequences(docs).collect())
    b = sorted((r.doc_id, r.seq_id) for r in pack_sequences(docs).collect())
    assert a == b
