"""PII family semantics on planted fixtures (the synthetic tables have
no emails/phones/IPs, so the patterns' real behavior is pinned here),
plus Bloom-filter unit properties for q89's prefilter."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from setu_spark.functions.pii import (
    PII_PATTERNS,
    pii_count,
    pii_count_sql,
    redact_pii,
    redact_pii_sql,
)
from setu_spark.operators.curation import _BLOOM_MULTS, _bloom_build

PLANTED = [
    ("reach me at jane.doe+spam@example.co.uk or on 044-555-123-4567",
     {"email": 1, "phone": 1, "ipv4": 0, "id_num": 0}),
    ("server 10.0.255.7 logged account 9081726354 twice: 10.0.255.7",
     {"email": 0, "phone": 0, "ipv4": 2, "id_num": 1}),
    ("no pii here, just words and a short 1234",
     {"email": 0, "phone": 0, "ipv4": 0, "id_num": 0}),
    ("a@b.io +91 981 234 5678 and id 55555",
     {"email": 1, "phone": 1, "ipv4": 0, "id_num": 1}),
]


@pytest.fixture(scope="module")
def planted_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(PLANTED)], "i long, text string"
    )


def test_pii_counts_planted(planted_df):
    rows = planted_df.select(
        "i", *[pii_count("text", k).alias(k) for k in PII_PATTERNS]
    ).collect()
    for r in sorted(rows, key=lambda r: r["i"]):
        _, expected = PLANTED[r["i"]]
        for kind, n in expected.items():
            assert r[kind] == n, (r["i"], kind, r[kind], n)


def test_redaction_masks_every_match(planted_df):
    red = planted_df.select(redact_pii("text").alias("r")).collect()
    joined = " ".join(r["r"] for r in red)
    # after redaction no pattern may still match its own output
    residue = planted_df.select(
        redact_pii("text").alias("r")
    ).select(
        *[pii_count("r", k).alias(k) for k in PII_PATTERNS]
    ).groupBy().sum().collect()[0]
    assert all(v == 0 for v in residue), residue
    assert "<EMAIL>" in joined and "<IP>" in joined and "<ID>" in joined


def test_pii_sql_twins_match_spark(planted_df):
    """The exact pattern strings must behave identically under DuckDB's
    RE2 — the cross-dialect guarantee the oracle relies on."""
    pdf = planted_df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    exprs = ", ".join(
        f"{pii_count_sql('text', k)} AS {k}" for k in PII_PATTERNS
    )
    duck = con.execute(
        f"SELECT i, {exprs}, {redact_pii_sql('text')} AS red "
        "FROM t ORDER BY i"
    ).df()
    spark_rows = (
        planted_df.select(
            "i",
            *[pii_count("text", k).alias(k) for k in PII_PATTERNS],
            redact_pii("text").alias("red"),
        )
        .orderBy("i")
        .collect()
    )
    for r, (_, drow) in zip(spark_rows, duck.iterrows()):
        for k in PII_PATTERNS:
            assert r[k] == drow[k], (r["i"], k)
        assert r["red"] == drow["red"], (r["i"], r["red"], drow["red"])


def test_pii_twins_wide_unicode_fuzz(spark):
    """Round-13 wide-unicode extension (same class as the U-kernel and
    sentence-split pins): the planted fixtures above are pure ASCII,
    but every PII pattern leans on `\\b` — whose definition differs in
    PRINCIPLE between Java regex (relative to \\w, ASCII by default)
    and DuckDB's RE2 (ASCII word boundary) exactly at non-ASCII-digit
    adjacency (१٣𝟘 touching an IP or ID run), and `[0-9]`-class runs
    touching astral chars sit in the JVM's surrogate-pair territory.
    One deterministic corpus biased toward digits/./@/-/boundary
    probes, both surfaces (counts + redaction) checked against the RE2
    twins in one pass. At introduction this fuzz FOUND that divergence
    (Spark missed the ipv4 in '…1.2.3.4五' that the RE2 oracle
    redacts); the engine now rewrites ``\\b`` to the explicit ASCII
    boundary on the JVM side (pii._jvm_pattern), standardizing on the
    RE2/recall-safe semantics — this test pins exact parity on the
    wide domain."""
    import random

    from test_text_properties import WIDE_CHARS

    rng = random.Random(1303)
    alpha = WIDE_CHARS + list("0123456789.@-+ ") + [
        "१", "٣", "𝟘", "१٣", "a@b.io", "1.2.3.4", "12345",
        "+1 234 567 8901",
    ]
    texts = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    exprs = ", ".join(
        f"{pii_count_sql('text', k)} AS {k}" for k in PII_PATTERNS
    )
    duck = con.execute(
        f"SELECT i, {exprs}, {redact_pii_sql('text')} AS red "
        "FROM t ORDER BY i"
    ).df()
    spark_rows = (
        df.select(
            "i",
            *[pii_count("text", k).alias(k) for k in PII_PATTERNS],
            redact_pii("text").alias("red"),
        )
        .orderBy("i")
        .collect()
    )
    assert len(spark_rows) == len(duck)
    for r, (_, drow) in zip(spark_rows, duck.iterrows()):
        for k in PII_PATTERNS:
            assert r[k] == drow[k], (repr(texts[r["i"]]), k, r[k], drow[k])
        assert r["red"] == drow["red"], (
            repr(texts[r["i"]]), r["red"], drow["red"])


def test_bloom_no_false_negatives_and_bounded_fp():
    rng = np.random.default_rng(7)
    members = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    bits, log2m = _bloom_build(members)

    def probe(keys):
        k = np.asarray(keys, dtype=np.int64).view(np.uint64)
        hit = np.ones(len(k), dtype=bool)
        for mult in _BLOOM_MULTS:
            idx = (k * np.uint64(mult)) >> np.uint64(64 - log2m)
            word = bits[(idx >> np.uint64(6)).astype(np.int64)]
            hit &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
        return hit

    assert probe(members).all()  # no false negatives, ever
    others = rng.integers(-(2**62), 2**62, size=200_000, dtype=np.int64)
    others = np.setdiff1d(others, members)
    fp = probe(others).mean()
    assert fp < 0.01, fp  # ~0.1% design point, order-of-magnitude margin


def test_bloom_empty_eval_set():
    bits, log2m = _bloom_build([])
    assert bits.sum() == 0 and log2m >= 6
