"""Privacy operators — PII scan + redaction over tabular text.

q97 runs the :mod:`setu_spark.functions.pii` family over the customer
table (the only testdata table with identifier-shaped strings —
``Customer#000000042``): count matches per kind, redact in place, and
report per-segment totals. On a real corpus the identical expressions
run over ``documents.text`` — the operator is column-agnostic; the
planted-fixture tests in ``tests/test_privacy.py`` prove the
email/phone/ipv4 semantics the synthetic tables cannot exercise.

Reference scope note: setu has no PII pass (its keyword filtering is
filters.py:733-748 NSFW lists); this is a beyond-reference family per
SURVEY.md §2's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from setu_spark.functions.pii import (
    pii_count,
    pii_count_sql,
    redact_pii,
    redact_pii_sql,
)
from setu_spark.registry import register
from setu_spark.sources.io import load_table


@register(
    "q97_pii_redaction",
    oracle=f"""
    WITH scanned AS (
      SELECT c_mktsegment,
             {pii_count_sql('c_name', 'id_num')} AS id_hits,
             {pii_count_sql('c_name', 'email')} AS email_hits,
             {redact_pii_sql('c_name')} AS redacted
      FROM customer
    )
    SELECT c_mktsegment,
           count(*) AS n_rows,
           CAST(sum(id_hits) AS BIGINT) AS id_hits,
           CAST(sum(email_hits) AS BIGINT) AS email_hits,
           count(DISTINCT redacted) AS n_distinct_redacted
    FROM scanned
    GROUP BY c_mktsegment
    """,
)
def q97_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redact over customer names, reported per market
    segment: match counts per kind and the distinct redacted-form count
    (a collapsed-cardinality audit — every ``Customer#NNNN`` folds to
    one ``Customer#<ID>`` form, which is exactly what a privacy audit
    wants to see).

    Scale shape: the scan/redact is a pure per-row codegen projection
    (regexp_count / chained regexp_replace — no UDF, no shuffle); the
    only exchange is the final per-segment aggregate, partial-agg'd
    map-side. At 100 TB the regex pass rides the existing corpus scan
    for free."""
    cust = load_table(spark, sf_dir, "customer")
    scanned = cust.select(
        "c_mktsegment",
        pii_count("c_name", "id_num").alias("id_hits"),
        pii_count("c_name", "email").alias("email_hits"),
        redact_pii("c_name").alias("redacted"),
    )
    return scanned.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_rows"),
        F.sum("id_hits").cast("long").alias("id_hits"),
        F.sum("email_hits").cast("long").alias("email_hits"),
        F.countDistinct("redacted").alias("n_distinct_redacted"),
    )
