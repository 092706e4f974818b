"""Sink/scan roundtrip queries — driver hash checks for the IO surface.

S6 (parquet sink), S7 (partitioned sink), S+ (ORC sink/scan, JSONL
sink, schema'd JSON scan S1) previously had only local tests
(test_cli.py roundtrips); these queries make each path part of the
driver's correctness gate: write the corpus through the sink under
test into a fresh temp dir, read it back through the matching scan,
aggregate — the oracle runs the same aggregate on the ORIGINAL table,
so any loss/corruption/type-drift introduced by the sink→scan cycle
hash-mismatches.

Scale note: the sinks themselves are the production code paths
(write_partitioned backs the CLI's hive layout; write_jsonl the
interchange export). The roundtrip queries write oracle-SF data only —
the driver runs them at sf0.01; the aggregate shape afterward is one
map-combined shuffle to |groups| rows.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from setu_spark.registry import DSUM, dsum, register
from setu_spark.sources.io import (
    load_table,
    read_csv_corpus,
    read_json_corpus,
    read_orc,
    write_jsonl,
    write_orc,
    write_partitioned,
)


# ---------------------------------------------------------------- q117
@register(
    "q117_partitioned_sink_roundtrip",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def q117_partitioned_sink_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """S7 partitioned parquet sink + hive partition-discovery scan,
    driver-checked (reference lid.py:820-824 writes its corpus
    partitioned by language): documents → ``partitionBy(lang)`` parquet →
    read back (``lang`` now comes from directory discovery, not data
    pages) → per-lang aggregate. Any partition/value loss in the cycle —
    including the partition column's string round-trip — breaks the
    hash against the direct aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="setu-rt-part-")
    write_partitioned(docs, out, ["lang"])
    # read back with the WRITER's schema: a 0-row partitioned write
    # produces no data files, and schema inference dies on the empty
    # directory (UNABLE_TO_INFER_SCHEMA) — the roundtrip owns the
    # schema, so passing it is both the empty-corpus fix and a type-
    # fidelity hardening (partition-column type inference could
    # otherwise re-type a numeric-looking lang value)
    back = spark.read.schema(docs.schema).parquet(out)
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


# ---------------------------------------------------------------- q118
@register(
    "q118_orc_sink_roundtrip",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           {DSUM('o_totalprice', 'total_price')}
    FROM orders GROUP BY o_orderpriority
    """,
)
def q118_orc_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S+ ORC sink + scan driver-checked: orders → ORC → read back →
    per-priority aggregate with the decimal-routed double sum. ORC's
    type system round-trips Spark's exactly (both columnar,
    both zlib/zstd framed); a dtype or precision drift in the cycle
    would surface as a DSUM hash mismatch."""
    orders = load_table(spark, sf_dir, "orders")
    out = tempfile.mkdtemp(prefix="setu-rt-orc-")
    write_orc(orders, out)
    back = read_orc(spark, out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice"), "total_price"),
    )


# ---------------------------------------------------------------- q119
_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("text", StringType()),
    ]
)


@register(
    "q119_jsonl_scan_roundtrip",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_len,
           count(DISTINCT doc_id) AS n_ids
    FROM documents GROUP BY lang
    """,
)
def q119_jsonl_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 schema'd JSON scan + JSONL sink driver-checked: documents →
    gzipped JSON-lines (the interchange format every LLM-data toolchain
    reads) → ``read_json_corpus`` with an explicit schema (never
    inferred — SURVEY §1.3; an inference pass would re-read 100 TB) →
    per-lang aggregate over ids and codepoint lengths. JSON escaping of
    newlines/quotes inside ``text`` must round-trip exactly or total_len
    and n_ids break the hash."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    out = tempfile.mkdtemp(prefix="setu-rt-jsonl-")
    write_jsonl(docs, out)
    back = read_json_corpus(
        spark, os.path.join(out, "*.json.gz"), _JSONL_SCHEMA, multiline=False
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_len"),
        F.countDistinct("doc_id").alias("n_ids"),
    )


# ---------------------------------------------------------------- q120
_CSV_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampNTZType()),
    ]
)


@register(
    "q120_csv_scan_roundtrip",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           count(DISTINCT o_orderkey) AS n_keys,
           {DSUM('o_totalprice', 'total_price')},
           strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
           strftime(max(o_orderdate), '%Y-%m-%d') AS last_date
    FROM orders GROUP BY o_orderstatus
    """,
)
def q120_csv_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S+ CSV sink + schema'd scan driver-checked: a newline-free orders
    projection → headered CSV → ``read_csv_corpus`` with an explicit
    schema (no inference — a 100 TB inference pass is a full extra read)
    → per-status aggregate. The cycle exercises the lossy-prone CSV
    edges: doubles round-trip via shortest-repr Double.toString, NTZ
    timestamps via ISO strings, and the DSUM/min/max aggregate catches drift
    against the parquet-direct oracle."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    out = tempfile.mkdtemp(prefix="setu-rt-csv-")
    orders.write.mode("overwrite").option("header", "true").csv(out)
    back = read_csv_corpus(spark, os.path.join(out, "*.csv"), _CSV_SCHEMA)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        dsum(F.col("o_totalprice"), "total_price"),
        # repo date convention (q03/q14): format to yyyy-MM-dd strings —
        # raw timestamp/date columns hit pandas dtype splits in the compare
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_date"),
    )
