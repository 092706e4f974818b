"""Skew utilities + physical-plan regression guards.

The plan assertions pin the performance-critical properties the engine
relies on at scale: filters reaching the parquet scan, dimension joins
broadcasting, partial aggregation before shuffles. They read the plan
string — cheap, deterministic, no data needed beyond the scan."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from setu_spark.operators.skew import salted_aggregate, salted_join
from tests.conftest import SF_ORACLE

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


# ------------------------------------------------------------------ skew

def test_salted_aggregate_matches_plain(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    got = {
        r.k: (r.sum_v, r.count_v, r.max_v)
        for r in salted_aggregate(
            df,
            ["k"],
            {
                "sum_v": F.sum("v"),
                "count_v": F.count("v"),
                "max_v": F.max("v"),
            },
            buckets=8,
        ).collect()
    }
    want = {
        r.k: (r.sum_v, r.count_v, r.max_v)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("sum_v"),
            F.count("v").alias("count_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    big = spark.range(0, 5000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(5)], ["k", "name"]
    )
    got = salted_join(big, small, ["k"], buckets=4).groupBy("name").count()
    want = big.join(small, "k").groupBy("name").count()
    assert {(r.name, r["count"]) for r in got.collect()} == {
        (r.name, r["count"]) for r in want.collect()
    }


# ------------------------------------------------------------------ plans

def _plan(spark, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        QUERIES[name](spark, SF_ORACLE).explain(mode="formatted")
    return buf.getvalue()


def test_q06_filters_pushed_to_scan(spark):
    plan = _plan(spark, "q06_forecast_revenue")
    assert "PushedFilters: [" in plan
    # the shipdate/discount/quantity predicates must reach the scan,
    # not sit in a post-scan Filter only
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln
    ]
    assert any("GreaterThan" in ln or "LessThan" in ln for ln in pushed), pushed


def test_q05_dims_broadcast(spark):
    plan = _plan(spark, "q05_region_nation_revenue")
    assert "BroadcastHashJoin" in plan
    # region/nation must never arrive via a shuffle join
    assert plan.count("BroadcastHashJoin") >= 3


def test_q01_partial_aggregation(spark):
    plan = _plan(spark, "q01_pricing_summary")
    # partial_ aggregate functions before the exchange = map-side combine
    assert "partial_" in plan


def test_q30_no_shuffle(spark):
    plan = _plan(spark, "q30_doc_word_stats")
    assert "Exchange" not in plan  # per-row profile: narrow pipeline only


def test_q51_scan_prunes_columns(spark):
    plan = _plan(spark, "q51_minhash_signatures")
    # signature scan must read only (doc_id, text), never lang/source
    scan_lines = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ]
    assert scan_lines and all(
        "lang" not in ln and "source" not in ln for ln in scan_lines
    ), scan_lines
