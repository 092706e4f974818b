"""Physical-plan inspection helpers.

The engine's scale properties are plan properties: filters pushed into
scans, dim joins broadcast, aggregation partially applied map-side, no
shuffle where none is needed. These helpers read `explain` output so tests
(and operators during development) can ASSERT those properties instead of
hoping — the `.explain`-and-iterate loop from SURVEY §4, made executable.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE may later
    coalesce partitions but not remove an exchange)."""
    return len(re.findall(r"\bExchange\b(?! SinglePartition)", plan_string(df, "simple")))


def broadcast_join_count(df: DataFrame) -> int:
    return plan_string(df, "simple").count("BroadcastHashJoin")


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every scan, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        out.extend(
            s.strip() for s in m.group(1).split(",") if s.strip()
        )
    return out


def scan_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — what actually gets read off disk
    (column pruning check)."""
    return re.findall(r"ReadSchema: (\S+)", plan_string(df))


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when the plan contains a map-side partial aggregation."""
    return "partial_" in plan_string(df)


def exchange_widths(df: DataFrame) -> list[int]:
    """Column arity of every shuffle exchange's input — the width audit.

    A plan can look cheap at test scale while shipping a pathologically
    WIDE exchange that grows linearly with rows (the q28 lesson: mixing
    countDistinct with approx_count_distinct carried the HLL++ buffer
    as ~200 long columns per row through the first shuffle — 3s at
    sf0.1, ~195s at 60M rows). Formatted explain lists each node's
    ``Input [N]``; this returns N for every Exchange node so audits can
    flag outliers mechanically."""
    plan = plan_string(df, "formatted")
    widths: list[int] = []
    # formatted sections: "(k) Exchange[ ...]\nInput [N]: [...]"
    for m in re.finditer(
        r"\(\d+\) Exchange[^\n]*\nInput \[(\d+)\]", plan
    ):
        widths.append(int(m.group(1)))
    return widths


def has_expand(df: DataFrame) -> bool:
    """True when the plan contains an Expand node (multi-distinct
    aggregates, rollup/cube/grouping-sets) — each Expand multiplies the
    pre-shuffle row count by its projection count, so its presence on a
    hot path deserves a width/row-volume look."""
    return bool(re.search(r"\(\d+\) Expand\b|\bExpand\b", plan_string(df, "simple")))
