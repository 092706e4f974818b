"""Local replay of the driver's Spark-vs-DuckDB comparison.

Mirrors the contract in __spark_entry__.py: register the testdata parquet
files as DuckDB views, run the Spark query and the oracle SQL, canonicalize
(sort columns by name, round floats, sort rows), compare values.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import pandas as pd

from setu_spark.sources.io import TESTDATA_TABLES

ROUND = 6


def register_views(con, sf_dir: str) -> None:
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            df[c] = col.round(ROUND)
        elif col.dtype == object:
            df[c] = col.map(_canon_obj)
    if len(df):
        df = df.sort_values(list(df.columns), na_position="first").reset_index(
            drop=True
        )
    return df


def _canon_obj(v):
    if isinstance(v, Decimal):
        return round(float(v), ROUND)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, ROUND)
    return v


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    a, b = canonicalize(spark_df), canonicalize(oracle_df)
    if sorted(a.columns) != sorted(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            # EXACT equality of the rounded values — the driver hashes the
            # rounded numbers, so an isclose-tolerant local gate would hide
            # exactly the mismatches the driver flags. Queries guarantee
            # this via the decimal-routed sum / deterministic-fold
            # discipline (registry.py docstring).
            ok = [
                (pd.isna(x) and pd.isna(y))
                or (not pd.isna(x) and not pd.isna(y) and x == y)
                for x, y in zip(av.astype("float64"), bv.astype("float64"))
            ]
        else:
            ok = [
                (pd.isna(x) and pd.isna(y)) or x == y
                for x, y in zip(av, bv)
            ]
        bad = [i for i, o in enumerate(ok) if not o]
        if bad:
            i = bad[0]
            problems.append(
                f"column {c}: {len(bad)} mismatched rows, first at {i}: "
                f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
            )
    return problems
