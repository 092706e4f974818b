"""Deterministic 60-bit hashes shared between Spark and the DuckDB oracle.

MinHash / SimHash / LSH need a hash function that is (a) stable across runs
and engines, (b) uniformly distributed, (c) cheap and JVM-side. Spark's
``xxhash64``/``hash`` have no DuckDB twin, so the whole dedup family would be
uncheckable. ``md5`` exists with identical output in both engines, so we use
its first 15 hex digits (60 bits — comfortably inside a signed int64) as the
shared hash primitive:

  Spark : CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
  DuckDB: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)

Salting (for the k independent MinHash permutations) is done by prefixing
the input: ``md5(concat('<salt>|', x))``.

md5 is ~2-3× slower than xxhash64 but stays inside whole-stage codegen; for
production (non-oracle) paths callers can swap ``F.xxhash64`` in via the
``fast=True`` flag without touching callers' logic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = 15  # 60 bits < 63 → always non-negative in a signed int64


def hash64(col: Column | str, salt: str | None = None, fast: bool = False) -> Column:
    """60-bit stable hash of a string column (oracle-matchable)."""
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(f"{salt}|"), c)
    if fast:
        return F.xxhash64(c)
    return F.conv(F.substring(F.md5(c), 1, HEX_DIGITS), 16, 10).cast("bigint")


def hash64_sql(expr: str, salt: str | None = None) -> str:
    """The DuckDB-SQL twin of :func:`hash64` for oracle queries."""
    if salt is not None:
        expr = f"concat('{salt}|', {expr})"
    return f"CAST('0x' || substr(md5({expr}), 1, {HEX_DIGITS}) AS BIGINT)"
