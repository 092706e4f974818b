"""Query registry — the declared-query corpus.

Every operator the engine claims (SURVEY.md §2 + the LLM-pipeline surface)
appears in at least one registered query. A registration binds:

  * a name,
  * a Spark builder ``(spark, sf_dir) -> DataFrame``,
  * (usually) an equivalent DuckDB SQL string — the correctness oracle the
    driver hash-compares against at sf0.01.

Column names are part of the contract: the driver sorts columns by name
before hashing, so the Spark builder and the oracle SQL must alias every
computed column identically.

Float discipline (so value-hashes match across engines):
  * sums of doubles go through ``DECIMAL(18,6)`` (exact, order-independent)
    and are cast back to double — see ``dsum`` below;
  * averages over integers are exact-integer-sum / count in both engines;
  * anything intrinsically float (ratios, cosine) is rounded to 6 digits.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def dsum(col: Column, alias: str) -> Column:
    """Order-independent cross-engine double sum: cast each term to
    DECIMAL(18,6) (both engines round the identical IEEE double the same
    way), sum exactly, cast back to double. Spark twin of the oracle's
    ``CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE)``."""
    return F.sum(col.cast("decimal(18,6)")).cast("double").alias(alias)


def DSUM(expr: str, alias: str) -> str:
    """DuckDB-SQL twin of :func:`dsum`."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def r6(col: Column, alias: str) -> Column:
    """Round an intrinsically-float value to 6 digits (cross-engine)."""
    return F.round(col, 6).alias(alias)
