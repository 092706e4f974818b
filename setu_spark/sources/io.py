"""Sources & sinks.

Covers the reference's scan/sink surface (SURVEY.md §2.1, S1-S10) the
Spark-idiomatic way: schema'd ``spark.read`` for every format, plain and
partitioned parquet sinks, no side-channel writers (the reference's pyarrow
side-writer inside mapPartitions, clean_analysis.py:444-457, becomes a second
filtered DataFrame written through the normal sink).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: Driver-generated analytics tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one testdata table (S2)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_json_corpus(
    spark: SparkSession,
    path_glob: str,
    schema: StructType,
    multiline: bool = True,
    ignore_corrupt: bool = True,
) -> DataFrame:
    """Schema'd JSON scan (S1; reference text_extraction.py:151).

    Always takes an explicit schema — the reference never infers schemas and
    neither do we (SURVEY.md §1.3). At 100 TB an inferred-schema JSON read
    would add a full extra pass over the data.
    """
    return (
        spark.read.format("json")
        .option("multiline", str(multiline).lower())
        .option("ignoreCorruptFiles", str(ignore_corrupt).lower())
        .schema(schema)
        .load(path_glob)
    )


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Stage-checkpoint sink (S6; reference text_extraction.py:166-167)."""
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Partitioned sink (S7; reference lid.py:820-824 writes partitioned by a
    duplicated ``doc_lang_partition`` column so the value also stays in the
    data). We partition directly — readers that need the column get it back
    from partition discovery, enabling partition pruning downstream."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
