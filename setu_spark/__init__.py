"""setu_spark — a PySpark-native analytics & corpus-curation engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
corpus-curation pipeline (AI4Bharat/setu, surveyed in SURVEY.md), plus the
analytics / dedup / similarity / streaming surface a large-scale
training-data pipeline needs.

Design stance (SURVEY.md §7):
  * relational core: plain DataFrame ops, explicit schemas, no RDDs;
  * text operators: native ``pyspark.sql.functions`` expressions wherever the
    JVM can express the semantics — Python UDFs only where genuinely needed;
  * every operator declared as a (spark_query, oracle_sql) pair so DuckDB can
    check it (see ``__spark_entry__.py``);
  * scale-first: broadcast small dims, single-shuffle aggregations, LSH
    banding instead of cross joins, AQE for skew.
"""

__version__ = "0.1.0"

from setu_spark.session import get_spark  # noqa: F401
from setu_spark.sources.io import load_table, load_tables  # noqa: F401
