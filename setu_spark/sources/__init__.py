from setu_spark.sources.io import (  # noqa: F401
    TESTDATA_TABLES,
    load_table,
    load_tables,
    read_json_corpus,
    write_parquet,
    write_partitioned,
)
