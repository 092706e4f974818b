import setu_spark.analytics.queries  # noqa: F401  (registers queries)
