from setu_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    has_partial_aggregate,
    plan_string,
    pushed_filters,
    scan_schemas,
    shuffle_count,
)
