"""SparkSession factory with scale-oriented defaults.

The reference pipeline tunes its sessions through spark-submit conf
(reference examples/commands.md:33-41): AQE on, Kryo, 512 shuffle
partitions, broadcast joins *disabled*. We keep AQE but deliberately
re-enable broadcast joins (SURVEY.md §4) — the dimension tables of both the
corpus pipeline (wordlists, language maps) and the analytics surface
(region/nation/supplier) are small and broadcasting them removes whole
shuffle stages.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf applied to sessions we create ourselves (tests, bench, CLI).
#: Chosen for local[32] testing but sized so the same code runs unchanged on
#: a multi-executor cluster: AQE coalesces the 2×cores shuffle partitions at
#: small SF and splits skewed partitions at large SF.
DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dim tables (region/nation/supplier/wordlists) must broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.parquet.compression.codec": "snappy",
    # local[32]: shuffle width ~= cores; AQE coalesces down when tiny.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.driver.maxResultSize": "4g",
    # local mode = ONE JVM for driver + all 32 worker threads. The PySpark
    # default heap (1g) makes every wide op GC-bound or OOM at ~100k docs;
    # size it like the executor fleet it stands in for. (Applied at JVM
    # launch — only effective for the process's first session, which is why
    # it lives here in the factory and not in per-query code.)
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    "spark.ui.enabled": "false",
    # Events testdata has shipped as both TIMESTAMP(NANOS) and
    # TIMESTAMP(MICROS) across generations. Spark 4 refuses to read the
    # NANOS form as a timestamp; with this conf it loads as int64 ns (a
    # no-op on µs-typed files), and load_events dispatches on the loaded
    # dtype either way — see operators/events.py.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ensure_sql_conf(spark: SparkSession, key: str, value: str) -> None:
    """Set a runtime SQL conf only if it differs — for sessions built by a
    foreign harness (the driver's correctness runner) that didn't go through
    :func:`get_spark`. No-op on our own sessions."""
    try:
        current = spark.conf.get(key)
    except Exception:
        current = None
    if current != value:
        spark.conf.set(key, value)


def get_spark(
    app_name: str = "setu-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
