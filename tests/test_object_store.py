"""S9: object-store path handling — conf wiring only (no cloud here).

The reference fetches from GCS by shelling out to gsutil inside partitions
(text_extraction.py:200-214); the Spark-native form is the Hadoop
connector, which needs only filesystem-impl conf. These tests assert the
conf actually lands in the session's Hadoop configuration.
"""

from __future__ import annotations

from setu_spark.sources.io import (
    OBJECT_STORE_PROFILES,
    configure_object_store,
    path_scheme,
)


def test_path_scheme():
    assert path_scheme("gs://bucket/sf100") == "gs"
    assert path_scheme("s3a://bucket/key") == "s3a"
    assert path_scheme("/root/testdata/sf0.001") is None
    assert path_scheme("relative/dir") is None


def test_gs_profile_applied(spark):
    applied = configure_object_store(spark, "gs")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert applied
    for key, value in applied.items():
        assert hconf.get(key) == value
    assert hconf.get("fs.gs.impl") == (
        "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"
    )


def test_s3a_profile_applied(spark):
    applied = configure_object_store(spark, "s3a")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.impl") == "org.apache.hadoop.fs.s3a.S3AFileSystem"
    assert set(applied) == {
        k.removeprefix("spark.hadoop.") for k in OBJECT_STORE_PROFILES["s3a"]
    }


def test_unknown_scheme_is_noop(spark):
    assert configure_object_store(spark, "hdfs") == {}


def test_object_store_read_end_to_end(spark, tmp_path):
    """S9 exercised for real, not just conf-asserted (round-6 VERDICT
    task 7): a registered scheme profile must carry an ACTUAL
    ``spark.read`` through a non-file filesystem. Hadoop's built-in
    viewfs stands in for the cloud connector — like gs/s3a it is a
    scheme resolved purely from the Hadoop conf our profile applies
    (here a mount-table link), so the whole load_table path runs:
    scheme detection → profile application → filesystem resolution →
    parquet scan."""
    from setu_spark.sources.io import (
        load_table,
        register_object_store_profile,
    )

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], ["doc_id", "text"]
    )
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "warehouse" / "documents.parquet")
    )
    register_object_store_profile(
        "viewfs",
        {
            "spark.hadoop.fs.viewfs.mounttable.unitbucket.link./sf": (
                f"file://{tmp_path}/warehouse"
            ),
        },
    )
    try:
        out = load_table(spark, "viewfs://unitbucket/sf", "documents")
        assert {(r.doc_id, r.text) for r in out.collect()} == {
            (1, "alpha"),
            (2, "beta"),
        }
    finally:
        OBJECT_STORE_PROFILES.pop("viewfs", None)
