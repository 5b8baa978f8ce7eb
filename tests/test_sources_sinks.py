"""Reader/writer round-trips: parquet (partitioned), csv, json."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.sources.readers import read_table
from lineage_store_database_management_system_spark.sources.writers import write_table


@pytest.fixture(scope="module")
def outdir():
    d = tempfile.mkdtemp(prefix="lss_sinks_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from lineage_store_database_management_system_spark.sources.readers import load_star

    return load_star(spark, sf_dir)["events"]


def test_parquet_partitioned_roundtrip(spark, events, outdir):
    path = os.path.join(outdir, "ev_parquet")
    write_table(events, path, partition_by=["event_type"], target_partitions=2)
    # Hive-style partition dirs exist -> partition pruning works downstream
    assert any(d.startswith("event_type=") for d in os.listdir(path))
    back = read_table(spark, path, fmt="parquet")
    assert back.count() == events.count()
    one_type = back.where(F.col("event_type") == "click")
    # partition filter prunes to the matching directory
    assert "event_type=click" in one_type._jdf.queryExecution().executedPlan().toString() or (
        one_type.count()
        == events.where(F.col("event_type") == "click").count()
    )


def test_csv_roundtrip(spark, events, outdir):
    path = os.path.join(outdir, "ev_csv")
    small = events.select("event_id", "user_id", "event_type").limit(100)
    write_table(small, path, fmt="csv")
    back = read_table(spark, path, fmt="csv", schema=small.schema)
    assert back.count() == 100
    assert dict(back.dtypes) == dict(small.dtypes)


def test_json_roundtrip(spark, events, outdir):
    path = os.path.join(outdir, "ev_json")
    small = events.select("event_id", "event_type", "value").limit(50)
    write_table(small, path, fmt="json")
    back = read_table(spark, path, fmt="json", schema=small.schema)
    assert back.count() == 50
    got = {r["event_id"]: r["value"] for r in back.collect()}
    exp = {r["event_id"]: r["value"] for r in small.collect()}
    assert got == exp


def test_jdbc_partition_options_validated(spark):
    """Partitioned JDBC reads must carry ALL four parallelism options;
    a partial set fails eagerly, before any driver lookup."""
    from lineage_store_database_management_system_spark.sources.readers import (
        read_jdbc,
    )

    with pytest.raises(ValueError, match="ALL of partition_column"):
        read_jdbc(
            spark, "jdbc:postgresql://db/x", "t", partition_column="id"
        )


def test_kafka_wiring_reaches_spark_loader(spark):
    """Without the kafka package on the classpath, load() must fail
    with Spark's missing-data-source error — proving the option
    plumbing is complete and the failure mode is the documented one."""
    from lineage_store_database_management_system_spark.sources.readers import (
        read_kafka_stream,
    )

    with pytest.raises(Exception, match="[Kk]afka"):
        read_kafka_stream(spark, "localhost:9092", "events_topic")
