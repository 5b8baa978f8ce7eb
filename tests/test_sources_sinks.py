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

def test_read_binary_assets_to_features(spark, tmp_path):
    """Raw asset files -> binaryFile source -> multimodal feature
    extraction, end to end: stable hash ids, glob pushdown, typed
    metadata, and Arrow-batched feature vectors over real payloads."""
    import os

    from pyspark.sql import functions as F

    from lineage_store_database_management_system_spark.operators import multimodal
    from lineage_store_database_management_system_spark.sources.readers import (
        read_binary_assets,
    )

    adir = tmp_path / "assets"
    adir.mkdir()
    for i in range(4):
        (adir / f"img_{i}.png").write_bytes(bytes([i]) * (16 * (i + 1)))
    (adir / "notes.txt").write_bytes(b"not an image")

    assets = read_binary_assets(spark, str(adir), pattern="*.png")
    rows = assets.collect()
    assert len(rows) == 4  # glob filtered the .txt out
    assert all(r["asset_meta"]["ext"] == "png" for r in rows)
    assert sorted(r["asset_meta"]["n_bytes"] for r in rows) == [16, 32, 48, 64]
    # ids are path-stable across re-reads
    again = {r["asset_id"] for r in read_binary_assets(spark, str(adir), "*.png").collect()}
    assert {r["asset_id"] for r in rows} == again

    feats = multimodal.extract_byte_features(assets, "asset_id").collect()
    assert len(feats) == 4 and all(len(r["features"]) == 16 for r in feats)
    # img_0 is 16 x byte 0x00 -> all mass in histogram bucket 0
    by_id = {r["asset_id"]: r["features"] for r in feats}
    zero_id = [r["asset_id"] for r in rows if r["asset_meta"]["n_bytes"] == 16][0]
    assert abs(by_id[zero_id][0] - 1.0) < 1e-9
