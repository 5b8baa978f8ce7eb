"""Continuous rollup / real-time aggregate (operators/rollup.py)."""

import os

import pytest
from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import rollup


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _direct(events, lo=None):
    out = events.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    if lo:
        out = out.where(F.col("bucket") >= F.lit(lo))
    return {
        (r.bucket, r.event_type): (r.n_events, r.sum_value) for r in out.collect()
    }


def _got(df):
    return {
        (r.bucket, r.event_type): (r.n_events, round(r.sum_value, 2))
        for r in df.collect()
    }


def test_rollup_query_matches_direct_aggregate(spark, events, tmp_path):
    rdir = os.path.join(str(tmp_path), "r")
    rollup.create_rollup(
        events, rdir, "2024-01-15 00:00:00", key_cols=["event_type"]
    )
    got = _got(rollup.rollup_query(spark, rdir, events))
    assert got == _direct(events)


def test_refresh_scans_only_new_range_and_stays_exact(spark, events, tmp_path):
    rdir = os.path.join(str(tmp_path), "r")
    rollup.create_rollup(events, rdir, "2024-01-10 00:00:00", key_cols=["event_type"])
    n1 = rollup.refresh_rollup(events, rdir, "2024-01-20 00:00:00")
    assert n1 > 0
    # refreshing an already-sealed range appends nothing
    assert rollup.refresh_rollup(events, rdir, "2024-01-20 00:00:00") == 0
    assert rollup.rollup_meta(rdir)["sealed_until"] == "2024-01-20 00:00:00"
    got = _got(rollup.rollup_query(spark, rdir, events))
    assert got == _direct(events)


def test_bucket_range_filter_and_partition_layout(spark, events, tmp_path):
    rdir = os.path.join(str(tmp_path), "r")
    rollup.create_rollup(events, rdir, "2024-01-20 00:00:00", key_cols=["event_type"])
    # date-partitioned on disk -> bucket-range queries prune partitions
    days = [d for d in os.listdir(rdir) if d.startswith("bucket_date=")]
    assert len(days) == 19
    got = _got(
        rollup.rollup_query(spark, rdir, events, bucket_lo="2024-01-25 00:00:00")
    )
    assert got == _direct(events, lo="2024-01-25 00:00:00")
    assert all(str(b) >= "2024-01-25" for b, _ in got)


def test_empty_key_cols_and_bad_grain(spark, events, tmp_path):
    rdir = os.path.join(str(tmp_path), "r")
    rollup.create_rollup(events, rdir, "2024-01-15 00:00:00", grain="day")
    got = rollup.rollup_query(spark, rdir, events)
    direct = events.groupBy(F.date_trunc("day", "ts").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    assert {(r.bucket, r.n_events) for r in got.collect()} == {
        (r.bucket, r.n) for r in direct.collect()
    }
    with pytest.raises(ValueError):
        rollup.create_rollup(events, os.path.join(str(tmp_path), "x"),
                             "2024-01-15 00:00:00", grain="fortnight")


def test_hll_sketch_rollup_distinct_over_ranges(spark, events, tmp_path):
    rdir = os.path.join(str(tmp_path), "r")
    rollup.create_rollup(
        events, rdir, "2024-01-15 00:00:00", distinct_col="user_id"
    )
    rollup.refresh_rollup(events, rdir, "2024-01-20 00:00:00")
    rolled = rollup.rollup_query(spark, rdir, events, keep_sketch=True)
    # per-bucket estimate present and near-exact at test cardinality
    per_bucket = rolled.select("bucket", "n_distinct_est").collect()
    assert all(r.n_distinct_est >= 1 for r in per_bucket)
    # re-merge sealed hour sketches to WEEKLY distincts: compare exact
    weekly = rollup.estimate_distinct(
        rolled.withColumn("wk", F.weekofyear("bucket")), ["wk"]
    )
    exact = events.groupBy(F.weekofyear(F.date_trunc("hour", "ts")).alias("wk")).agg(
        F.count_distinct("user_id").alias("exact")
    )
    j = weekly.join(exact, on="wk").collect()
    assert j and all(abs(r.n_distinct_est - r.exact) / r.exact <= 0.02 for r in j)
    # finished counts would overcount: the sum of per-bucket distincts
    # strictly exceeds the merged estimate whenever users span buckets
    summed = (
        rolled.withColumn("wk", F.weekofyear("bucket"))
        .groupBy("wk")
        .agg(F.sum("n_distinct_est").alias("summed"))
    )
    s = {r.wk: r.summed for r in summed.collect()}
    m = {r.wk: r.n_distinct_est for r in j}
    assert all(s[w] > m[w] for w in m)


def test_rollup_without_distinct_col_has_no_sketch(spark, events, tmp_path):
    rdir = os.path.join(str(tmp_path), "r")
    rollup.create_rollup(events, rdir, "2024-01-15 00:00:00")
    rolled = rollup.rollup_query(spark, rdir, events, keep_sketch=True)
    assert "hll_state" not in rolled.columns
    assert "n_distinct_est" not in rolled.columns


def test_stream_maintained_rollup_idempotent_replay(spark, sf_dir, tmp_path):
    from lineage_store_database_management_system_spark.streaming import (
        read_events_stream,
    )

    path = os.path.join(sf_dir, "events.parquet")
    rdir = os.path.join(str(tmp_path), "r")
    stream = read_events_stream(spark, path, max_files_per_trigger=1)
    n1 = rollup.stream_maintain_rollup(stream, rdir, key_cols=["event_type"])
    assert n1 >= 1
    got1 = {
        (r.bucket, r.event_type, r.n_events)
        for r in rollup.streaming_rollup_state(spark, rdir).collect()
    }
    ev = spark.read.parquet(path)
    direct = {
        (r.bucket, r.event_type, r.n)
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got1 == direct

    # simulate a crash-replay of the last micro-batch: re-writing the
    # same batch partition must leave the merged state unchanged
    batches = sorted(os.listdir(os.path.join(rdir, "data")))
    last = batches[-1]
    bucket = F.date_trunc("hour", F.col("ts")).alias("bucket")
    part = ev.groupBy(bucket, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    part.write.mode("overwrite").parquet(os.path.join(rdir, "data", last))
    got2 = {
        (r.bucket, r.event_type, r.n_events)
        for r in rollup.streaming_rollup_state(spark, rdir).collect()
    }
    assert got2 == direct

    # a second drain from the same checkpoint appends nothing new
    stream2 = read_events_stream(spark, path, max_files_per_trigger=1)
    rollup.stream_maintain_rollup(stream2, rdir, key_cols=["event_type"])
    got3 = {
        (r.bucket, r.event_type, r.n_events)
        for r in rollup.streaming_rollup_state(spark, rdir).collect()
    }
    assert got3 == direct


def test_stream_maintained_rollup_with_hll_sketches(spark, sf_dir, tmp_path):
    from lineage_store_database_management_system_spark.streaming import (
        read_events_stream,
    )

    path = os.path.join(sf_dir, "events.parquet")
    rdir = os.path.join(str(tmp_path), "r")
    stream = read_events_stream(spark, path)
    rollup.stream_maintain_rollup(stream, rdir, distinct_col="user_id")
    got = {
        r.bucket: (r.n_events, r.n_distinct_est)
        for r in rollup.streaming_rollup_state(spark, rdir).collect()
    }
    ev = spark.read.parquet(path)
    exact = {
        r.bucket: (r.n, r.d)
        for r in ev.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
            F.count(F.lit(1)).alias("n"), F.count_distinct("user_id").alias("d")
        ).collect()
    }
    assert set(got) == set(exact)
    for b, (n, d) in exact.items():
        gn, gd = got[b]
        assert gn == n
        assert abs(gd - d) / max(d, 1) <= 0.02


def test_patch_rollup_repairs_late_data(spark, events, tmp_path):
    rdir = os.path.join(str(tmp_path), "r")
    rollup.create_rollup(events, rdir, "2024-01-20 00:00:00", key_cols=["event_type"])

    # late events land BEHIND the seal: the rollup is now stale for
    # those buckets and the tail predicate will never see them
    late = events.limit(500).withColumn(
        "ts", F.lit("2024-01-05 10:15:00").cast("timestamp")
    )
    all_events = events.unionByName(late)
    stale = _got(rollup.rollup_query(spark, rdir, all_events))
    assert stale != _direct(all_events)  # the hole is real

    n = rollup.patch_rollup(
        all_events, rdir, "2024-01-05 00:00:00", "2024-01-06 00:00:00"
    )
    assert n > 0
    assert _got(rollup.rollup_query(spark, rdir, all_events)) == _direct(all_events)

    # untouched sealed dates were carried over, not recomputed away
    assert rollup.rollup_meta(rdir)["sealed_until"] == "2024-01-20 00:00:00"

    with pytest.raises(ValueError):
        rollup.patch_rollup(all_events, rdir,
                            "2024-01-19 00:00:00", "2024-01-25 00:00:00")


def test_late_arrival_detection_drives_patch(spark, events, tmp_path):
    rdir = os.path.join(str(tmp_path), "r")
    rollup.create_rollup(events, rdir, "2024-01-20 00:00:00", key_cols=["event_type"])

    on_time = events.limit(10).withColumn(
        "ts", F.lit("2024-01-25 09:00:00").cast("timestamp")
    )
    assert rollup.late_arrival_range(on_time, rdir) is None

    late = events.limit(10).withColumn(
        "ts", F.lit("2024-01-03 23:59:59").cast("timestamp")
    )
    rng = rollup.late_arrival_range(late, rdir)
    assert rng == ("2024-01-03 23:00:00", "2024-01-20 00:00:00")

    # the detected range drives the repair end to end
    all_events = events.unionByName(late)
    rollup.patch_rollup(all_events, rdir, rng[0], rng[1])
    assert _got(rollup.rollup_query(spark, rdir, all_events)) == _direct(all_events)
