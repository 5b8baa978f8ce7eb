"""Named refs (tags): pinned, vacuum-proof commit snapshots.

The durability contract: a ref's answer is stable across EVERY
maintenance operation — vacuum_tail's directory rewrite,
optimize_files' small-file repacking, compact()'s snapshot publish,
and file-log checkpoint compaction — because the ref hardlinks its
file set (same inodes, zero copy).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mk(tmp_db, name):
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    return tmp_db.create_table_typed(name, schema, "k")


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_ref_roundtrip_and_listing(spark, tmp_db):
    t = _mk(tmp_db, "r1")
    t.ingest_dataframe(
        spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    )
    info = t.create_ref("v1.0")
    assert info["files"] >= 1 and info["bytes"] > 0
    truth = _rows(t.current_view())
    t.bulk_update(spark.createDataFrame([Row(k=5, v=-1.0)], "k long, v double"))
    t.bulk_delete(spark.createDataFrame([Row(k=7)], "k long"))
    assert _rows(t.snapshot_at_ref("v1.0")) == truth
    names = [r["name"] for r in t.list_refs()]
    assert names == ["v1.0"]
    t.drop_ref("v1.0")
    assert t.list_refs() == []
    with pytest.raises(KeyError):
        t.snapshot_at_ref("v1.0")


def test_ref_survives_all_maintenance(spark, tmp_db):
    t = _mk(tmp_db, "r2")
    for i in range(4):
        t.ingest_dataframe(
            spark.range(i * 100, (i + 1) * 100).select(
                F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
            )
        )
    t.bulk_update(spark.createDataFrame([Row(k=3, v=333.0)], "k long, v double"))
    t.create_ref("pinned")
    truth = _rows(t.snapshot_at_ref("pinned"))
    # mutate + every maintenance op that destroys/rewrites files
    t.bulk_delete(spark.createDataFrame([Row(k=3)], "k long"))
    t.compact()
    assert t.vacuum_tail() >= 0  # rewrites the tail dir wholesale
    t.optimize_files(target_bytes=1 << 20)  # unlinks small base files
    t.bulk_update(spark.createDataFrame([Row(k=9, v=9.9)], "k long, v double"))
    assert _rows(t.snapshot_at_ref("pinned")) == truth
    # raw commit travel may legitimately fail here (files reclaimed);
    # the ref is the durable path
    cur = {k: v for k, v in _rows(t.current_view())}
    assert 3 not in cur and cur[9] == 9.9


def test_ref_at_older_commit(spark, tmp_db):
    t = _mk(tmp_db, "r3")
    t.ingest_dataframe(
        spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    )
    idx1 = t.filelog.replayable_range()[1]
    t.bulk_update(spark.createDataFrame([Row(k=1, v=100.0)], "k long, v double"))
    t.create_ref("old", log_idx=idx1)
    got = {k: v for k, v in _rows(t.snapshot_at_ref("old"))}
    assert got[1] == 1.0  # pre-update state
    assert {k: v for k, v in _rows(t.current_view())}[1] == 100.0


def test_ref_name_validation_and_collision(spark, tmp_db):
    t = _mk(tmp_db, "r4")
    t.ingest_dataframe(
        spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    )
    t.create_ref("ok-1")
    with pytest.raises(ValueError):
        t.create_ref("ok-1")  # duplicate
    for bad in ("", "../x", "a/b", ".hidden", "sp ace"):
        with pytest.raises(ValueError):
            t.create_ref(bad)


def test_ref_survives_reopen(spark, tmp_db):
    from lineage_store_database_management_system_spark import Database

    t = _mk(tmp_db, "r5")
    t.ingest_dataframe(
        spark.range(20).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    )
    t.create_ref("keep")
    truth = _rows(t.snapshot_at_ref("keep"))
    t.bulk_delete(spark.createDataFrame([Row(k=1)], "k long"))
    db2 = Database().open(tmp_db.path, spark)
    t2 = db2.get_table("r5")
    assert [r["name"] for r in t2.list_refs()] == ["keep"]
    assert _rows(t2.snapshot_at_ref("keep")) == truth


def test_ref_after_compact_and_vacuum_is_exact(spark, tmp_db):
    """The round-9 soak catch: once vacuum_tail drops pre-TPS deltas,
    base+tail alone no longer reconstruct state — a ref pinned AFTER
    compact+vacuum must fold snapshot-aware or it silently resurrects
    pre-TPS tombstoned rows."""
    t = _mk(tmp_db, "r6")
    t.ingest_dataframe(
        spark.range(500).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
    )
    t.bulk_update(spark.createDataFrame([Row(k=10, v=-5.0)], "k long, v double"))
    t.bulk_delete(
        spark.createDataFrame([Row(k=k) for k in range(0, 500, 50)], "k long")
    )
    t.compact()
    assert t.vacuum_tail() > 0  # pre-TPS deltas really gone
    t.bulk_update(spark.createDataFrame([Row(k=11, v=7.0)], "k long, v double"))
    t.create_ref("post-vacuum")
    truth = _rows(t.current_view())
    # later churn must not affect the ref
    t.bulk_delete(spark.createDataFrame([Row(k=99)], "k long"))
    got = _rows(t.snapshot_at_ref("post-vacuum"))
    assert got == truth
    assert len(got) == 490  # the 10 tombstones must NOT resurrect
    vals = dict(got)
    assert vals[10] == -5.0 and vals[11] == 7.0


def test_commit_travel_after_compact_and_vacuum_is_exact(spark, tmp_db):
    """snapshot_at_commit twin of the soak catch: the newest commit
    after compact+vacuum folds snapshot-aware via the logged setmeta
    watermarks."""
    t = _mk(tmp_db, "r7")
    t.ingest_dataframe(
        spark.range(300).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
    )
    t.bulk_delete(spark.createDataFrame([Row(k=7), Row(k=8)], "k long"))
    t.compact()
    assert t.vacuum_tail() > 0
    t.bulk_update(spark.createDataFrame([Row(k=9, v=90.0)], "k long, v double"))
    idx = t.filelog.replayable_range()[1]
    truth = _rows(t.current_view())
    got = _rows(t.snapshot_at_commit(idx))
    assert got == truth and len(got) == 298
    assert dict(got)[9] == 90.0
