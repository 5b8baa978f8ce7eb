"""Per-file KMV distinct sketches (round 11): metadata-plane
COUNT(DISTINCT col) with the bloom-sidecar coverage discipline and
the drop_partition-style exactness refusal."""

import pytest
from pyspark.sql import functions as F


_SEQ = [0]


def _table(tmp_db, spark, n=5000, dups=5):
    src = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % (n // dups)).alias("v"),
        (F.col("id") % 7).cast("double").alias("w"),
    )
    _SEQ[0] += 1
    t = tmp_db.create_table_typed(f"dsk{_SEQ[0]}", src.schema, "k")
    t.ingest_dataframe(src)
    return t


def test_exact_when_under_k(spark, tmp_db):
    t = _table(tmp_db, spark, n=900, dups=3)  # 300 distinct v
    rep = t.build_distinct_sketches("v", k=1024)
    assert rep["built"] >= 1
    out = t.fast_approx_distinct("v", k=1024)
    assert out["exact"] is True and out["distinct_estimate"] == 300
    assert out["files_covered"] == out["files_total"]


def test_estimate_within_tolerance_over_k(spark, tmp_db):
    t = _table(tmp_db, spark, n=40000, dups=4)  # 10000 distinct v
    t.build_distinct_sketches("v", k=512)
    out = t.fast_approx_distinct("v", k=512)
    assert out["exact"] is False
    # KMV relative error ~ 1/sqrt(k) ~ 4.4%; allow 4 sigma
    assert abs(out["distinct_estimate"] - 10000) / 10000 < 0.18


def test_uncovered_files_scanned_on_demand(spark, tmp_db):
    t = _table(tmp_db, spark, n=900, dups=3)
    t.build_distinct_sketches("v", k=1024)
    # new ingest AFTER the build: 100 new distinct values (300..399)
    extra = spark.range(100).select(
        (F.col("id") + 10_000).alias("k"),
        (F.col("id") + 300).alias("v"),
        F.lit(0.0).alias("w"),
    )
    t.ingest_dataframe(extra)
    out = t.fast_approx_distinct("v", k=1024)
    assert out["exact"] is True and out["distinct_estimate"] == 400
    assert out["files_covered"] < out["files_total"]
    # a rebuild covers them; the answer is unchanged
    t.build_distinct_sketches("v", k=1024)
    out2 = t.fast_approx_distinct("v", k=1024)
    assert out2["distinct_estimate"] == 400
    assert out2["files_covered"] == out2["files_total"]


def test_refuses_on_dirty_tail_then_compact_heals(spark, tmp_db):
    t = _table(tmp_db, spark, n=900, dups=3)
    t.build_distinct_sketches("v", k=1024)
    # update that SETS v: stale old values would over-count
    t.bulk_update(
        spark.range(10).select(F.col("id").alias("k"), F.lit(999).alias("v"))
    )
    with pytest.raises(ValueError, match="compact"):
        t.fast_approx_distinct("v", k=1024)
    # updates to OTHER columns pass
    t2 = _table(tmp_db, spark, n=90, dups=3)
    t2.build_distinct_sketches("v", k=1024)
    t2.bulk_update(
        spark.range(5).select(F.col("id").alias("k"), F.lit(1.5).alias("w"))
    )
    out = t2.fast_approx_distinct("v", k=1024)
    assert out["distinct_estimate"] == 30
    # compact folds the dirty tail; the refusal clears and the answer
    # reflects the post-update value set
    t.compact()
    t.build_distinct_sketches("v", k=1024)
    out = t.fast_approx_distinct("v", k=1024)
    truth = t.current_view().select("v").distinct().count()
    assert out["exact"] is True and out["distinct_estimate"] == truth


def test_refuses_on_tail_delete(spark, tmp_db):
    t = _table(tmp_db, spark, n=300, dups=3)
    t.build_distinct_sketches("v", k=1024)
    t.bulk_delete(spark.range(5).select(F.col("id").alias("k")))
    with pytest.raises(ValueError, match="delete"):
        t.fast_approx_distinct("v", k=1024)
