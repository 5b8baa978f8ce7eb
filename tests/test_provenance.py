"""Row-level insert provenance (provenance_view + filelog _idx
stamping): each live row maps to the file-log commit that inserted
it, stable across updates, deletes, compaction, OPTIMIZE packing, and
log checkpoint compaction.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lineage_store_database_management_system_spark import filelog as fl


def _mk(tmp_db, name):
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    return tmp_db.create_table_typed(name, schema, "k")


def _ingest(spark, t, lo, hi):
    t.ingest_dataframe(
        spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
    )


def _batches(t):
    """key -> dense batch number (1-based, by commit order)."""
    rows = t.provenance_view().select("k", "_commit").collect()
    commits = sorted({r["_commit"] for r in rows})
    rank = {c: i + 1 for i, c in enumerate(commits)}
    return {r["k"]: rank[r["_commit"]] for r in rows}


def test_provenance_basic_three_commits(spark, tmp_db):
    t = _mk(tmp_db, "p1")
    for i in range(3):
        _ingest(spark, t, i * 100, (i + 1) * 100)
    b = _batches(t)
    assert all(b[k] == k // 100 + 1 for k in b) and len(b) == 300


def test_provenance_stable_under_update_delete_compact(spark, tmp_db):
    t = _mk(tmp_db, "p2")
    for i in range(3):
        _ingest(spark, t, i * 100, (i + 1) * 100)
    t.bulk_update(spark.createDataFrame([Row(k=150, v=-1.0)], "k long, v double"))
    t.bulk_delete(spark.createDataFrame([Row(k=250)], "k long"))
    t.compact()
    b = _batches(t)
    assert 250 not in b and len(b) == 299
    assert b[150] == 2  # update does not move insert provenance
    assert b[0] == 1 and b[299] == 3


def test_provenance_survives_optimize_packing(spark, tmp_db):
    t = _mk(tmp_db, "p3")
    for i in range(3):
        _ingest(spark, t, i * 100, (i + 1) * 100)
    before = _batches(t)
    st = t.optimize_files(target_bytes=1 << 20)
    # per-commit packing: multi-task commits collapse but commits
    # never merge, so provenance is unchanged
    assert _batches(t) == before, st


def test_provenance_survives_log_checkpoint(spark, tmp_db, monkeypatch):
    monkeypatch.setattr(fl, "CHECKPOINT_EVERY", 4)
    t = _mk(tmp_db, "p4")
    for i in range(6):  # > CHECKPOINT_EVERY commits
        _ingest(spark, t, i * 10, (i + 1) * 10)
    b = _batches(t)
    assert all(b[k] == k // 10 + 1 for k in b) and len(b) == 60


def test_provenance_new_rows_after_restore(spark, tmp_db):
    t = _mk(tmp_db, "p5")
    _ingest(spark, t, 0, 50)
    t.bulk_delete(spark.createDataFrame([Row(k=7)], "k long"))
    _ingest(spark, t, 50, 60)
    b = _batches(t)
    # re-inserted/new rows carry the NEW commit, old rows keep theirs
    assert b[0] == 1 and b[55] == 2 and 7 not in b
