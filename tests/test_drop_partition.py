"""drop_partition: metadata-only partition retention.

Contract: one file-log commit unpublishes the partition (zero data
I/O), the files move to the retained _dropped/ area (directory =
ground truth stays intact for repair's listing resync), tombstone
hazards refuse, refs keep pre-drop states durable, and an interrupted
drop rolls forward from its marker.
"""

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mk(tmp_db, name):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("p", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    return tmp_db.create_table_typed(name, schema, "k", partition_by=["p"])


def _ingest(spark, t, n=300):
    t.ingest_dataframe(
        spark.range(n).select(
            F.col("id").alias("k"),
            F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("p"),
            (F.col("id") * 1.0).alias("v"),
        )
    )


def test_drop_is_metadata_only_and_exact(spark, tmp_db):
    t = _mk(tmp_db, "dp1")
    _ingest(spark, t)
    t.bulk_update(spark.createDataFrame([Row(k=1, v=-1.0)], "k long, v double"))
    # un-folded UPDATE delta in g1's rid ranges: refuse (a dangling
    # update would poison fast_min_max's tail-extremes fold)
    with pytest.raises(ValueError, match="deltas"):
        t.drop_partition("p", "g1")
    t.compact()  # folds the delta; post-TPS tail now empty
    st = t.drop_partition("p", "g1")
    # both the folded pre-compaction base files and the snapshot files
    # carry the p=g1 token, so the stat counts both layers
    assert st["files"] >= 1 and st["rows"] >= 100
    got = sorted(r["k"] for r in t.current_view().collect())
    assert got == sorted(k for k in range(300) if k % 3 != 1)
    # fast_count metadata contract still exact
    assert t.fast_count().first()["cnt"] == 200
    # dropped files moved to the retained area, not deleted
    dropped_root = os.path.join(t.path, "_dropped")
    assert os.path.isdir(dropped_root)
    assert 1 not in got


def test_drop_refuses_unfolded_tombstones_then_allows_after_compact(spark, tmp_db):
    t = _mk(tmp_db, "dp2")
    _ingest(spark, t)
    t.bulk_delete(spark.createDataFrame([Row(k=4)], "k long"))  # k=4 in g1
    with pytest.raises(ValueError, match="tombstones"):
        t.drop_partition("p", "g1")
    t.compact()
    st = t.drop_partition("p", "g1")
    assert st["rows"] >= 99  # snapshot rows for g1 (k=4 already folded out)
    assert t.fast_count().first()["cnt"] == 200


def test_ref_keeps_pre_drop_state_durable(spark, tmp_db):
    t = _mk(tmp_db, "dp3")
    _ingest(spark, t)
    t.create_ref("before-drop")
    t.drop_partition("p", "g0")
    assert t.current_view().count() == 200
    assert t.snapshot_at_ref("before-drop").count() == 300
    t.vacuum_dropped()
    assert t.snapshot_at_ref("before-drop").count() == 300  # hardlinks live on


def test_interrupted_drop_rolls_forward_from_marker(spark, tmp_db):
    t = _mk(tmp_db, "dp4")
    _ingest(spark, t)
    # simulate the crash window: marker written, log NOT yet appended,
    # files NOT yet moved
    token = "p=g2"
    tag = "base"
    live = t.filelog.live(tag)
    es = [e for e in live if token in e["path"].split(os.sep)]
    assert es
    actions = [{"op": "remove", "dir": tag, "paths": [e["path"] for e in es]}]
    moves = [
        [os.path.join(tag, e["path"]), os.path.join("_dropped", "x1", tag, e["path"])]
        for e in es
    ]
    marker = os.path.join(t.path, "_drop_commit_x1.json")
    with open(marker, "w") as f:
        json.dump({"actions": actions, "moves": moves}, f)
    rep = t.repair_staging()
    assert rep["rolled_forward"] >= 1
    assert not os.path.exists(marker)
    assert t.current_view().count() == 200
    assert sorted(set(r["p"] for r in t.current_view().select("p").collect())) == [
        "g0",
        "g1",
    ]


def test_repair_resync_preserves_provenance_and_drop(spark, tmp_db):
    t = _mk(tmp_db, "dp5")
    _ingest(spark, t, 150)
    _ingest2 = spark.range(150, 300).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("p"),
        (F.col("id") * 1.0).alias("v"),
    )
    t.ingest_dataframe(_ingest2)
    before = {
        r["k"]: r["_commit"]
        for r in t.provenance_view().select("k", "_commit").collect()
    }
    assert len(set(before.values())) == 2
    t.drop_partition("p", "g0")
    t.repair_staging()  # listing resync must NOT resurrect g0
    got = sorted(set(r["p"] for r in t.current_view().select("p").collect()))
    assert got == ["g1", "g2"]
    after = {
        r["k"]: r["_commit"]
        for r in t.provenance_view().select("k", "_commit").collect()
    }
    # provenance survives the resync for every surviving row
    assert all(after[k] == before[k] for k in after)
