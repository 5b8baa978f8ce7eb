"""Multi-table atomic commit (r10 VERDICT #8): a transaction spanning
two tables publishes both or neither.

Protocol: each table stages its buffered rows as HIDDEN files
(invisible to scans and to repair's listing resync), ONE shared marker
in the database root is the commit point, then per-table renames + log
appends publish, then the marker deletes. Crash before the marker ->
hidden orphans discard; crash after it (including between the two
per-table publishes — the injection below) -> recovery rolls the
marker forward idempotently, so visibility is all-or-nothing.
"""

import json
import os

from pyspark.sql import types as T

from lineage_store_database_management_system_spark.catalog import Database
from lineage_store_database_management_system_spark.filelog import FileLog
from lineage_store_database_management_system_spark.lineage import (
    commit_tables_atomically,
    recover_txn_markers,
)
from lineage_store_database_management_system_spark.query import Query
from lineage_store_database_management_system_spark.transaction import Transaction


def _db(spark, tmp_path):
    return Database().open(str(tmp_path / "db"), spark)


def _mk(db, name):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.LongType()),
        ]
    )
    t = db.create_table_typed(name, schema, "k")
    t.insert_rows([(i, i * 10) for i in range(5)])
    t.flush()
    return t


def test_transaction_across_two_tables_publishes_both(spark, tmp_path):
    db = _db(spark, tmp_path)
    ta, tb = _mk(db, "a"), _mk(db, "b")
    qa, qb = Query(ta), Query(tb)
    tx = Transaction()
    tx.add_query(qa.insert, ta, 100, 1)
    tx.add_query(qb.insert, tb, 200, 2)
    assert tx.run() is True
    # both visible without any further flush, and durably so
    assert ta.current_view().where("k = 100").count() == 1
    assert tb.current_view().where("k = 200").count() == 1
    assert not ta._pending_base and not tb._pending_base
    # no marker left behind
    assert not [
        n for n in os.listdir(db.path) if n.startswith("_txn_commit_")
    ]


def test_staged_rows_invisible_before_marker_and_discarded_by_repair(
    spark, tmp_path
):
    db = _db(spark, tmp_path)
    ta, tb = _mk(db, "a2"), _mk(db, "b2")
    ta.insert_rows([(100, 1)])
    tb.insert_rows([(200, 2)])
    ia = ta.stage_pending("deadbeef")
    ib = tb.stage_pending("deadbeef")
    assert ia and ib
    # crash BEFORE the marker: nothing is visible anywhere
    assert ta.current_view().where("k = 100").count() == 0
    assert tb.current_view().where("k = 200").count() == 0
    # repair resync must not resurrect the hidden files...
    ta.repair_staging(max_age_s=3600)
    assert ta.current_view().where("k = 100").count() == 0
    # ...and an aged repair discards them
    rep = ta.repair_staging(max_age_s=0.0)
    assert rep["discarded"] >= 1
    assert ta.current_view().count() == 5


def test_crash_between_the_two_publishes_rolls_forward(spark, tmp_path):
    """The VERDICT crash injection: marker written, table A fully
    published, crash before table B — recovery must complete B without
    double-publishing A."""
    db = _db(spark, tmp_path)
    ta, tb = _mk(db, "a3"), _mk(db, "b3")
    ta.insert_rows([(100, 1)])
    tb.insert_rows([(200, 2)])
    ia = ta.stage_pending("feedc0de")
    ib = tb.stage_pending("feedc0de")
    marker = os.path.join(db.path, "_txn_commit_feedc0de.json")
    with open(marker, "w") as f:
        json.dump({"tables": [ia, ib]}, f)
    # manually publish table A only (the crash window)
    for hid_rel, vis_rel in ia["renames"]:
        os.replace(
            os.path.join(ia["path"], hid_rel), os.path.join(ia["path"], vis_rel)
        )
    FileLog(ia["path"]).append(ia["actions"])
    a_files_before = len(FileLog(ia["path"]).live("base"))
    assert ta.current_view().where("k = 100").count() == 1
    assert tb.current_view().where("k = 200").count() == 0  # torn -- pre-recovery
    # recovery (as Database.open / repair_staging would run it)
    assert recover_txn_markers(db.path) == 1
    assert not os.path.exists(marker)
    assert tb.current_view().where("k = 200").count() == 1
    # A was NOT double-published: same live file count
    assert len(FileLog(ia["path"]).live("base")) == a_files_before
    # reopening the database sees the same committed state
    db2 = Database().open(db.path, spark)
    assert db2.get_table("a3").current_view().count() == 6
    assert db2.get_table("b3").current_view().count() == 6


def test_commit_tables_atomically_noop_and_multi_db_guard(spark, tmp_path):
    db = _db(spark, tmp_path)
    ta = _mk(db, "a4")
    assert commit_tables_atomically([ta]) == 0  # nothing pending
    other = Database().open(str(tmp_path / "db_other"), spark)
    tc = _mk(other, "c4")
    ta.insert_rows([(100, 1)])
    tc.insert_rows([(300, 3)])
    import pytest

    with pytest.raises(ValueError, match="one database"):
        commit_tables_atomically([ta, tc])
    # buffers untouched by the refusal
    assert ta._pending_base and tc._pending_base
    ta.flush()
    tc.flush()


def test_concurrent_marker_recovery_applies_once(spark, tmp_path):
    """r11 ADVICE (medium): Database.open's recover_txn_markers can
    race the committing process — the marker exists for the whole
    publish window. Without per-root serialization both executors pass
    the already-published check, the log append lands twice (the CDC
    ledger counts the rows twice since the action JSON carries no
    _idx), and the loser of the final marker unlink crashes open().
    Eight threads rolling the same marker forward must yield exactly
    one True, a single-counted ledger, and zero exceptions."""
    import threading

    from lineage_store_database_management_system_spark.lineage import (
        roll_forward_txn_marker,
    )

    db = _db(spark, tmp_path)
    ta, tb = _mk(db, "a5"), _mk(db, "b5")
    ta.insert_rows([(100, 1)])
    tb.insert_rows([(200, 2)])
    ia = ta.stage_pending("cafe0race")
    ib = tb.stage_pending("cafe0race")
    marker = os.path.join(db.path, "_txn_commit_cafe0race.json")
    with open(marker, "w") as f:
        json.dump({"tables": [ia, ib]}, f)
    ledger_before = FileLog(ia["path"]).added_rows("base")

    results, errs = [], []
    gate = threading.Barrier(8)

    def recover():
        try:
            gate.wait()
            results.append(roll_forward_txn_marker(marker))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=recover) for _ in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    assert sorted(results) == [False] * 7 + [True]
    assert not os.path.exists(marker)
    # published exactly once: the CDC ledger gained ONE commit whose
    # row count equals the staged batch, not a double count
    ledger_after = FileLog(ia["path"]).added_rows("base")
    new = {k: v for k, v in ledger_after.items() if k not in ledger_before}
    assert len(new) == 1 and list(new.values()) == [1], (ledger_before,
                                                        ledger_after)
    assert ta.current_view().where("k = 100").count() == 1
    assert tb.current_view().where("k = 200").count() == 1
    # a second sequential roll-forward of the gone marker is a no-op
    assert roll_forward_txn_marker(marker) is False
    # and database reopen (recovery scan) is clean
    db2 = Database().open(db.path, spark)
    assert db2.get_table("a5").current_view().count() == 6
