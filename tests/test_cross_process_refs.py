"""Cross-PROCESS ref durability: a genuinely separate python/JVM
process churns the table (mutations + compact + vacuum_tail +
optimize) while THIS session creates and reads refs. The hardlink
design means refs need zero coordination with maintenance — this test
proves it across real processes on a real filesystem.
"""

import os
import subprocess
import sys
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHURN_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from lineage_store_database_management_system_spark import (
    ConcurrentWriteError, LineageTable, get_spark,
)
from pyspark.sql import functions as F

table_path, done_path, rounds = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name="xproc-churn", cpus=2, shuffle_partitions=2)
t = LineageTable.load(spark, table_path)
for i in range(rounds):
    df = spark.range(i * 37, i * 37 + 25).selectExpr(
        "id as k", "cast(id * 2 as double) as v"
    )
    while True:
        try:
            t.bulk_update(df)
            break
        except ConcurrentWriteError:
            t.refresh()
    if i % 3 == 1:
        try:
            t.compact()
            t.vacuum_tail()
        except ConcurrentWriteError:
            t.refresh()
    if i % 4 == 3:
        t.optimize_files(target_bytes=1 << 20)
with open(done_path, "w") as f:
    f.write("done")
print("CHURN-DONE")
"""


def test_refs_stable_under_cross_process_maintenance(spark, tmp_db, tmp_path):
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    t = tmp_db.create_table_typed("xref", schema, "k")
    t.ingest_dataframe(
        spark.range(400).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
    )
    script = tmp_path / "churn.py"
    script.write_text(CHURN_SCRIPT.format(repo=REPO))
    done = tmp_path / "done.txt"
    proc = subprocess.Popen(
        [sys.executable, str(script), t.path, str(done), "8"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
    )
    try:
        pinned = []
        # create refs while the churn process compacts/vacuums/packs
        for i in range(4):
            time.sleep(2.0)
            name = f"live-{i}"
            # a concurrent vacuum may reclaim a file between the log
            # replay and the hardlink — the DOCUMENTED ValueError;
            # refresh onto the newer commit and retry
            for _attempt in range(10):
                t.refresh()
                try:
                    t.create_ref(name)
                    break
                except ValueError as e:
                    if "reclaimed" not in str(e):
                        raise
                    time.sleep(0.3)
            else:
                raise AssertionError("create_ref never won the race")
            truth = sorted(
                (r["k"], r["v"])
                for r in t.snapshot_at_ref(name).select("k", "v").collect()
            )
            pinned.append((name, truth))
        proc.wait(timeout=300)
        assert done.exists(), "churn process did not finish"
        # every ref must still answer EXACTLY its pinned rows after all
        # the churn (vacuum rewrote the tail wholesale several times)
        t.refresh()
        for name, truth in pinned:
            got = sorted(
                (r["k"], r["v"])
                for r in t.snapshot_at_ref(name).select("k", "v").collect()
            )
            assert got == truth, f"ref {name} drifted under churn"
    finally:
        if proc.poll() is None:
            proc.kill()
