"""Listing-vs-manifest scan-planning probe (VERDICT r7/r8 item 1
"done" criterion): at a many-file table — the shape a churn-heavy
100 TB table has between compactions — compare

  A. directory-listing planning (the pre-filelog path): recursive
     os.walk to find files + Spark planning from the directory
  B. manifest-log planning: FileLog replay (cold: read checkpoint +
     entries; warm: cached) + Spark planning from the explicit list
  C. manifest-log planning WITH key-range file skipping

On a local ext4 filesystem the listing itself is cheap (microseconds
per dir); on S3/GCS each LIST is a ~30-100 ms REST round-trip over
1000-key pages, so the honest scale comparison is the NUMBER of
filesystem operations each path performs, which this probe also
reports. Results go to SCALING.md.

Usage: python tools/manifest_probe.py [n_commits] [rows_per_commit]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from lineage_store_database_management_system_spark import Database, get_spark
    from lineage_store_database_management_system_spark.filelog import FileLog

    spark = get_spark(app_name="manifest-probe", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="lss_probe_")
    db = Database().open(root, spark)
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    t = db.create_table_typed("probe", schema, "k")
    t0 = time.time()
    for i in range(n_commits):
        t.ingest_dataframe(
            spark.range(i * rows, (i + 1) * rows).select(
                F.col("id").alias("k"), (F.col("id") * 3).alias("v")
            )
        )
    build_s = time.time() - t0

    # ---- count the live files and walk cost -------------------------
    def walk_files(d):
        out = []
        n_dirs = 0
        for r, _dd, ff in os.walk(d):
            n_dirs += 1
            out += [os.path.join(r, f) for f in ff if f.endswith(".parquet")]
        return out, n_dirs

    t0 = time.time()
    files, n_dirs = walk_files(t.base_dir)
    walk_s = time.time() - t0

    # ---- A: directory-listing planning ------------------------------
    # (simulate the pre-filelog path by hiding the log)
    hidden = t.filelog.root + ".hidden"
    os.rename(t.filelog.root, hidden)
    t.filelog = FileLog(t.path)  # drop the replay cache
    t0 = time.time()
    n_a = len(t.base_df().inputFiles())
    a_s = time.time() - t0
    os.rename(hidden, t.filelog.root)
    t.filelog = FileLog(t.path)

    # ---- B: manifest-log planning (cold, then warm) ------------------
    t0 = time.time()
    n_b = len(t.base_df().inputFiles())
    b_cold_s = time.time() - t0
    n_meta = len(os.listdir(t.filelog.root))
    t0 = time.time()
    n_b2 = len(t.base_df().inputFiles())
    b_warm_s = time.time() - t0

    # ---- C: key-range file skipping ----------------------------------
    lo = (n_commits // 2) * rows + 5
    hi = lo + rows // 2
    t0 = time.time()
    pruned = t.current_view(key_range=(lo, hi))
    n_c = len(pruned.inputFiles())
    c_s = time.time() - t0
    n_rows = pruned.count()

    print(
        f"commits={n_commits} rows/commit={rows} build={build_s:.1f}s\n"
        f"live base files: {len(files)} across {n_dirs} dirs; "
        f"os.walk={walk_s * 1000:.1f}ms\n"
        f"A listing-planned scan:  {n_a} files, {a_s * 1000:.0f} ms "
        f"(>= {n_dirs} LIST calls on object storage)\n"
        f"B manifest-planned scan: {n_b} files, cold {b_cold_s * 1000:.0f} ms "
        f"/ warm {b_warm_s * 1000:.0f} ms "
        f"({n_meta} metadata files read: 1 dir LIST + bounded GETs)\n"
        f"C key-range skip read:   {n_c} of {n_b2} files, "
        f"{c_s * 1000:.0f} ms plan, {n_rows} rows"
    )
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
