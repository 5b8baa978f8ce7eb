"""Scale probe: metadata-only COUNT vs full current-view count.

Builds an orders lineage table at the given sf dir the hard way —
several ingest commits (so the file log holds many files), bulk
deletes on both sides of a compaction, a fresh post-watermark ingest —
then times

  (a) ``LineageTable.fast_count()``      (file-log row sums + tail agg)
  (b) ``current_view().count()``         (the full base/tail fold)
  (c) ``FileLog.state_at`` replay        (commit-travel planning cost)

The claim under test is the 100 TB shape: (a) must be O(tail), flat in
base size — its only Spark job aggregates the tail — while (b) scales
with the base. Results go to SCALING.md.

Usage: python tools/fastcount_probe.py [sf_dir]
       (default <repo>/.localdata/sf1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, ".localdata", "sf1"
    )
    if not os.path.isdir(sf_dir):
        print(f"sf dir missing: {sf_dir}")
        return 2

    from pyspark.sql import functions as F

    from lineage_store_database_management_system_spark import Database, get_spark

    spark = get_spark(
        app_name="fastcount-probe",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n_src = src.count()

    root = tempfile.mkdtemp(prefix="lss_fcprobe_")
    db = Database().open(root, spark)
    t = db.create_table_typed("orders", src.schema, "o_orderkey")
    t0 = time.perf_counter()
    mx = src.agg(F.max("o_orderkey")).first()[0]
    step = mx // 8 + 1
    for i in range(8):
        t.ingest_dataframe(
            src.where(
                (F.col("o_orderkey") >= i * step)
                & (F.col("o_orderkey") < (i + 1) * step)
            )
        )
    t.bulk_delete(src.where("o_orderkey % 10 = 3").select("o_orderkey"))
    t.compact()
    shifted = src.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(mx + 1))
    t.ingest_dataframe(shifted)
    t.bulk_delete(shifted.where("o_orderkey % 9 = 1").select("o_orderkey"))
    build_s = time.perf_counter() - t0

    def med(fn, reps=3):
        xs = []
        for _ in range(reps):
            a = time.perf_counter()
            fn()
            xs.append(time.perf_counter() - a)
        return round(statistics.median(xs), 3)

    got = t.fast_count().collect()[0]["cnt"]
    want = t.current_view().count()
    assert got == want, f"fast_count {got} != full count {want}"

    t_fast = med(lambda: t.fast_count().collect())
    t_full = med(lambda: t.current_view().count())
    lo, hi = t.filelog.replayable_range()
    t_replay = med(lambda: t.filelog.state_at(lo), reps=5)
    n_files = len(t.filelog.live(t._log_tag(t.base_dir)) or [])

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "src_rows": n_src,
                "live_rows": got,
                "base_files": n_files,
                "build_s": round(build_s, 1),
                "fast_count_s": t_fast,
                "full_count_s": t_full,
                "speedup": round(t_full / t_fast, 1) if t_fast else None,
                "state_at_replay_s": t_replay,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
