"""Job-level timeline of ONE warm mutation_batch commit: for each
Spark job, its description, duration, task count, and the driver-only
GAP since the previous job finished. Driver gaps are where py4j plan
construction / Catalyst planning / footer reads hide.

Usage: python tools/mb_job_trace.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lineage_store_database_management_system_spark import get_spark  # noqa: E402
from lineage_store_database_management_system_spark.catalog import (  # noqa: E402
    Database,
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="mb_job_trace", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.adaptive.enabled": "true",
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "50000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def _jobs() -> list:
        url = f"{ui}/api/v1/applications/{app_id}/jobs"
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.load(r)

    spark.range(1_000_000).repartition(4).groupBy(
        (F.col("id") % 7).alias("k")
    ).count().count()
    src0 = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    src0.count()

    for rep in range(3):
        root = tempfile.mkdtemp(prefix="mbtrace_")
        db = Database().open(root, spark)
        src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        t = db.create_table_typed("orders_a", src.schema, "o_orderkey")
        t.ingest_dataframe(src)
        j0 = {j["jobId"] for j in _jobs()}
        t0 = time.time()
        with t.mutation_batch() as b:
            b.update(
                src.where("o_orderkey % 7 = 0").select(
                    "o_orderkey",
                    (F.col("o_totalprice") + 100).alias("o_totalprice"),
                )
            )
            b.update(
                lambda v: v.where("o_orderkey % 5 = 0").select(
                    "o_orderkey",
                    (F.col("o_totalprice") * 2).alias("o_totalprice"),
                )
            )
            b.delete(src.where("o_orderkey % 10 = 3").select("o_orderkey"))
        wall = time.time() - t0
        if rep < 1:
            continue  # warm-up rep: skip report
        jobs = sorted(
            (j for j in _jobs() if j["jobId"] not in j0),
            key=lambda j: j["jobId"],
        )
        from datetime import datetime, timezone

        def ts(s):
            # REST timestamps are GMT; parse them as such so gaps stay
            # correct on non-UTC hosts
            return (
                datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")
                .replace(tzinfo=timezone.utc)
                .timestamp()
            )

        print(f"rep {rep}: wall {wall:.3f}s, {len(jobs)} jobs")
        prev_end = t0
        for j in jobs:
            sub = ts(j["submissionTime"])
            end = ts(j["completionTime"])
            gap = sub - prev_end
            print(
                f"  job {j['jobId']:4d} gap={gap*1000:6.0f}ms "
                f"run={(end-sub)*1000:6.0f}ms tasks={j['numCompletedTasks']:3d} "
                f"{(j.get('description') or j.get('name',''))[:80]}"
            )
            prev_end = end
        print(f"  tail gap after last job: {(t0+wall-prev_end)*1000:.0f}ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
