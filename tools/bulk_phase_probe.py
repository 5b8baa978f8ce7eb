"""Per-phase profile of the pq_insert_bulk_current_view scenario:
how much of the headline query's time goes to ingest vs the staged
mutation batch vs the current-view read, and how many Spark
jobs/stages/tasks each phase launches (status-store REST API).

Usage: python tools/bulk_phase_probe.py [reps]
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bulk_phase_probe", cpus=cpus, shuffle_partitions=cpus,
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

    # warm engine like bench.py
    spark.range(1_000_000).repartition(4).groupBy((F.col("id") % 7).alias("k")).count().count()
    src0 = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    src0.count()

    for rep in range(reps):
        root = tempfile.mkdtemp(prefix="bulk_probe_")
        db = Database().open(root, spark)
        src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        phases: list[tuple[str, float, int, int]] = []

        def phase(name, fn):
            j0 = {j["jobId"] for j in _jobs()}
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"phase:{name}")
            out = fn()
            dt = time.time() - t0
            jobs = [j for j in _jobs() if j["jobId"] not in j0]
            tasks = sum(j.get("numCompletedTasks", 0) for j in jobs)
            phases.append((name, dt, len(jobs), tasks))
            return out

        t = phase("create+ingest", lambda: _ingest(db, src))
        phase("mutation_batch", lambda: _mutate(t, src))
        phase("view_count", lambda: t.current_view().count())
        total = sum(p[1] for p in phases)
        print(f"rep {rep}: total {total:.2f}s")
        for name, dt, nj, nt in phases:
            print(f"  {name:18s} {dt:6.2f}s  jobs={nj:3d} tasks={nt:4d}")
    return 0


def _ingest(db, src):
    t = db.create_table_typed("orders_a", src.schema, "o_orderkey")
    t.ingest_dataframe(src)
    return t


def _mutate(t, src):
    with t.mutation_batch() as b:
        b.update(
            src.where("o_orderkey % 7 = 0").select(
                "o_orderkey", (F.col("o_totalprice") + 100).alias("o_totalprice")
            )
        )
        b.update(
            lambda v: v.where("o_orderkey % 5 = 0").select(
                "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice")
            )
        )
        b.delete(src.where("o_orderkey % 10 = 3").select("o_orderkey"))


if __name__ == "__main__":
    raise SystemExit(main())
