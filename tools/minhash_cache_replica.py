"""Replicate the full bench's session history before ds_minhash, then
run minhash 5 reps printing PER-REP work proxies. Pass 'stock' to run
with the r14 _materialize/spread monkeypatched back in."""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from lineage_store_database_management_system_spark import get_spark, workloads
from lineage_store_database_management_system_spark.operators import dedup
import lineage_store_database_management_system_spark.operators._util as U

mode = sys.argv[1] if len(sys.argv) > 1 else "new"
sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="bench_replica", cpus=32, shuffle_partitions=32,
                  extra_conf={"spark.sql.adaptive.enabled": "true",
                              "spark.ui.enabled": "true",
                              "spark.ui.retainedStages": "100000",
                              "spark.ui.retainedJobs": "50000"})
spark.sparkContext.setLogLevel("ERROR")
ui, app_id = spark.sparkContext.uiWebUrl, spark.sparkContext.applicationId


def snap():
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages", timeout=10
    ) as r:
        st = json.load(r)
    o = dict(input=0, shufw=0, cpu=0, tasks=0)
    for s in st:
        o["input"] += s.get("inputBytes", 0)
        o["shufw"] += s.get("shuffleWriteBytes", 0)
        o["cpu"] += s.get("executorCpuTime", 0) // 1_000_000
        o["tasks"] += s.get("numCompleteTasks", 0)
    return o


if mode == "stock":
    def stock_mat(df, sketch_dir=None, slot=None):
        if sketch_dir is not None:
            done = os.path.join(sketch_dir, "_SUCCESS")
            if not os.path.exists(done):
                df.write.mode("overwrite").parquet(sketch_dir)
            return df.sparkSession.read.parquet(sketch_dir)
        df = df.persist()
        df.count()
        return df

    def stock_spread(df, min_parts=None, by=None):
        target = min_parts or U._default_parallelism(df)
        try:
            n = len(df.inputFiles())
        except Exception:
            n = 0
        if n >= target:
            return df
        return df.repartition(target)

    dedup._materialize = stock_mat
    dedup.spread = stock_spread

spark.range(1_000_000).repartition(4).groupBy((F.col("id") % 7).alias("k")).count().count()
spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

# run the 12 headline queries that precede ds_minhash in the bench
PRE = ["pq_insert_bulk_current_view", "pq_select_version_m1", "pq_sum_range",
       "ext_q1_pricing_summary", "ext_q3_shipping_priority",
       "ext_q5_region_revenue", "ext_q8_market_share",
       "ext_q13_customer_distribution", "ext_window_topn_per_customer",
       "ext_events_sessions", "ext_asof_purchase_click", "ds_dedup_exact"]
for name in PRE:
    workloads.QUERIES[name](spark, sf_dir).count()

docsrc = None
for rep in range(5):
    s0, t0 = snap(), time.time()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = dedup.minhash_lsh_candidates(docs, "doc_id", "text").count()
    dt, s1 = time.time() - t0, snap()
    print(f"{mode} rep{rep}: {dt:.3f}s n={n} cpu={s1['cpu']-s0['cpu']} "
          f"tasks={s1['tasks']-s0['tasks']} shufW={s1['shufw']-s0['shufw']} "
          f"input={s1['input']-s0['input']}")
spark.stop()
