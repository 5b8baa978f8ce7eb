"""Is the engine-wide InferFiltersFromGenerate exclusion neutral on
CHEAP explodes? (VERDICT r14 #6 / r14 What's-wrong #2.)

The rule synthesizes `size(e)>0 AND isnotnull(e)` below every
explode(e); for the text operators e is an expensive shingle chain
(excluded for 2x CPU reasons, r14 #5), but for cheap explodes the
inferred filter could prune empty-array rows BEFORE a shuffle. This
probe measures wall + work proxies for three cheap-explode shapes
with the rule excluded (engine default) vs re-enabled.

Usage: python tools/infergen_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lineage_store_database_management_system_spark import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="infergen_probe",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={
            "spark.sql.adaptive.enabled": "true",
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
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

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    events.count()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.count()

    def sliding(spark, sf_dir):
        # the ext_sliding_windows shape: 2x window-explode + agg
        w = (
            events.select(
                F.explode(
                    F.sequence(
                        F.date_trunc("hour", F.col("ts") - F.expr("INTERVAL 30 minutes")),
                        F.date_trunc("hour", F.col("ts")),
                        F.expr("INTERVAL 30 minutes"),
                    )
                ).alias("w0"),
                "value",
            )
            .groupBy("w0")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        )
        return w

    def posexp(spark, sf_dir):
        # the ds_centroid shape: posexplode vectors + agg by component
        return (
            emb.select(F.posexplode("embedding").alias("i", "c"))
            .groupBy("i")
            .agg(F.round(F.avg("c"), 6).alias("m"))
        )

    def multimodal_frames(spark, sf_dir):
        # mm_frame_sample shape: explode fixed-stride payload slices
        from lineage_store_database_management_system_spark.operators import (
            multimodal,
        )

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        payload = docs.select(
            F.col("doc_id"),
            F.encode(F.col("text"), "utf-8").alias("payload"),
        )
        return multimodal.sample_frames(payload, "doc_id", "payload", 64)

    shapes = {
        "sliding_windows": sliding,
        "posexplode_vectors": posexp,
        "mm_frame_sample": multimodal_frames,
    }
    for mode, rules in (
        ("excluded (engine default)",
         "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"),
        ("rule ENABLED", ""),
    ):
        spark.conf.set("spark.sql.optimizer.excludedRules", rules)
        print(f"\n== InferFiltersFromGenerate {mode} ==")
        for name, fn in shapes.items():
            best = None
            for rep in range(3):
                s0, t0 = snap(), time.time()
                n = fn(spark, sf_dir).count()
                dt, s1 = time.time() - t0, snap()
                w = {k: s1[k] - s0[k] for k in s0}
                if best is None or dt < best[0]:
                    best = (dt, w, n)
            dt, w, n = best
            print(
                f"  {name:22s} min {dt:.3f}s n={n} cpu={w['cpu']} "
                f"tasks={w['tasks']} shufW={w['shufw']} input={w['input']}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
