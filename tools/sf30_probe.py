"""sf30 probe: write path + durable ANN index three decades above
gate scale (VERDICT r7/r8 item 6). sf30 = 300x replication of sf0.1
(tools/make_scale_data.py 300): 45M-row orders, 180M-row lineitem,
6M embeddings — the largest dataset that fits the sandbox with room
for shuffle spill.

Probe A (write path, the orders_a scenario shape at 3x the sf10
measurement): bulk ingest -> 3-round dependent mutation batch ->
current-view read -> full compact. Compare per-stage times against
the sf10 row (SCALING.md round 6: 4.9 / 12.7 / 8.8 s at 15M rows) —
anything growing faster than rows is a finding.

Probe B (durable ANN): ivf_pq_write_index over 90% of the vectors
(IVFADC residual config from the r7 recall study), incremental
ivf_pq_append_index of the last 10%, partition-pruned top-k queries
from the persisted index, overlap vs brute force on the same query.

Usage: python tools/sf30_probe.py [sf30_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(root, ".localdata", "sf30")
    )

    from pyspark.sql import functions as F

    from lineage_store_database_management_system_spark import Database, get_spark
    from lineage_store_database_management_system_spark.operators import similarity

    spark = get_spark(app_name="sf30-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    rep: dict = {}

    # ---- Probe A: write path ----------------------------------------
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    wroot = tempfile.mkdtemp(prefix="lss_sf30_wp_")
    db = Database().open(wroot, spark)
    t = db.create_table_typed("orders", src.schema, "o_orderkey")
    t0 = time.time()
    t.ingest_dataframe(src)
    rep["ingest_s"] = round(time.time() - t0, 1)
    rep["rows"] = src.count()
    t0 = time.time()
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
    rep["mutation_batch_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    rep["view_rows"] = t.current_view().count()
    rep["view_read_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    t.compact()
    rep["compact_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    rep["view_rows_post_compact"] = t.current_view().count()
    rep["view_read_post_compact_s"] = round(time.time() - t0, 1)
    print(json.dumps({"write_path": rep}), flush=True)
    shutil.rmtree(wroot, ignore_errors=True)

    # ---- Probe B: durable ANN index ---------------------------------
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_vec = emb.count()
    cut = int(n_vec * 0.9)
    base = emb.where(F.col("vec_id") % 10 != 9)
    tail = emb.where(F.col("vec_id") % 10 == 9)
    idx_dir = os.path.join(tempfile.mkdtemp(prefix="lss_sf30_ann_"), "ivfpq")
    arep: dict = {"n_vectors": n_vec, "base_split": cut}
    t0 = time.time()
    similarity.ivf_pq_write_index(
        base, idx_dir, n_lists=64, m=4, nbits=4, residual=True
    )
    arep["build_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    arep["appended"] = similarity.ivf_pq_append_index(tail, idx_dir)
    arep["append_s"] = round(time.time() - t0, 1)
    qvecs = [r["embedding"] for r in emb.orderBy("vec_id").limit(5).collect()]
    t0 = time.time()
    for qv in qvecs:
        similarity.ivf_pq_topk_from_index(
            spark, idx_dir, qv, k=10, nprobe=8, n_candidates=200
        ).collect()
    arep["query5_s"] = round(time.time() - t0, 1)
    # recall sanity on query 0
    got = {
        r["vec_id"]
        for r in similarity.ivf_pq_topk_from_index(
            spark, idx_dir, qvecs[0], k=10, nprobe=8, n_candidates=200
        ).collect()
    }
    exact = {
        r["vec_id"]
        for r in similarity.brute_force_topk(emb, qvecs[0], k=10).collect()
    }
    arep["overlap_at_10"] = len(got & exact)
    print(json.dumps({"ann_index": arep}), flush=True)
    shutil.rmtree(os.path.dirname(idx_dir), ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
