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

    # UI on for this session: the retrieval probes read bytes-touched
    # work proxies from the status-store REST API (the bench.py
    # discipline); retention raised so cumulative diffs never lose
    # evicted stages.
    spark = get_spark(
        app_name="sf30-probe",
        cpus=32,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "50000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    rep: dict = {}

    if "--retrieval-only" in sys.argv:  # probes C/D alone (round 13)
        return _retrieval_probes(spark, sf_dir)

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
    return _retrieval_probes(spark, sf_dir)


def _retrieval_probes(spark, sf_dir: str) -> int:
    # ---- Probe C/D: retrieval stack (round 13, VERDICT r12 #7) ------
    # BM25 index query vs the scan path, and fuzzy trigram-Jaccard
    # search, two decades above the r12 sf10 measurements — with
    # BYTES-TOUCHED work proxies (status-store stage metrics) so the
    # posting-pruning structural win is measured, not inferred from
    # page-cache-polluted wall clocks.
    import urllib.request

    from lineage_store_database_management_system_spark.operators import (
        textops,
        textsearch,
    )

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def _work() -> dict:
        url = f"{ui}/api/v1/applications/{app_id}/stages"
        try:
            with urllib.request.urlopen(url, timeout=10) as r:
                stages = json.load(r)
        except Exception:
            return {}
        out = {"input_bytes": 0, "tasks": 0}
        for s in stages:
            out["input_bytes"] += s.get("inputBytes", 0)
            out["tasks"] += s.get("numCompleteTasks", 0)
        return out

    def _bytes(w0: dict, w1: dict) -> int:
        # -1 = proxies unavailable (UI off / API error), never a crash
        if not w0 or not w1:
            return -1
        return w1["input_bytes"] - w0["input_bytes"]

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    brep: dict = {"n_docs": docs.count()}
    broot = tempfile.mkdtemp(prefix="lss_sf30_bm25_")
    bidx = os.path.join(broot, "bm25")
    t0 = time.time()
    textsearch.write_bm25_index(docs, bidx)
    brep["build_s"] = round(time.time() - t0, 1)
    terms = ["join", "filter", "merge"]
    w0, t0 = _work(), time.time()
    textsearch.bm25_topk_from_index(spark, bidx, terms, k=20).collect()
    brep["index_query_s"] = round(time.time() - t0, 1)
    w1 = _work()
    brep["index_query_input_bytes"] = _bytes(w0, w1)
    w0, t0 = _work(), time.time()
    textops.bm25_topk(docs, "doc_id", "text", terms, k=20).collect()
    brep["scan_query_s"] = round(time.time() - t0, 1)
    w1 = _work()
    brep["scan_query_input_bytes"] = _bytes(w0, w1)
    print(json.dumps({"bm25_index_vs_scan": brep}), flush=True)
    shutil.rmtree(broot, ignore_errors=True)

    frep: dict = {}
    troot = tempfile.mkdtemp(prefix="lss_sf30_trgm_")
    tidx = os.path.join(troot, "trgm")
    t0 = time.time()
    textsearch.write_trigram_index(docs, tidx)
    frep["build_s"] = round(time.time() - t0, 1)
    w0, t0 = _work(), time.time()
    out, info = textsearch.fuzzy_similarity_search(
        docs, "custmer quary", threshold=0.15, index_dir=tidx
    )
    frep["n_matches"] = out.count()
    frep["fuzzy_query_s"] = round(time.time() - t0, 1)
    w1 = _work()
    frep["fuzzy_query_input_bytes"] = _bytes(w0, w1)
    frep["n_candidates"] = info["n_candidates"]
    # honest comparator: the full re-gram + exact-Jaccard scan
    w0, t0 = _work(), time.time()
    out2, _ = textsearch.fuzzy_similarity_search(
        docs, "custmer quary", threshold=0.15
    )
    frep["n_matches_scan"] = out2.count()
    frep["fuzzy_scan_s"] = round(time.time() - t0, 1)
    w1 = _work()
    frep["fuzzy_scan_input_bytes"] = _bytes(w0, w1)
    print(json.dumps({"fuzzy_search": frep}), flush=True)
    shutil.rmtree(troot, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
