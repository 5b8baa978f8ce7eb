"""As-of (time travel) probe at sf30: quantify what the audit path
costs versus the live path at 1.5M docs / three decades above the
oracle gate, and prove marker replay self-consistently at scale.

Protocol: build the durable BM25 index, capture the marker AND the
live top-20 BEFORE any mutation, then delete every 41st doc and
re-text every 53rd survivor with the query keywords. The as-of
replay at the pre-mutation marker must return EXACTLY the captured
list (no oracle needed — the engine is checked against its own
pre-mutation answer at full scale), while the live query must see
the keyword updates. Work proxies (status-store stage metrics, the
bench.py discipline) decompose the as-of premium: the pruned posting
read is shared with the live path; the extra bytes are the as-of
doclens aggregate (n_docs/avgdl re-derivation) plus the slot-
filtered tombstone read — the cost the SCALING.md design section
promises is paid by time travel only, never by the hot path.

ANN twin: IVF-PQ index over the embeddings, same capture/mutate/
replay protocol with full probe; the as-of premium there is only the
tombstone read + the _gen filter (probe planning is driver math, no
historical sidecar).

Usage: python tools/asof_probe.py [sf_dir]
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
    import urllib.request

    from pyspark.sql import functions as F

    from lineage_store_database_management_system_spark import get_spark
    from lineage_store_database_management_system_spark.operators import (
        similarity,
        textsearch,
    )

    spark = get_spark(
        app_name="asof-probe",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "50000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def _work() -> dict:
        url = f"{ui}/api/v1/applications/{app_id}/stages"
        try:
            with urllib.request.urlopen(url, timeout=10) as r:
                stages = json.load(r)
        except Exception:
            return {}
        out = {"input_bytes": 0}
        for s in stages:
            out["input_bytes"] += s.get("inputBytes", 0)
        return out

    def _bytes(w0, w1):
        if not w0 or not w1:
            return -1
        return w1["input_bytes"] - w0["input_bytes"]

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    rep: dict = {"n_docs": docs.count()}

    broot = tempfile.mkdtemp(prefix="lss_asof_probe_")
    bidx = os.path.join(broot, "bm25")
    t0 = time.time()
    textsearch.write_bm25_index(docs, bidx)
    rep["build_s"] = round(time.time() - t0, 1)
    terms = ["join", "filter", "merge"]
    marker = textsearch.index_asof_marker(bidx)
    captured = [
        tuple(r)
        for r in textsearch.bm25_topk_from_index(
            spark, bidx, terms, k=20
        ).collect()
    ]
    # mutate: the as-of replay must be immune to both
    textsearch.delete_from_bm25_index(
        docs.where(F.col("doc_id") % 41 == 0).select("doc_id"), bidx
    )
    textsearch.update_bm25_index(
        docs.where((F.col("doc_id") % 53 == 0) & (F.col("doc_id") % 41 != 0))
        .select(
            "doc_id",
            F.concat(
                F.lit("filter join probe text "),
                F.col("doc_id").cast("string"),
            ).alias("text"),
        ),
        bidx,
    )
    w0, t0 = _work(), time.time()
    live = [
        tuple(r)
        for r in textsearch.bm25_topk_from_index(
            spark, bidx, terms, k=20
        ).collect()
    ]
    rep["live_query_s"] = round(time.time() - t0, 1)
    rep["live_query_input_bytes"] = _bytes(w0, _work())
    w0, t0 = _work(), time.time()
    asof = [
        tuple(r)
        for r in textsearch.bm25_topk_from_index(
            spark, bidx, terms, k=20, as_of=marker
        ).collect()
    ]
    rep["asof_query_s"] = round(time.time() - t0, 1)
    rep["asof_query_input_bytes"] = _bytes(w0, _work())
    rep["asof_equals_premutation_capture"] = asof == captured
    rep["live_differs_from_capture"] = live != captured
    print(json.dumps({"bm25_asof_vs_live": rep}), flush=True)
    shutil.rmtree(broot, ignore_errors=True)
    ok = rep["asof_equals_premutation_capture"] and rep[
        "live_differs_from_capture"
    ]

    emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).select("vec_id", "embedding")
    arep: dict = {"n_vecs": emb.count()}
    aroot = tempfile.mkdtemp(prefix="lss_asof_probe_ann_")
    aidx = os.path.join(aroot, "ann")
    t0 = time.time()
    similarity.ivf_pq_write_index(emb, aidx, n_lists=64, m=4, nbits=4)
    arep["build_s"] = round(time.time() - t0, 1)
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    amarker = similarity.ann_index_asof_marker(aidx)
    acap = [
        tuple(r)
        for r in similarity.ivf_pq_topk_from_index(
            spark, aidx, q, k=20, nprobe=8, n_candidates=400, round_to=3
        ).collect()
    ]
    similarity.ivf_pq_delete_from_index(
        emb.where(F.col("vec_id") % 41 == 0).select("vec_id"), aidx
    )
    w0, t0 = _work(), time.time()
    alive = [
        tuple(r)
        for r in similarity.ivf_pq_topk_from_index(
            spark, aidx, q, k=20, nprobe=8, n_candidates=400, round_to=3
        ).collect()
    ]
    arep["live_query_s"] = round(time.time() - t0, 1)
    arep["live_query_input_bytes"] = _bytes(w0, _work())
    w0, t0 = _work(), time.time()
    aasof = [
        tuple(r)
        for r in similarity.ivf_pq_topk_from_index(
            spark, aidx, q, k=20, nprobe=8, n_candidates=400, round_to=3,
            as_of=amarker,
        ).collect()
    ]
    arep["asof_query_s"] = round(time.time() - t0, 1)
    arep["asof_query_input_bytes"] = _bytes(w0, _work())
    arep["asof_equals_premutation_capture"] = aasof == acap
    arep["live_differs_from_capture"] = alive != acap
    print(json.dumps({"ann_asof_vs_live": arep}), flush=True)
    shutil.rmtree(aroot, ignore_errors=True)
    ok = ok and arep["asof_equals_premutation_capture"] and arep[
        "live_differs_from_capture"
    ]
    print("ASOF PROBE " + ("OK" if ok else "FAIL"), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
