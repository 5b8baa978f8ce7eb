"""Measure IVF recall@k under the two codebook-training modes
(VERDICT r5 item 6): legacy head-of-id 512-row driver sample vs the
scale path (uniform executor-side hash sample + distributed Lloyd
refinement over the full frame).

For ``n_queries`` embedding rows (hash-spread query picks), compute
brute-force cosine top-k as ground truth, then IVF top-k under each
codebook, and report mean recall@k plus the mean probed-list fraction
(the cost knob recall trades against).

Usage: python tools/recall_probe.py [sf_dir] [k] [nprobe] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lineage_store_database_management_system_spark import get_spark  # noqa: E402
from lineage_store_database_management_system_spark.operators import (  # noqa: E402
    similarity,
)


def main() -> int:
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    n_lists = 16

    spark = get_spark(
        app_name="recall-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).persist()
    n = emb.count()

    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.orderBy(
            F.xxhash64(F.concat(F.col("vec_id").cast("string"), F.lit("q")))
        )
        .limit(n_queries)
        .collect()
    ]

    modes = {
        "head512": dict(sample="head", sample_n=512, refine_iters=0),
        "hash4096+refine2": dict(sample="hash", sample_n=4096, refine_iters=2),
    }
    out = {"sf_dir": sf_dir, "n_vectors": n, "k": k, "nprobe": nprobe,
           "n_lists": n_lists, "n_queries": n_queries, "modes": {}}
    truth = {}
    for qid, qv in queries:
        truth[qid] = {
            r["vec_id"]
            for r in similarity.brute_force_topk(emb, qv, k).collect()
        }
    for mode, kw in modes.items():
        cents = similarity.ivf_centroids(emb, n_lists=n_lists, **kw)
        assigned = similarity.ivf_assign(emb, cents).persist()
        assigned.count()
        # balance diagnostic: fraction of vectors in the largest list
        sizes = [
            r["n"]
            for r in assigned.groupBy("_list").agg(F.count(F.lit(1)).alias("n")).collect()
        ]
        recs = []
        for qid, qv in queries:
            got = {
                r["vec_id"]
                for r in similarity.ivf_topk(
                    assigned, qv, cents, k=k, nprobe=nprobe
                ).collect()
            }
            recs.append(len(got & truth[qid]) / float(k))
        assigned.unpersist()
        out["modes"][mode] = {
            "recall_at_k": round(sum(recs) / len(recs), 4),
            "lists_used": len(sizes),
            "max_list_frac": round(max(sizes) / float(n), 4),
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
