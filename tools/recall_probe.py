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


def make_clustered(spark, n: int, dim: int = 64, n_clusters: int = 32):
    """Deterministic mixture-of-Gaussians embedding table (VERDICT r6
    item 7): the driver's embeddings.parquet is near-uniform, which
    flatters IVF — real corpora are CLUSTERED and SKEWED, the regime
    where a bad codebook collapses lists and recall cliffs. Cluster
    sizes follow floor(C * u^2) (quadratic skew: the largest cluster
    holds ~18% of the mass at C=32); centers and noise derive from
    xxhash64 so the table is reproducible without any driver-side
    randomness. All JVM-side (sequence + transform + xxhash64), no
    Python in the generator."""
    from pyspark.sql import functions as F

    def u(col):  # deterministic uniform [0,1) from any column
        return (F.xxhash64(col) % 1_000_000 + 1_000_000) % 1_000_000 / 1_000_000.0

    base = spark.range(n).withColumnRenamed("id", "vec_id")
    cl = F.floor(n_clusters * F.pow(u(F.concat(F.col("vec_id"), F.lit("c"))), 2))
    base = base.withColumn("_cl", cl.cast("int"))
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    # center component ~ U[-1,1] scaled 4x so clusters separate;
    # noise ~ Irwin-Hall(4)-2 (gaussian-ish, sigma ~0.58)
    center = lambda d: 4.0 * (
        2.0 * u(F.concat(F.col("_cl"), F.lit("#"), d)) - 1.0
    )
    noise = lambda d: (
        sum(
            u(F.concat(F.col("vec_id"), F.lit(f"n{j}#"), d))
            for j in range(4)
        )
        - 2.0
    )
    emb = base.withColumn(
        "embedding",
        F.transform(dims, lambda d: (center(d) + noise(d)).cast("float")),
    ).select("vec_id", "embedding", "_cl")
    return emb


def main_clustered() -> int:
    """Clustered-skew recall probe: IVF and IVF+PQ recall@k plus
    list balance over the mixture-of-Gaussians table.

    Usage: python tools/recall_probe.py --clustered [n] [k] [nprobe]
           [n_queries] [n_lists]
    """
    from pyspark.sql import functions as F

    args = [a for a in sys.argv[2:]]
    n = int(args[0]) if len(args) > 0 else 200_000
    k = int(args[1]) if len(args) > 1 else 20
    nprobe = int(args[2]) if len(args) > 2 else 4
    n_queries = int(args[3]) if len(args) > 3 else 20
    n_lists = int(args[4]) if len(args) > 4 else 32

    spark = get_spark(
        app_name="recall-probe-clustered",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")),
    )
    emb = make_clustered(spark, n).persist()
    n_rows = emb.count()
    true_sizes = sorted(
        (r["n"] for r in emb.groupBy("_cl").agg(F.count(F.lit(1)).alias("n")).collect()),
        reverse=True,
    )
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.orderBy(
            F.xxhash64(F.concat(F.col("vec_id").cast("string"), F.lit("q")))
        )
        .limit(n_queries)
        .collect()
    ]
    truth = {
        qid: {r["vec_id"] for r in similarity.brute_force_topk(emb, qv, k).collect()}
        for qid, qv in queries
    }
    out = {
        "probe": "clustered-mog", "n_vectors": n_rows, "k": k,
        "nprobe": nprobe, "n_lists": n_lists, "n_queries": n_queries,
        "true_cluster_max_frac": round(true_sizes[0] / n_rows, 4),
        "modes": {},
    }
    cents = similarity.ivf_centroids(
        emb, n_lists=n_lists, sample="hash", sample_n=4096, refine_iters=2
    )
    assigned = similarity.ivf_assign(emb, cents).persist()
    assigned.count()
    sizes = [
        r["n"]
        for r in assigned.groupBy("_list").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    recs = []
    for qid, qv in queries:
        got = {
            r["vec_id"]
            for r in similarity.ivf_topk(assigned, qv, cents, k=k, nprobe=nprobe).collect()
        }
        recs.append(len(got & truth[qid]) / float(k))
    out["modes"]["ivf"] = {
        "recall_at_k": round(sum(recs) / len(recs), 4),
        "lists_used": len(sizes),
        "max_list_frac": round(max(sizes) / float(n_rows), 4),
    }
    for label, m, nbits, ncand, residual in [
        ("ivf+pq-raw", 8, 6, 4 * k, False),
        ("ivf+pq-residual", 8, 6, 4 * k, True),
        ("ivf+pq-residual-tuned", 16, 8, 10 * k, True),
    ]:
        src = (
            similarity.ivf_residuals(assigned, cents) if residual else assigned
        )
        vcol = "_res" if residual else "embedding"
        books = similarity.pq_train(
            src, vec_col=vcol, m=m, nbits=nbits,
            sample="hash", sample_n=4096, refine_iters=1,
        )
        encoded = similarity.pq_encode(src, books, vec_col=vcol).persist()
        encoded.count()
        recs_pq = []
        for qid, qv in queries:
            got = {
                r["vec_id"]
                for r in similarity.ivf_pq_topk(
                    encoded, qv, cents, books, k=k, nprobe=nprobe,
                    n_candidates=ncand, residual=residual,
                ).collect()
            }
            recs_pq.append(len(got & truth[qid]) / float(k))
        encoded.unpersist()
        out["modes"][label] = {
            "recall_at_k": round(sum(recs_pq) / len(recs_pq), 4),
            "m": m, "nbits": nbits, "n_candidates": ncand,
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--clustered":
        raise SystemExit(main_clustered())
    raise SystemExit(main())
