"""Scale probes for the round-11 operators at sf10 (500k docs / 200k
vectors): measure the pruned path against its naive twin, the same
evidence discipline as fastcount_probe/metadata_plane_probe.

- trigram substring search: index-pruned verify (candidate IN-list)
  vs the naive full-corpus contains() scan; reports candidate count
  vs corpus size.
- filtered ANN (durable index): histogram-probe path (partition-
  pruned lists + pushed equality) vs brute filtered scan over the
  whole index.

Usage: python tools/r11_ops_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf10",
    )
    import tempfile

    from pyspark.sql import functions as F

    from lineage_store_database_management_system_spark import get_spark
    from lineage_store_database_management_system_spark.operators import (
        similarity,
        textsearch,
    )

    spark = get_spark(app_name="r11-probe", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    # ---------------- trigram search ----------------
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    idx = tempfile.mkdtemp(prefix="r11_trgm_")
    t0 = time.time()
    textsearch.write_trigram_index(docs, idx)
    build_s = round(time.time() - t0, 3)
    postings, stats = textsearch.open_trigram_index(spark, idx)
    pattern = "customer query"

    def _index_search():
        got, _ = textsearch.substring_search(
            docs, pattern, postings=postings, stats=stats
        )
        return got.count()

    def _naive():
        return docs.where(F.col("text").contains(pattern)).count()

    n_match = _naive()
    out["trigram"] = {
        "docs": n_docs,
        "matches": n_match,
        "index_build_s": build_s,
        "index_search_s": _t(_index_search),
        "naive_scan_s": _t(_naive),
    }

    # ---------------- filtered ANN ----------------
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_vec = emb.count()
    aidx = tempfile.mkdtemp(prefix="r11_fann_") + "/idx"
    t0 = time.time()
    similarity.ivf_pq_write_index(
        emb, aidx, n_lists=16, m=8, nbits=4, filter_cols=["label"]
    )
    ann_build_s = round(time.time() - t0, 3)
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]

    def _probe():
        got, info = similarity.ivf_pq_filtered_topk_from_index(
            spark, aidx, q, "label", 2, k=20, brute_threshold=128,
            min_candidates=160, round_to=3,
        )
        return got.count(), info

    def _brute():
        return similarity.filtered_topk(
            spark.read.parquet(aidx), q, "label = 2", k=20, round_to=3
        ).count()

    _, info = _probe()
    out["filtered_ann"] = {
        "vectors": n_vec,
        "matches_total": info["total_matches"],
        "strategy": info["strategy"],
        "probes": len(info["probes"]),
        "index_build_s": ann_build_s,
        "probe_search_s": _t(lambda: _probe()[0]),
        "brute_filtered_s": _t(_brute),
    }

    import json

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
