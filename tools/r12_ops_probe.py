"""Scale probes for the round-12 operators (same evidence discipline
as r11_ops_probe):

- RANGE-filtered ANN at sf10 (200k vectors): timestamp filter planned
  from the per-list exact extents — reports lists pruned / probed,
  estimate quality, and wall time vs the brute filtered scan over the
  whole index. created_ts is derived from the corpus's own label
  structure (content drifting over time), the correlation real
  corpora have and the reason per-list extents prune at all.
- Trigram delete/update reconciliation at sf1 (50k docs): delete +
  update a slice AFTER indexing, prove deleted docs never surface and
  updated text is found, and measure the reconcile cost (tombstone
  append, O(changed)) vs the full rebuild it replaces.

Usage: python tools/r12_ops_probe.py [sf10_dir] [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
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
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf10 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, ".localdata", "sf10")
    sf1 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(root, ".localdata", "sf1")

    from pyspark.sql import functions as F

    from lineage_store_database_management_system_spark import get_spark
    from lineage_store_database_management_system_spark.operators import (
        similarity,
        textsearch,
    )

    spark = get_spark(app_name="r12-probe", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    # ---------------- range-filtered ANN at sf10 ----------------
    # created_ts models CONTENT DRIFT with an explicit plant (the
    # r11 displaced-cloud discipline): the driver's 200k vectors are
    # split into 10 ingest epochs (vec_id div 20k), each epoch's
    # cloud DISPLACED along dim 0 by 2.0 x epoch, timestamps = epoch
    # start day. New content embedding elsewhere than old content is
    # the correlation real drifting corpora have and the reason
    # per-list extents can prune a time filter at all. The probe on
    # the UNdrifted driver corpus is also reported: labels and dim-0
    # extents there span every list (measured), so extents honestly
    # cannot prune — the zero-pruning fallback contract.
    raw = spark.read.parquet(os.path.join(sf10, "embeddings.parquet"))
    emb = raw.select(
        "vec_id",
        F.expr(
            "transform(embedding, (x, i) -> CASE WHEN i = 0 THEN"
            " CAST(x + 2.0 * (vec_id div 20000) AS FLOAT) ELSE x END)"
        ).alias("embedding"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(days=((F.col("vec_id") / 20000).cast("int") * 10))
        ).alias("created_ts"),
    )
    n_vec = emb.count()
    idx = tempfile.mkdtemp(prefix="r12_ridx_")
    t0 = time.time()
    similarity.ivf_pq_write_index(
        emb, idx, n_lists=16, m=8, nbits=4, range_cols=["created_ts"]
    )
    build_s = round(time.time() - t0, 3)
    # query from epoch 3; the time filter selects exactly epoch 3's
    # ingest window (its vectors all carry the epoch start day Jan 31)
    q = [float(x) for x in emb.where(F.col("vec_id") == 60000).first()["embedding"]]
    import datetime

    lo = datetime.datetime(2026, 1, 30, 0, 0, 0)
    hi = datetime.datetime(2026, 2, 1, 0, 0, 0)
    pred = F.col("created_ts").between(F.lit(lo), F.lit(hi))

    def _prefilter():
        df, info = similarity.ivf_pq_range_filtered_topk_from_index(
            spark, idx, q, "created_ts", lo, hi, k=20,
            brute_threshold=1 << 30, round_to=4,
        )
        df.count()
        return info

    info = _prefilter()
    t_pref = _t(_prefilter)

    def _brute():
        similarity.filtered_topk(
            spark.read.parquet(idx), q, pred, k=20, round_to=4
        ).count()

    t_brute = _t(_brute)
    # prefilter is exact BY CONSTRUCTION (pruning uses exact extents);
    # verify it at scale against the brute scan of the same index
    got, _ = similarity.ivf_pq_range_filtered_topk_from_index(
        spark, idx, q, "created_ts", lo, hi, k=20,
        brute_threshold=1 << 30, round_to=4,
    )
    exact = similarity.filtered_topk(
        spark.read.parquet(idx), q, pred, k=20, round_to=4
    )
    same = [r["vec_id"] for r in got.collect()] == [
        r["vec_id"] for r in exact.collect()
    ]
    # probe mode: recall-oriented escalation; report its overlap
    probed, pinfo = similarity.ivf_pq_range_filtered_topk_from_index(
        spark, idx, q, "created_ts", lo, hi, k=20, brute_threshold=0,
        min_candidates=500, round_to=4,
    )
    p_ids = {r["vec_id"] for r in probed.collect()}
    e_ids = [r["vec_id"] for r in exact.collect()]
    out["range_filtered_ann_sf10"] = {
        "n_vectors": n_vec,
        "index_build_s": build_s,
        "lists_total": 16,
        "lists_pruned_by_extent": info["lists_pruned"],
        "lists_possible": info["lists_possible"],
        "est_matches": info["est_matches"],
        "prefilter_s": t_pref,
        "brute_filtered_scan_s": t_brute,
        "prefilter_exact_vs_brute": same,
        "probe_probes": pinfo.get("probes", []),
        "probe_top20_recall": round(
            sum(1 for i in e_ids if i in p_ids) / max(len(e_ids), 1), 3
        ),
    }
    print(json.dumps({"range_filtered_ann_sf10": out["range_filtered_ann_sf10"]}))

    if os.environ.get("R12_PROBE_ONLY") == "ann":
        return 0

    # ---------------- trigram reconcile at sf1 ----------------
    docs = spark.read.parquet(os.path.join(sf1, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    tg = tempfile.mkdtemp(prefix="r12_trgm_")
    t0 = time.time()
    textsearch.write_trigram_index(docs, tg)
    tg_build_s = round(time.time() - t0, 3)
    # deletes: every 500th doc; updates: every 997th gets needle text
    dead = docs.where(F.col("doc_id") % 500 == 0).select("doc_id")
    changed = docs.where(F.col("doc_id") % 997 == 0).select(
        "doc_id",
        F.concat(F.lit("reconciled flagon needle "),
                 F.col("doc_id").cast("string")).alias("text"),
    )
    t0 = time.time()
    n_dead = textsearch.delete_from_trigram_index(dead, tg)
    n_upd = textsearch.update_trigram_index(changed, tg)
    reconcile_s = round(time.time() - t0, 3)
    postings, stats = textsearch.open_trigram_index(spark, tg)
    current = (
        docs.join(dead, "doc_id", "left_anti")
        .where(F.col("doc_id") % 997 != 0)
        .unionByName(changed)
    )
    # deleted docs must never surface even against the stale snapshot
    hits, _i = textsearch.substring_search(
        docs, "customer query", postings=postings, stats=stats
    )
    bad = hits.join(dead, "doc_id", "left_semi").count()
    upd_hits, _i2 = textsearch.substring_search(
        current, "flagon needle", postings=postings, stats=stats
    )
    found_updates = upd_hits.count()
    t0 = time.time()
    rep = textsearch.compact_trigram_index(spark, tg, force=True)
    compact_s = round(time.time() - t0, 3)
    out["trigram_reconcile_sf1"] = {
        "n_docs": n_docs,
        "index_build_s": tg_build_s,
        "n_deleted": n_dead,
        "n_updated": n_upd,
        "reconcile_s": reconcile_s,
        "deleted_docs_surfaced": bad,
        "updated_docs_found": found_updates,
        "expected_updates": changed.count(),
        "forced_compaction_s": compact_s,
        "dead_fraction_at_compaction": rep["dead_fraction"],
    }
    print(json.dumps({"trigram_reconcile_sf1": out["trigram_reconcile_sf1"]}))
    return 0




def bm25_probe(sf10_dir: str | None = None) -> dict:
    """Index-vs-scan BM25 at sf10 (500k docs): the structural win is
    that query work becomes the three query terms' pruned posting
    lists instead of a full corpus re-tokenize per query."""
    import json
    import os
    import tempfile
    import time

    from lineage_store_database_management_system_spark import get_spark
    from lineage_store_database_management_system_spark.operators import (
        textops,
        textsearch,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf10 = sf10_dir or os.path.join(root, ".localdata", "sf10")
    spark = get_spark(app_name="r12-bm25-probe", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf10, "documents.parquet")).select(
        "doc_id", "text"
    )
    n = docs.count()
    terms = ["join", "filter", "merge"]
    idx = tempfile.mkdtemp(prefix="r12_bm25_")
    t0 = time.time()
    textsearch.write_bm25_index(docs, idx)
    build_s = round(time.time() - t0, 3)

    t_scan = _t(lambda: textops.bm25_topk(docs, "doc_id", "text", terms, k=20).count())
    t_idx = _t(
        lambda: textsearch.bm25_topk_from_index(spark, idx, terms, k=20).count()
    )
    same = [
        (r["doc_id"], r["bm25"])
        for r in textsearch.bm25_topk_from_index(spark, idx, terms, k=20).collect()
    ] == [
        (r["doc_id"], r["bm25"])
        for r in textops.bm25_topk(docs, "doc_id", "text", terms, k=20).collect()
    ]
    out = {
        "n_docs": n,
        "index_build_s": build_s,
        "scan_query_s": t_scan,
        "index_query_s": t_idx,
        "identical_top20": same,
    }
    print(json.dumps({"bm25_index_sf10": out}))
    return out


if __name__ == "__main__":
    if os.environ.get("R12_PROBE_ONLY") == "bm25":
        bm25_probe()
        raise SystemExit(0)
    raise SystemExit(main())
