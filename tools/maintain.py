"""Database maintenance runner — the between-ingest-waves cron job.

Opens a database path and runs one ``Database.maintain()`` pass
(flush -> threshold compaction -> index staleness catch-up ->
snapshot retention -> stale-MV refresh), printing the per-table
report as one JSON line.

Durable operator-layer indexes live OUTSIDE the database directory,
so they are maintained by flag:

- ``--ann-index DIR`` (repeatable): marker-vs-footer sidecar repair
  first (``ivf_pq_index_repair`` — heals torn appends/deletes/stream
  batches including generation-counter drift, round 14), then one
  ``ivf_pq_maintain_index`` pass with the MEASURED recall probe ON by
  default (``--ann-recall-probe``, default 8 sampled queries) — the
  r10/r11 lesson is that the cheap statistics triggers (skew/err
  ratios) can be blind to boundary drift, so the trigger of last
  resort runs on the maintenance cadence, not opt-in. Also checks the
  filter-histogram sidecar's hist_rows marker and heals a torn append
  (``ivf_filter_histogram_repair``).
- ``--trigram-index DIR`` / ``--bm25-index DIR`` (repeatable):
  marker-vs-footer sidecar consistency repair first
  (``trigram_index_repair`` / ``bm25_index_repair`` — heals the
  crash-between-parquet-and-meta window, VERDICT r12), then
  tombstone-fraction-triggered postings compaction
  (``compact_trigram_index`` / ``compact_bm25_index`` — a zero-job
  metadata check below threshold).

Usage: python tools/maintain.py /path/to/db [--retain N] [--stale N]
           [--ann-index DIR ...] [--ann-recall-probe N]
           [--trigram-index DIR ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("db_path")
    ap.add_argument("--retain", type=int, default=1, help="snapshot versions to keep")
    ap.add_argument(
        "--stale", type=int, default=10_000, help="index staleness threshold (deltas)"
    )
    ap.add_argument(
        "--ann-index", action="append", default=[],
        help="durable ANN index dir to maintain (repeatable)",
    )
    ap.add_argument(
        "--ann-recall-probe", type=int, default=8,
        help="sampled queries for the measured recall trigger (0 disables)",
    )
    ap.add_argument(
        "--ann-recall-floor", type=float, default=0.5,
        help="recall@k below this flags the index stale",
    )
    ap.add_argument(
        "--ann-recall-nprobe", type=int, default=4,
        help="nprobe the recall probe measures at (match production queries)",
    )
    ap.add_argument(
        "--trigram-index", action="append", default=[],
        help="trigram index dir to compact past its tombstone fraction (repeatable)",
    )
    ap.add_argument(
        "--bm25-index", action="append", default=[],
        help="BM25 index dir to compact past its tombstone fraction (repeatable)",
    )
    args = ap.parse_args()

    from lineage_store_database_management_system_spark import Database, get_spark

    spark = get_spark(app_name="maintain", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    db = Database().open(args.db_path, spark)
    report = db.maintain(snapshot_retain=args.retain, max_stale_deltas=args.stale)
    db.close()
    if args.ann_index:
        from lineage_store_database_management_system_spark.operators import similarity

        ann_report = {}
        for d in args.ann_index:
            # marker-vs-footer sidecar repair FIRST (heals a torn
            # append/delete/stream-batch so every downstream trigger
            # reads honest counters — the text indexes' discipline,
            # round 14), then the tombstone sweep (past its dead
            # fraction) so drift statistics and any rebuild run over
            # live rows only
            r = {"sidecar": similarity.ivf_pq_index_repair(spark, d)}
            if r["sidecar"]["repaired"]:
                print(f"maintain: repaired ann sidecar {d}", file=sys.stderr)
            r["compaction"] = similarity.ivf_pq_compact_index(spark, d)
            r.update(
                similarity.ivf_pq_maintain_index(
                    spark, d,
                    recall_probe=args.ann_recall_probe,
                    recall_floor=args.ann_recall_floor,
                    recall_nprobe=args.ann_recall_nprobe,
                )
            )
            r["histogram_sidecar"] = similarity.ivf_filter_histogram_repair(spark, d)
            ann_report[d] = r
        report["_ann_indexes"] = ann_report
    if args.trigram_index or args.bm25_index:
        from lineage_store_database_management_system_spark.operators import textsearch

        # marker-vs-footer sidecar repair FIRST (heals a torn
        # append/delete so the compaction trigger reads honest
        # counters), then tombstone-fraction compaction
        if args.trigram_index:
            report["_trigram_indexes"] = {}
            for d in args.trigram_index:
                rep = {"sidecar": textsearch.trigram_index_repair(spark, d)}
                if rep["sidecar"]["repaired"]:
                    print(f"maintain: repaired trigram sidecar {d}", file=sys.stderr)
                rep.update(textsearch.compact_trigram_index(spark, d))
                report["_trigram_indexes"][d] = rep
        if args.bm25_index:
            report["_bm25_indexes"] = {}
            for d in args.bm25_index:
                rep = {"sidecar": textsearch.bm25_index_repair(spark, d)}
                if rep["sidecar"]["repaired"]:
                    print(f"maintain: repaired bm25 sidecar {d}", file=sys.stderr)
                rep.update(textsearch.compact_bm25_index(spark, d))
                report["_bm25_indexes"][d] = rep
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
