"""Per-micro-batch overhead of the streaming gates (VERDICT r14 #8):
run the tumbling-agg stream over the sf events with the gates'
maxFilesPerTrigger=4 vs a single batch, and split each micro-batch's
durationMs (from StreamingQueryProgress) into data work
(addBatch) vs fixed machinery (latestOffset/getBatch/walCommit/
commitOffsets/queryPlanning/triggerExecution remainder).

Usage: python tools/stream_overhead_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lineage_store_database_management_system_spark import get_spark  # noqa: E402
from lineage_store_database_management_system_spark.streaming import (  # noqa: E402
    read_events_stream,
    streaming_tumbling_agg,
)


def run(spark, path, max_files, tag):
    import re

    qname = re.sub(r"\W+", "_", tag)
    events = read_events_stream(spark, path, max_files_per_trigger=max_files)
    agg = streaming_tumbling_agg(events)
    ckpt = tempfile.mkdtemp(prefix="so_ckpt_")
    t0 = time.time()
    q = (
        agg.writeStream.format("memory")
        .queryName(f"probe_{qname}")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    prog = q.recentProgress
    rows = []
    for p in prog:
        d = p["durationMs"]
        rows.append(
            dict(
                batch=p["batchId"],
                rows=p["numInputRows"],
                total=d.get("triggerExecution", 0),
                addBatch=d.get("addBatch", 0),
                overhead=d.get("triggerExecution", 0) - d.get("addBatch", 0),
                latestOffset=d.get("latestOffset", 0),
                getBatch=d.get("getBatch", 0),
                queryPlanning=d.get("queryPlanning", 0),
                walCommit=d.get("walCommit", 0),
                commitOffsets=d.get("commitOffsets", 0),
            )
        )
    print(f"\n{tag}: wall {wall:.2f}s, {len(rows)} micro-batches")
    print(
        f"  {'batch':>5} {'rows':>7} {'total':>6} {'addBatch':>8} "
        f"{'ovh':>5} {'latest':>6} {'getB':>5} {'plan':>5} {'wal':>4} {'cmt':>4}"
    )
    for r in rows:
        print(
            f"  {r['batch']:>5} {r['rows']:>7} {r['total']:>6} "
            f"{r['addBatch']:>8} {r['overhead']:>5} {r['latestOffset']:>6} "
            f"{r['getBatch']:>5} {r['queryPlanning']:>5} {r['walCommit']:>4} "
            f"{r['commitOffsets']:>4}"
        )
    tot = sum(r["total"] for r in rows)
    ovh = sum(r["overhead"] for r in rows)
    print(f"  sum total={tot}ms addBatch={tot-ovh}ms fixed-overhead={ovh}ms")
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    path = os.path.join(sf_dir, "events.parquet")
    spark = get_spark(
        app_name="stream_overhead_probe",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.sql.adaptive.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_files = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    ) if os.path.isdir(path) else 1
    print(f"events source: {path} ({n_files} part files)")
    run(spark, path, 4, "maxFilesPerTrigger=4 (gate shape)")
    run(spark, path, 10_000, "single batch")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
