"""RocksDB vs default (HDFS-backed in-memory) state store for the
stateful-streaming path (VERDICT r7/r8 item 8): st_session_windows
was the most state-bound workload at sf10 (359 s in round 6 — 10M
events, per-user session state). The default provider keeps every
partition's entire state map on-heap between batches; RocksDB keeps
it off-heap on local disk with an in-memory block cache — the
production choice once state outgrows executor memory.

Runs the SAME sessionization drain (availableNow, memory sink) under
both providers in one process (providerClass is read per query
start), checks the results agree row-for-row, and prints one JSON
line per provider. Config recommendation goes to SCALING.md.

Usage: python tools/rocksdb_probe.py [events_parquet] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
DEFAULT = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    events = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(root, ".localdata", "sf10", "events.parquet")
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from lineage_store_database_management_system_spark import get_spark
    from lineage_store_database_management_system_spark.streaming import (
        read_events_stream,
        run_stream_once,
    )
    from lineage_store_database_management_system_spark.streaming.stream_ops import (
        streaming_sessionize,
    )

    spark = get_spark(app_name="rocksdb-probe", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    def drain():
        stream = read_events_stream(spark, events, max_files_per_trigger=4)
        return run_stream_once(streaming_sessionize(stream))

    results = {}
    for label, provider in (("default", DEFAULT), ("rocksdb", ROCKSDB)):
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
        times = []
        rows = None
        digest = None
        for _ in range(reps):
            t0 = time.time()
            df = drain()
            rows = df.count()
            times.append(round(time.time() - t0, 1))
        # one stable digest for the cross-provider equality check
        from pyspark.sql import functions as F

        digest = df.select(
            F.bit_xor(F.xxhash64(*df.columns)).alias("d")
        ).collect()[0]["d"]
        results[label] = {"times_s": times, "rows": rows, "digest": digest}
        print(json.dumps({label: results[label]}), flush=True)

    same = (
        results["default"]["rows"] == results["rocksdb"]["rows"]
        and results["default"]["digest"] == results["rocksdb"]["digest"]
    )
    print(
        json.dumps(
            {
                "result": "PASS" if same else "FAIL",
                "rows_equal": results["default"]["rows"] == results["rocksdb"]["rows"],
                "digest_equal": results["default"]["digest"]
                == results["rocksdb"]["digest"],
            }
        )
    )
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
