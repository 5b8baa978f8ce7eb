"""Database maintenance runner — the between-ingest-waves cron job.

Opens a database path and runs one ``Database.maintain()`` pass
(flush -> threshold compaction -> index staleness catch-up ->
snapshot retention -> stale-MV refresh), printing the per-table
report as one JSON line.

Usage: python tools/maintain.py /path/to/db [--retain N] [--stale N]
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
    args = ap.parse_args()

    from lineage_store_database_management_system_spark import Database, get_spark

    spark = get_spark(app_name="maintain", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    db = Database().open(args.db_path, spark)
    report = db.maintain(snapshot_retain=args.retain, max_stale_deltas=args.stale)
    db.close()
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
