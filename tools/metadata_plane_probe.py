"""Metadata-plane scale probe: fast_count / fast_min_max /
scan_with_bounds / drop_partition timed against their full-scan twins
on a mutated, compacted lineage table at a chosen tier (default the
sf30 replica set, ~45M orders rows).

Shape claims probed (SCALING.md):
 - fast_count: O(tail) — zero base bytes at any tier;
 - fast_min_max with planted tail extremes: ZERO base files scanned;
 - scan_with_bounds over a z-ordered snapshot: opened-file ratio and
   wall time vs the unpruned filtered view;
 - drop_partition: wall time independent of partition size (one log
   commit + O(files) renames).

Usage: python tools/metadata_plane_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t3(fn):
    """median of 3."""
    xs = []
    for _ in range(3):
        t0 = time.time()
        fn()
        xs.append(time.time() - t0)
    return round(sorted(xs)[1], 3)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "sf30",
    )
    from pyspark.sql import functions as F

    from lineage_store_database_management_system_spark import Database, get_spark

    spark = get_spark(app_name="mp-probe", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n_src = src.count()
    root = tempfile.mkdtemp(prefix="lss_mpp_")
    db = Database().open(root, spark)
    rep: dict = {"sf_dir": sf_dir, "src_rows": n_src}

    t0 = time.time()
    t = db.create_table_typed(
        "orders", src.schema, "o_orderkey", partition_by=["o_orderstatus"]
    )
    t.ingest_dataframe(src)
    t.bulk_update(
        src.where("o_orderkey % 7 = 0").select(
            "o_orderkey", (F.col("o_totalprice") + 100).alias("o_totalprice")
        )
    )
    t.bulk_delete(src.where("o_orderkey % 10 = 3").select("o_orderkey"))
    t.compact(zorder_by=["o_custkey", "o_totalprice"], max_records_per_file=2_000_000)
    rep["build_s"] = round(time.time() - t0, 1)

    # --- clean-tail phase (post-compaction, the normal analytics
    # state): bounded scans skip maximally here
    def _bounded():
        t.scan_with_multi_bounds(
            {"o_custkey": (1000, 5000), "o_totalprice": (50000.0, 100000.0)}
        ).count()

    rep["scan_bounds_clean_s"] = t3(_bounded)
    rep["scan_bounds_clean_files"] = t.last_scan_bounds

    def _unpruned():
        t.current_view().where(
            "o_custkey BETWEEN 1000 AND 5000 "
            "AND o_totalprice BETWEEN 50000 AND 100000"
        ).count()

    rep["scan_unpruned_s"] = t3(_unpruned)
    rep["fast_count_s"] = t3(lambda: t.fast_count().first())
    rep["full_count_s"] = t3(lambda: t.current_view().count())

    # --- dirty-tail phase: planted extremes give MIN/MAX its zero-scan
    # proof, and (honest degradation) dirty rids on the bounded column
    # block file pruning — after z-order every file's rid range spans
    # the space, so bounded scans fall back toward the full set until
    # the next compaction folds the deltas
    t.bulk_update(
        src.where("o_orderkey % 1000 = 1 AND o_orderkey % 10 <> 3").select(
            "o_orderkey",
            (F.col("o_totalprice") - F.lit(9e7)).alias("o_totalprice"),
        )
    )
    t.bulk_update(
        src.where("o_orderkey % 1000 = 2 AND o_orderkey % 10 <> 3").select(
            "o_orderkey",
            (F.col("o_totalprice") + F.lit(9e7)).alias("o_totalprice"),
        )
    )
    rep["fast_min_max_s"] = t3(lambda: t.fast_min_max("o_totalprice").first())
    rep["fmm_files"] = t.last_fast_minmax
    rep["full_min_max_s"] = t3(
        lambda: t.current_view()
        .agg(F.min("o_totalprice"), F.max("o_totalprice"))
        .first()
    )
    rep["scan_bounds_dirty_s"] = t3(_bounded)
    rep["scan_bounds_dirty_files"] = t.last_scan_bounds

    t.compact()  # fold the planted extremes so the drop is legal
    t0 = time.time()
    rep["drop_partition"] = t.drop_partition("o_orderstatus", "F")
    rep["drop_partition_s"] = round(time.time() - t0, 3)
    rep["post_drop_fast_count_s"] = t3(lambda: t.fast_count().first())
    print(json.dumps(rep))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
