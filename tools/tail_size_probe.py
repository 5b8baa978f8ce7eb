"""Tail-file sizing at scale (VERDICT r14 #5): run the orders_a
ingest + 3-round mutation batch at a given SF and print the file-size
histogram of the tail dir (does the keyed AQE REBALANCE produce
sensibly-sized delta files, not one-per-scan-task?), plus the base
dir layout and the advisory size in force.

Usage: python tools/tail_size_probe.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lineage_store_database_management_system_spark import get_spark  # noqa: E402
from lineage_store_database_management_system_spark.catalog import (  # noqa: E402
    Database,
)


def hist(d: str, tag: str) -> None:
    sizes = sorted(
        os.path.getsize(p) for p in glob.glob(os.path.join(d, "**", "*.parquet"),
                                              recursive=True)
    )
    if not sizes:
        print(f"  {tag}: no files")
        return
    total = sum(sizes)
    print(
        f"  {tag}: {len(sizes)} files, total {total/1e6:.2f} MB, "
        f"min {sizes[0]/1e3:.1f} KB, median {sizes[len(sizes)//2]/1e3:.1f} KB, "
        f"max {sizes[-1]/1e6:.2f} MB"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="tail_size_probe", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.sql.adaptive.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    adv = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    print(f"sf_dir={sf_dir} cpus={cpus} advisoryPartitionSizeInBytes={adv}")
    root = tempfile.mkdtemp(prefix="tailsize_")
    db = Database().open(root, spark)
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    print(f"orders rows: {src.count():,}")
    t = db.create_table_typed("orders_a", src.schema, "o_orderkey")
    t0 = time.time()
    t.ingest_dataframe(src)
    print(f"ingest {time.time()-t0:.1f}s")
    t0 = time.time()
    with t.mutation_batch() as b:
        b.update(src.where("o_orderkey % 7 = 0").select(
            "o_orderkey", (F.col("o_totalprice") + 100).alias("o_totalprice")))
        b.update(lambda v: v.where("o_orderkey % 5 = 0").select(
            "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice")))
        b.delete(src.where("o_orderkey % 10 = 3").select("o_orderkey"))
    print(f"mutation batch {time.time()-t0:.1f}s")
    hist(t.base_dir, "base")
    hist(t.tail_dir, "tail")
    n = t.current_view().count()
    print(f"current view rows: {n:,}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
