"""Driver-contract tests for __spark_entry__: entry() smoke, registry
shape (every oracle key has a query), and plan hygiene on the hot
paths (pushdown + pruning, SURVEY §4.2)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

from lineage_store_database_management_system_spark.plans import (
    explain_str,
    scan_read_schema,
)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "o_orderkey" in df.columns and "o_totalprice" in df.columns


def test_registry_shape(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # every declared-parity operator group is represented
    for prefix in ("pq_", "ext_", "ds_", "mm_", "st_"):
        assert any(k.startswith(prefix) for k in qs), prefix
    # the large majority of queries are fully oracle-gated
    assert len(oracles) / len(qs) >= 0.8


def test_readme_workload_count_matches_registry():
    """README's headline workload count must track the live registry
    (ADVICE r6: the hardcoded figure drifted; now it fails the suite
    instead of drifting silently)."""
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "README.md")) as f:
        m = re.search(r"`workloads\.py` \| (\d+) named workloads", f.read())
    assert m, "README workloads.py row missing"
    assert int(m.group(1)) == len(entrymod.queries())


def test_filter_pushdown_through_lineage_view(tmp_db, spark, sf_dir):
    """A key filter on the current view must reach the base Parquet
    scan as a pushed filter, and the scan must prune to the projected
    columns (the Spark equivalents of the reference's index lookup and
    projection mask)."""
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = tmp_db.create_table_typed("orders", src.schema, "o_orderkey")
    t.ingest_dataframe(src)
    q = t.current_view().where("o_orderkey = 42").select("o_orderkey", "o_totalprice")
    plan = explain_str(q)
    assert "PushedFilters" in plan
    assert any(
        "o_orderkey" in line and ("EqualTo" in line or "42" in line)
        for line in plan.splitlines()
        if "PushedFilters" in line
    ), plan
    schemas = scan_read_schema(q)
    # no scan should read all 6 user columns for this 2-column query
    assert all("o_orderpriority" not in s for s in schemas), schemas


def test_key_filter_reaches_tail_scan(tmp_db, spark, sf_dir):
    """With keyed tail deltas, a key predicate on the current view
    must push into the TAIL Parquet scan too (not just base): the
    fold joins on (rid, key) and Catalyst's constraint inference
    propagates the filter to both sides. At 100 TB this is what makes
    a point query prune the tail instead of folding all of it."""
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = tmp_db.create_table_typed("orders_tailprune", src.schema, "o_orderkey")
    t.ingest_dataframe(src)
    t.bulk_update(
        src.limit(50).select("o_orderkey", (F.col("o_totalprice") + 1).alias("o_totalprice"))
    )
    assert t.tail_keyed
    q = t.current_view().where("o_orderkey = 42").select("o_orderkey", "o_totalprice")
    plan = explain_str(q)
    pushed_lines = [l for l in plan.splitlines() if "PushedFilters" in l]
    keyed = [l for l in pushed_lines if "o_orderkey" in l and ("EqualTo" in l or "42" in l)]
    # both the base scan and the tail scan carry the key filter
    assert len(keyed) >= 2, plan
    # correctness of the filtered view is unchanged
    row = q.collect()
    assert len(row) == 1 and row[0]["o_orderkey"] == 42


def test_partition_filter_prunes_tail_scan(tmp_db, spark, sf_dir):
    """For a partitioned table the partition predicate must prune the
    tail scan as well (partition values ride in every delta)."""
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = tmp_db.create_table_typed(
        "orders_part_prune", src.schema, "o_orderkey", partition_by=["o_orderstatus"]
    )
    t.ingest_dataframe(src)
    t.bulk_update(
        src.limit(50).select("o_orderkey", (F.col("o_totalprice") + 1).alias("o_totalprice"))
    )
    q = t.current_view().where("o_orderstatus = 'F'")
    plan = explain_str(q)
    pushed = [
        l
        for l in plan.splitlines()
        if ("PushedFilters" in l or "DataFilters" in l) and "o_orderstatus" in l
    ]
    assert len(pushed) >= 1, plan
    # value-level check: matches the unfiltered view filtered after the fold
    exp = t.current_view().collect()
    exp_f = [r for r in exp if r["o_orderstatus"] == "F"]
    assert q.count() == len(exp_f)
