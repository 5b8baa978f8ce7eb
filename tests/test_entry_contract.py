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
