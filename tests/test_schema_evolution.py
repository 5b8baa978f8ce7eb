"""ALTER TABLE ADD/DROP COLUMN over the lineage format (extension —
the reference fixes the schema at create_table, SURVEY §1.4)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture()
def table(tmp_db, spark, sf_dir):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(300)
    t = tmp_db.create_table_typed("orders_ev", src.schema, "o_orderkey")
    t.ingest_dataframe(src)
    return t, src


def test_add_column_metadata_only(table, spark):
    t, src = table
    n0 = t.current_view().count()
    t.add_column("priority_score", T.DoubleType())
    # old rows read NULL for the new column, no files rewritten
    view = t.current_view()
    assert "priority_score" in view.columns
    assert view.where(F.col("priority_score").isNotNull()).count() == 0
    assert view.count() == n0
    # updates can set the new column through the tail
    upd = src.limit(40).select(
        "o_orderkey", (F.col("o_totalprice") / 100).alias("priority_score")
    )
    t.bulk_update(upd)
    assert t.current_view().where(F.col("priority_score").isNotNull()).count() == 40
    # compaction bakes it into the snapshot, answers invariant
    t.compact()
    assert t.current_view().where(F.col("priority_score").isNotNull()).count() == 40
    # survives close/reopen (manifest round-trip)
    from lineage_store_database_management_system_spark.lineage import LineageTable

    t.close()
    t2 = LineageTable.load(spark, t.path)
    assert "priority_score" in t2.user_cols
    assert t2.current_view().where(F.col("priority_score").isNotNull()).count() == 40


def test_drop_column_logical(table, spark):
    t, src = table
    t.drop_column("o_orderpriority")
    view = t.current_view()
    assert "o_orderpriority" not in view.columns
    assert view.count() == 300
    # guard rails
    with pytest.raises(ValueError):
        t.drop_column("o_orderkey")  # primary key
    with pytest.raises(ValueError):
        t.drop_column("nope")
    with pytest.raises(ValueError):
        t.add_column("o_orderpriority", T.StringType())  # name retired
    with pytest.raises(ValueError):
        t.add_column("o_custkey", T.LongType())  # already exists
    # version travel still works on the narrowed schema
    assert t.version_view(-1).count() == 300
