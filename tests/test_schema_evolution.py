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


def test_widen_column_metadata_only(tmp_db, spark):
    src = spark.createDataFrame(
        [(i, i * 10, float(i)) for i in range(50)],
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("qty", T.IntegerType()),
                T.StructField("ratio", T.FloatType()),
            ]
        ),
    )
    t = tmp_db.create_table_typed("widen_t", src.schema, "k")
    t.ingest_dataframe(src)
    t.flush()
    # int -> long and float -> double: metadata-only, old files promote
    t.widen_column("qty", T.LongType())
    t.widen_column("ratio", T.DoubleType())
    view = t.current_view()
    assert dict(view.dtypes)["qty"] == "bigint"
    assert dict(view.dtypes)["ratio"] == "double"
    assert view.agg(F.sum("qty")).first()[0] == sum(i * 10 for i in range(50))
    # post-widen writes carry the wide type through the tail
    t.bulk_update(
        spark.createDataFrame(
            [(3, 2**40)],
            T.StructType(
                [T.StructField("k", T.LongType()), T.StructField("qty", T.LongType())]
            ),
        )
    )
    assert (
        t.current_view().where("k = 3").select("qty").first()[0] == 2**40
    )
    # compaction rewrites in the wide type; answers invariant
    t.compact()
    assert t.current_view().where("k = 3").select("qty").first()[0] == 2**40
    # version travel across the widen reads old files promoted
    assert t.version_view(-1).where("k = 3").select("qty").first()[0] == 30
    # guard rails: narrowing / lossy rejected
    with pytest.raises(ValueError):
        t.widen_column("qty", T.IntegerType())
    with pytest.raises(ValueError):
        t.widen_column("qty", T.DoubleType())  # long -> double is lossy
    with pytest.raises(ValueError):
        t.widen_column("nope", T.LongType())
    # survives reopen
    from lineage_store_database_management_system_spark.lineage import LineageTable

    t.close()
    t2 = LineageTable.load(spark, t.path)
    assert dict(t2.current_view().dtypes)["qty"] == "bigint"


def test_rename_column_metadata_only(table, spark):
    t, src = table
    total0 = t.current_view().agg(F.sum("o_totalprice")).first()[0]
    t.rename_column("o_totalprice", "o_price")
    view = t.current_view()
    assert "o_price" in view.columns and "o_totalprice" not in view.columns
    assert view.agg(F.sum("o_price")).first()[0] == total0
    # writes under the NEW name land in old-named (physical) files
    upd = src.limit(10).select("o_orderkey", (F.lit(0.0)).alias("o_price"))
    t.bulk_update(upd)
    assert t.current_view().where("o_price = 0.0").count() == 10
    # compaction + version travel survive the rename
    t.compact()
    assert t.current_view().where("o_price = 0.0").count() == 10
    assert t.version_view(-1).agg(F.sum("o_price")).first()[0] == total0
    # chained rename keeps the original physical name
    t.rename_column("o_price", "o_amount")
    assert t.current_view().where("o_amount = 0.0").count() == 10
    assert t._phys_map == {"o_amount": "o_totalprice"}
    # guard rails
    with pytest.raises(ValueError):
        t.rename_column("o_orderkey", "ok2")  # primary key
    with pytest.raises(ValueError):
        t.rename_column("o_custkey", "o_amount")  # target exists
    with pytest.raises(ValueError):
        t.rename_column("o_custkey", "o_totalprice")  # physical in use
    with pytest.raises(ValueError):
        t.add_column("o_totalprice", T.DoubleType())  # physical in use
    # rename + widen compose
    t.rename_column("o_custkey", "o_cust")
    # drop of a renamed column retires the PHYSICAL name too
    t.drop_column("o_cust")
    with pytest.raises(ValueError):
        t.add_column("o_custkey", T.LongType())
    # survives reopen
    from lineage_store_database_management_system_spark.lineage import LineageTable

    t.close()
    t2 = LineageTable.load(spark, t.path)
    assert "o_amount" in t2.user_cols
    assert t2.current_view().where("o_amount = 0.0").count() == 10


def test_rename_blocked_by_check_constraint(tmp_db, spark):
    src = spark.createDataFrame(
        [(1, 5), (2, 7)],
        T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
        ),
    )
    t = tmp_db.create_table_typed("ck_t", src.schema, "k")
    t.ingest_dataframe(src)
    t.add_check_constraint("v_pos", "v > 0")
    with pytest.raises(ValueError):
        t.rename_column("v", "val")
    t.drop_check_constraint("v_pos")
    t.rename_column("v", "val")
    assert t.current_view().agg(F.sum("val")).first()[0] == 12
