"""Expectations/quarantine layer (round 11): validation that splits
instead of aborting, ANSI-aligned with the CHECK constraint layer."""

import os

import pytest
from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import expectations as X


RULES = {
    "price_nonneg": "price >= 0",
    "qty_bounded": "qty BETWEEN 1 AND 100",
}


def _batch(spark):
    rows = [
        (1, 10.0, 5),       # clean
        (2, -3.0, 5),       # price violation
        (3, 10.0, 0),       # qty violation
        (4, -1.0, 999),     # both
        (5, None, 5),       # NULL price -> UNKNOWN -> passes (ANSI)
    ]
    return spark.createDataFrame(rows, "id int, price double, qty int")


def test_split_and_tags(spark):
    good, bad, metrics = X.apply_expectations(_batch(spark), RULES)
    assert sorted(r["id"] for r in good.collect()) == [1, 5]
    tags = {r["id"]: sorted(r[X.VIOLATIONS_COL]) for r in bad.collect()}
    assert tags == {
        2: ["price_nonneg"],
        3: ["qty_bounded"],
        4: ["price_nonneg", "qty_bounded"],
    }
    assert metrics == {
        "rows": 5,
        "rows_bad": 3,
        "violations": {"price_nonneg": 2, "qty_bounded": 2},
    }


def test_null_passes_like_check_layer(spark):
    good, bad, _ = X.apply_expectations(
        _batch(spark).where("id = 5"), RULES
    )
    assert good.count() == 1 and bad.count() == 0


def test_fail_mode_raises(spark):
    with pytest.raises(X.ExpectationViolation):
        X.apply_expectations(_batch(spark), RULES, mode="fail")
    # clean input -> no raise
    good, bad, m = X.apply_expectations(
        _batch(spark).where("id IN (1, 5)"), RULES, mode="fail"
    )
    assert m["rows_bad"] == 0


def test_ingest_with_expectations_quarantines(spark, tmp_db):
    src = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).cast("double").alias("price"),
        F.when(F.col("id") % 25 == 3, -5).otherwise(2).alias("qty"),
    )
    t = tmp_db.create_table_typed("q_orders", src.schema, "k")
    metrics = X.ingest_with_expectations(t, src, RULES)
    # ids 3, 28, 53, 78 have qty -5
    assert metrics["rows"] == 100 and metrics["rows_bad"] == 4
    assert t.current_view().count() == 96
    qdir = metrics["quarantine_dir"]
    assert qdir and os.path.isdir(qdir)
    quar = spark.read.parquet(qdir)
    assert sorted(r["k"] for r in quar.collect()) == [3, 28, 53, 78]
    # quarantine is uniformly batch=... partitioned (ADVICE r12: a
    # root/subdir mix broke spark.read.parquet on the area), so the
    # batch id rides along as a partition column
    assert set(quar.columns) == {"k", "price", "qty", X.VIOLATIONS_COL, "batch"}
    # quarantine area is invisible to the table's own scans
    assert t.current_view().where("qty < 0").count() == 0


def test_quarantine_dir_empty_when_clean(spark, tmp_db):
    src = spark.range(10).select(
        F.col("id").alias("k"),
        F.lit(1.0).alias("price"),
        F.lit(2).alias("qty"),
    )
    t = tmp_db.create_table_typed("q_clean", src.schema, "k")
    metrics = X.ingest_with_expectations(t, src, RULES)
    assert metrics["rows_bad"] == 0 and metrics["quarantine_dir"] is None
    assert t.current_view().count() == 10
