"""SQL DML surface (Database.execute_dml): clause-level parsing with
Spark's own parser for every expression, compiling to the bulk lineage
write paths."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mk(spark, tmp_db):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("s", T.StringType()),
        ]
    )
    t = tmp_db.create_table_typed("dml", schema, "k")
    t.ingest_dataframe(
        spark.range(100).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.0).alias("v"),
            F.format_string("s%03d", F.col("id")).alias("s"),
        )
    )
    return t


def test_update_multi_assign_with_expressions(spark, tmp_db):
    t = _mk(spark, tmp_db)
    rep = tmp_db.execute_dml(
        "UPDATE dml SET v = v * 2 + 1, s = upper(concat(s, '!')) "
        "WHERE k % 10 = 3 AND k < 50"
    )
    assert rep == {"op": "update", "table": "dml", "rows": 5}
    got = {r["k"]: (r["v"], r["s"]) for r in t.current_view().collect()}
    assert got[13] == (27.0, "S013!") and got[53] == (53.0, "s053")


def test_delete_and_insert_select(spark, tmp_db):
    t = _mk(spark, tmp_db)
    rep = tmp_db.execute_dml("DELETE FROM dml WHERE k >= 90;")
    assert rep["rows"] == 10
    tmp_db.register_views()
    rep = tmp_db.execute_dml(
        "INSERT INTO dml SELECT k + 1000 AS k, v, s FROM dml WHERE k < 3"
    )
    assert rep["rows"] == 3
    ks = sorted(r["k"] for r in t.current_view().collect())
    assert len(ks) == 93 and ks[-1] == 1002 and 90 not in ks


def test_insert_values_positional(spark, tmp_db):
    t = _mk(spark, tmp_db)
    rep = tmp_db.execute_dml(
        "INSERT INTO dml VALUES (500, 5.5, 'x'), (501, 6.5, 'y')"
    )
    assert rep["rows"] == 2
    got = {r["k"]: r["s"] for r in t.current_view().collect()}
    assert got[500] == "x" and got[501] == "y"


def test_errors(spark, tmp_db):
    _mk(spark, tmp_db)
    with pytest.raises(ValueError, match="unknown column"):
        tmp_db.execute_dml("UPDATE dml SET nope = 1 WHERE k = 1")
    with pytest.raises(ValueError, match="primary key"):
        tmp_db.execute_dml("UPDATE dml SET k = 1 WHERE k = 2")
    with pytest.raises(ValueError, match="unsupported DML"):
        tmp_db.execute_dml("MERGE INTO dml USING x ON 1=1")
    with pytest.raises(ValueError, match="arity"):
        tmp_db.execute_dml("INSERT INTO dml VALUES (1, 2.0)")


def test_nondeterministic_dml_count_matches_applied(spark, tmp_db):
    """Regression (r10 ADVICE, low): the reported row count and the
    applied batch must come from ONE evaluation of the plan, even when
    SET/WHERE uses a nondeterministic expression like rand()."""
    t = _mk(spark, tmp_db)
    rep = tmp_db.execute_dml("DELETE FROM dml WHERE rand(7) < 0.5")
    assert rep["rows"] == 100 - t.current_view().count()
    before = t.current_view().count()
    rep2 = tmp_db.execute_dml(
        "UPDATE dml SET v = rand() * 1000 WHERE rand(11) < 0.3"
    )
    # every counted row carries exactly one applied update delta
    upd = t.changes_between(-1).where("_op = 'U'").count()
    assert rep2["rows"] == upd
    assert t.current_view().count() == before  # updates never change n
