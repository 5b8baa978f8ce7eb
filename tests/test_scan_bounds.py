"""scan_with_bounds: exact general-column data skipping.

The sound-skipping contract: a base/snapshot file whose stats exclude
the bound is skipped ONLY when no post-watermark tail delta set the
column for any of its rids — otherwise a row updated INTO the bound
would vanish. Tests plant exactly that hazard.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mk(tmp_db, name):
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    return tmp_db.create_table_typed(name, schema, "k")


def _ingest_ranges(spark, t, n_per, n_commits):
    for i in range(n_commits):
        t.ingest_dataframe(
            spark.range(i * n_per, (i + 1) * n_per).select(
                F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
            )
        )


def _truth(t, lo, hi):
    return sorted(
        (r["k"], r["v"])
        for r in t.current_view()
        .where((F.col("v") >= lo) & (F.col("v") <= hi))
        .collect()
    )


def test_skipping_engages_and_is_exact(spark, tmp_db):
    t = _mk(tmp_db, "sb1")
    _ingest_ranges(spark, t, 500, 4)  # v ranges disjoint per commit
    got = sorted(
        (r["k"], r["v"]) for r in t.scan_with_bounds("v", 100.0, 220.0).collect()
    )
    assert got == _truth(t, 100.0, 220.0) and len(got) > 0
    acct = t.last_scan_bounds
    assert acct["files_scanned"] < acct["files_total"], acct
    assert acct["dirty_rids"] == 0


def test_dirty_rid_blocks_unsound_skip(spark, tmp_db):
    t = _mk(tmp_db, "sb2")
    _ingest_ranges(spark, t, 500, 4)
    # k=1900 lives in the last commit's file (v=2850, far outside the
    # bound); update moves it INTO the bound — the file must be kept
    t.bulk_update(spark.createDataFrame([Row(k=1900, v=150.0)], "k long, v double"))
    got = {r["k"]: r["v"] for r in t.scan_with_bounds("v", 100.0, 220.0).collect()}
    assert got[1900] == 150.0
    assert t.last_scan_bounds["dirty_rids"] == 1
    # a row updated OUT of the bound must not appear
    t.bulk_update(spark.createDataFrame([Row(k=150, v=9e9)], "k long, v double"))
    got2 = {r["k"]: r["v"] for r in t.scan_with_bounds("v", 100.0, 220.0).collect()}
    assert 150 not in got2 and got2[1900] == 150.0


def test_after_zorder_compact_snapshot_skips(spark, tmp_db):
    t = _mk(tmp_db, "sb3")
    _ingest_ranges(spark, t, 500, 4)
    t.bulk_delete(spark.createDataFrame([Row(k=110)], "k long"))
    t.compact(zorder_by=["v"], max_records_per_file=300)
    got = sorted(
        (r["k"], r["v"]) for r in t.scan_with_bounds("v", 100.0, 220.0).collect()
    )
    assert got == _truth(t, 100.0, 220.0)
    acct = t.last_scan_bounds
    assert acct["files_scanned"] < acct["files_total"], acct


def test_key_column_delegates(spark, tmp_db):
    t = _mk(tmp_db, "sb4")
    _ingest_ranges(spark, t, 500, 2)
    got = sorted(r["k"] for r in t.scan_with_bounds("k", 10, 20).collect())
    assert got == list(range(10, 21))


def test_open_bounds_and_strings(spark, tmp_db):
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("s", T.StringType())]
    )
    t = tmp_db.create_table_typed("sb5", schema, "k")
    for i in range(3):
        t.ingest_dataframe(
            spark.range(i * 100, (i + 1) * 100).select(
                F.col("id").alias("k"),
                F.format_string("s%05d", F.col("id")).alias("s"),
            )
        )
    got = sorted(r["s"] for r in t.scan_with_bounds("s", "s00250", None).collect())
    assert got == [f"s{i:05d}" for i in range(250, 300)]
    assert t.last_scan_bounds["files_scanned"] < t.last_scan_bounds["files_total"]


def test_multi_bounds_conjunctive_and_exact(spark, tmp_db):
    from pyspark.sql import Row

    t = _mk(tmp_db, "sb6")
    _ingest_ranges(spark, t, 500, 4)
    # dirty hazard on ONE of the bounded columns blocks skipping for
    # that file but the answer stays exact
    t.bulk_update(spark.createDataFrame([Row(k=1900, v=150.0)], "k long, v double"))
    got = sorted(
        (r["k"], r["v"])
        for r in t.scan_with_multi_bounds(
            {"v": (100.0, 220.0), "k": (50, 1950)}
        ).collect()
    )
    view = t.current_view()
    want = sorted(
        (r["k"], r["v"])
        for r in view.where(
            (F.col("v") >= 100.0) & (F.col("v") <= 220.0)
            & (F.col("k") >= 50) & (F.col("k") <= 1950)
        ).collect()
    )
    assert got == want and (1900, 150.0) in got
    assert t.last_scan_bounds["dirty_rids"] == 1
