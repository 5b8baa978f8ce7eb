"""fast_min_max: stats-driven MIN/MAX over the current view.

Exactness contract under mutation (tail updates can overwrite the row
holding the extreme; tombstones can kill it) plus the scan-accounting
contract (``last_fast_minmax``): planted tail extremes -> zero base
files opened; idle table -> only the argmin/argmax files; a deleted
extreme forces a bounded re-scan that still lands on the truth.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mk(tmp_db, name, rows, key="k"):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("s", T.StringType()),
        ]
    )
    t = tmp_db.create_table_typed(name, schema, key)
    return t, schema


def _ingest_ranges(spark, t, n_per, n_commits):
    # disjoint key ranges per commit -> tight per-file key stats
    for i in range(n_commits):
        df = spark.range(i * n_per, (i + 1) * n_per).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.5).alias("v"),
            F.format_string("s%05d", F.col("id")).alias("s"),
        )
        t.ingest_dataframe(df)


def _truth(t, col):
    return (
        t.current_view()
        .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
        .first()
    )


@pytest.mark.parametrize("col", ["k", "v", "s"])
def test_idle_table_scans_only_extreme_files(spark, tmp_db, col):
    t, _ = _mk(tmp_db, f"mm_idle_{col}", None)
    _ingest_ranges(spark, t, 500, 4)
    got = t.fast_min_max(col).first()
    want = _truth(t, col)
    assert (got["mn"], got["mx"]) == (want["mn"], want["mx"])
    acct = t.last_fast_minmax
    # disjoint ranges: k/v/s all correlate with the commit ranges, so
    # the seed round's argmin+argmax files already prove the answer
    assert acct["files_scanned"] < acct["files_total"], acct
    assert acct["files_scanned"] <= 2, acct


def test_planted_tail_extremes_read_zero_base_files(spark, tmp_db):
    t, _ = _mk(tmp_db, "mm_planted", None)
    _ingest_ranges(spark, t, 500, 4)
    t.bulk_update(
        spark.createDataFrame(
            [Row(k=100, v=-9e9), Row(k=1500, v=9e9)],
            "k long, v double",
        )
    )
    got = t.fast_min_max("v").first()
    assert (got["mn"], got["mx"]) == (-9e9, 9e9)
    assert t.last_fast_minmax["files_scanned"] == 0, t.last_fast_minmax


def test_deleted_extreme_rescans_to_truth(spark, tmp_db):
    t, _ = _mk(tmp_db, "mm_delext", None)
    _ingest_ranges(spark, t, 500, 4)
    # kill the global min AND max rows; truth moves to neighbors
    t.bulk_delete(spark.createDataFrame([Row(k=0), Row(k=1999)], "k long"))
    got = t.fast_min_max("v").first()
    assert (got["mn"], got["mx"]) == (1.5, 1998 * 1.5)
    # the argmin/argmax files were dirty at the extreme but still hold
    # the neighbors, so one seed round suffices — and never a full scan
    assert t.last_fast_minmax["files_scanned"] <= 3, t.last_fast_minmax


def test_update_overwriting_extreme_is_exact(spark, tmp_db):
    t, _ = _mk(tmp_db, "mm_updext", None)
    _ingest_ranges(spark, t, 500, 4)
    # the row holding the global max gets a mid-range value: the true
    # max must come from a base row that is NOT the stats argmax
    t.bulk_update(
        spark.createDataFrame([Row(k=1999, v=100.0)], "k long, v double")
    )
    got = t.fast_min_max("v").first()
    assert (got["mn"], got["mx"]) == (0.0, 1998 * 1.5)


def test_compacted_plus_fresh_and_deletes(spark, tmp_db):
    t, _ = _mk(tmp_db, "mm_cmp", None)
    _ingest_ranges(spark, t, 500, 2)
    t.bulk_update(
        spark.createDataFrame([Row(k=3, v=7.25)], "k long, v double")
    )
    t.compact()
    _ingest_ranges(spark, t, 500, 4)  # re-ingests k in [0,2000) as new rids
    t.bulk_delete(spark.createDataFrame([Row(k=999)], "k long"))
    got = t.fast_min_max("v").first()
    want = _truth(t, "v")
    assert (got["mn"], got["mx"]) == (want["mn"], want["mx"])


def test_all_null_column(spark, tmp_db):
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    t = tmp_db.create_table_typed("mm_null", schema, "k")
    t.ingest_dataframe(
        spark.range(100).select(
            F.col("id").alias("k"), F.lit(None).cast("double").alias("v")
        )
    )
    got = t.fast_min_max("v").first()
    assert got["mn"] is None and got["mx"] is None


def test_renamed_column_uses_physical_stats(spark, tmp_db):
    t, _ = _mk(tmp_db, "mm_ren", None)
    _ingest_ranges(spark, t, 500, 4)
    t.rename_column("v", "val")
    got = t.fast_min_max("val").first()
    assert (got["mn"], got["mx"]) == (0.0, 1999 * 1.5)
    # stats are keyed by the physical (birth) name, so skipping still
    # engages through the rename mapping
    assert t.last_fast_minmax["files_scanned"] < t.last_fast_minmax["files_total"]


def test_nan_bearing_files_never_stats_skipped(spark, tmp_db):
    """Regression (r10 ADVICE, low): parquet-mr writes a NaN-poisoned
    footer max for float chunks containing NaN, and naive Python
    comparisons against NaN are always-False — a NaN-bearing file
    could be stats-skipped so fast_min_max's max disagreed with the
    full-scan agg (which returns NaN under Spark's NaN-greatest
    ordering). NaN stats are now dropped at entry-build time (the file
    self-excludes from pruning) and the bound fold is NaN-aware."""
    import math

    t, _ = _mk(tmp_db, "mm_nan", None)
    _ingest_ranges(spark, t, 300, 3)
    # a separate commit whose file holds NaN plus in-range values
    t.ingest_dataframe(
        spark.createDataFrame(
            [Row(k=9001, v=float("nan"), s="s-nan"),
             Row(k=9002, v=100.0, s="s-mid")],
            "k long, v double, s string",
        )
    )
    truth = _truth(t, "v")
    got = t.fast_min_max("v").first()
    assert math.isnan(truth["mx"]) and math.isnan(got["mx"])
    assert got["mn"] == truth["mn"]
    # min side still exact when an all-NaN file exists too
    t.ingest_dataframe(
        spark.createDataFrame(
            [Row(k=9003, v=float("nan"), s="s-nan2")],
            "k long, v double, s string",
        )
    )
    got2 = t.fast_min_max("v").first()
    assert math.isnan(got2["mx"]) and got2["mn"] == truth["mn"]
    # and a planted NaN-free table still zero-scans on a tail extreme
    t2, _ = _mk(tmp_db, "mm_nan_clean", None)
    _ingest_ranges(spark, t2, 300, 3)
    t2.bulk_update(
        spark.createDataFrame([Row(k=1, v=1e12)], "k long, v double")
    )
    t2.bulk_update(
        spark.createDataFrame([Row(k=2, v=-1e12)], "k long, v double")
    )
    got3 = t2.fast_min_max("v").first()
    assert (got3["mn"], got3["mx"]) == (-1e12, 1e12)
    assert t2.last_fast_minmax["files_scanned"] == 0
