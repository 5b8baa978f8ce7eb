"""Wear-level soak: many rounds of ingest / dependent mutations /
compaction / vacuum against a model-checked expected state. The crash
tests (test_cross_process) prove single transitions survive violence;
this proves the storage layout doesn't degrade or drift over a LONG
alternation of every maintenance operation — the failure mode being a
tail/compaction bookkeeping bug that only manifests several
generations in (e.g. a seq floor moving wrong after the Nth vacuum).
"""

import os
import tempfile

from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.catalog import Database


def _state(t) -> dict[int, float]:
    return {
        r["k"]: r["v"]
        for r in t.current_view().select(
            F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v")
        ).collect()
    }


def test_soak_rounds_model_checked(spark, sf_dir):
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    root = tempfile.mkdtemp(prefix="lss_soak_")
    db = Database().open(root, spark)
    t = db.create_table_typed("soak", src.schema, "o_orderkey")
    t.ingest_dataframe(src)

    # driver-side model of (key -> totalprice)
    model = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in src.select("o_orderkey", "o_totalprice").collect()
    }

    for rnd in range(8):
        mod = 3 + (rnd % 5)  # varying key slices each round
        # update: keys % mod == 0 get +rnd+1
        upd_keys = [k for k in model if k % mod == 0]
        t.bulk_update(
            src.where(F.col("o_orderkey") % mod == 0)
            .select("o_orderkey")
            .withColumn("o_totalprice", F.lit(float(rnd + 1)))
        )
        for k in upd_keys:
            model[k] = float(rnd + 1)
        # delete: keys % 50 == rnd (small slice)
        del_keys = [k for k in model if k % 50 == rnd]
        t.bulk_delete(
            src.where(F.col("o_orderkey") % 50 == rnd).select("o_orderkey")
        )
        for k in del_keys:
            model.pop(k, None)
        # alternate maintenance ops
        if rnd % 2 == 1:
            t.compact()
        if rnd % 3 == 2:
            t.vacuum_tail()
            t.vacuum_snapshots()
        got = _state(t)
        assert got == model, (
            f"round {rnd}: {len(got)} rows vs model {len(model)}; "
            f"sample diff: "
            f"{dict(list({k: (got.get(k), model.get(k)) for k in set(got) ^ set(model) or set(list(model)[:3])}.items())[:5])}"
        )

    # survive a close/reopen after the full soak
    db2 = Database().open(root, spark)
    t2 = db2.get_table("soak")
    assert _state(t2) == model
