"""Stream-stream joins, streaming->lineage ingestion, IVF ANN."""

import pytest
from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.streaming import (
    read_events_stream,
    run_stream_once,
    stream_ingest_lineage,
    streaming_event_join,
)


def test_stream_stream_join_equals_batch(spark, sf_dir):
    ev1 = read_events_stream(spark, f"{sf_dir}/events.parquet")
    ev2 = read_events_stream(spark, f"{sf_dir}/events.parquet")
    got = run_stream_once(
        streaming_event_join(
            ev1.where(F.col("event_type") == "purchase"),
            ev2.where(F.col("event_type") == "click"),
        ),
        output_mode="append",
    )
    got_pairs = {
        (r["left_event_id"], r["right_event_id"]) for r in got.collect()
    }
    # batch twin: plain range join on the static frames
    from lineage_store_database_management_system_spark.sources.readers import load_star

    ev = load_star(spark, sf_dir)["events"]
    p = ev.where(F.col("event_type") == "purchase").alias("l")
    c = ev.where(F.col("event_type") == "click").alias("r")
    batch = p.join(
        c,
        F.expr(
            "l.user_id = r.user_id AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts"
        ),
    ).select(
        F.col("l.event_id").alias("le"), F.col("r.event_id").alias("re")
    )
    exp_pairs = {(r["le"], r["re"]) for r in batch.collect()}
    assert got_pairs == exp_pairs and len(exp_pairs) > 0


def test_stream_ingest_into_lineage_table(spark, sf_dir, tmp_db):
    ev_static = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    t = tmp_db.create_table_typed("events_ingested", schema, "event_id")
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    n_batches = stream_ingest_lineage(stream, t)
    assert n_batches >= 1
    view = t.current_view()
    assert view.count() == ev_static.count()
    # rids are unique and every event arrived exactly once
    meta = t.current_view(include_meta=True)
    assert meta.select("_rid").distinct().count() == ev_static.count()
    assert view.select(F.sum("user_id")).first()[0] == ev_static.select(
        F.sum("user_id")
    ).first()[0]


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    from lineage_store_database_management_system_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = [
        r["vec_id"]
        for r in similarity.brute_force_topk(emb, q, k=10).collect()
    ]
    cents = similarity.ivf_centroids(emb, n_lists=8)
    assigned = similarity.ivf_assign(emb, cents)
    # full probe = exact: nprobe == n_lists must reproduce brute force
    full = [
        r["vec_id"]
        for r in similarity.ivf_topk(assigned, q, cents, k=10, nprobe=8).collect()
    ]
    assert full == exact
    # partial probe keeps the query's own list -> top hit retained
    part = [
        r["vec_id"]
        for r in similarity.ivf_topk(assigned, q, cents, k=10, nprobe=2).collect()
    ]
    assert exact[0] in part
    recall = len(set(part) & set(exact)) / len(exact)
    assert recall >= 0.3, f"IVF nprobe=2 recall too low: {recall}"


def test_streaming_dedup_equals_batch(spark, sf_dir):
    """Duplicated stream -> dropDuplicatesWithinWatermark -> counts
    equal the batch distinct-by-id counts."""
    import os

    from lineage_store_database_management_system_spark.streaming import (
        read_events_stream,
        run_stream_once,
        streaming_dedup,
    )

    path = os.path.join(sf_dir, "events.parquet")
    ev = read_events_stream(spark, path)
    dup = ev.unionByName(ev)
    got = {
        r["event_type"]: r["count"]
        for r in run_stream_once(
            streaming_dedup(dup).groupBy("event_type").count(), output_mode="complete"
        ).collect()
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(path)
    exp = {
        r["event_type"]: r["count"]
        for r in batch.dropDuplicates(["event_id"]).groupBy("event_type").count().collect()
    }
    assert got == exp


def test_stream_ingest_checkpoint_restart_exactly_once(spark, tmp_path):
    """Kill the ingest stream AFTER a micro-batch's table commit but
    BEFORE its checkpoint commit (the at-least-once window), restart
    from the same checkpoint, and prove the lineage log is
    exactly-once: the replayed batch is detected via the idempotency
    marker + landed-data probe and skipped, the final view equals the
    batch twin, and no rid or event duplicates exist (VERDICT r4
    item 4)."""
    import glob
    import os

    from pyspark.sql import types as T

    from lineage_store_database_management_system_spark.catalog import Database

    # source: 6 separate parquet FILES -> 6 micro-batches at
    # maxFilesPerTrigger=1, deterministic batch boundaries
    src_dir = str(tmp_path / "src")
    schema = T.StructType(
        [T.StructField("event_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )
    for i in range(6):
        spark.range(i * 100, i * 100 + 100).selectExpr(
            "id as event_id", "cast(id as double) as value"
        ).coalesce(1).write.mode("append").parquet(src_dir)
    assert len(glob.glob(os.path.join(src_dir, "*.parquet"))) == 6

    db = Database().open(str(tmp_path / "db"), spark)
    t = db.create_table_typed("ev", schema, "event_id")

    def make_stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )

    # phase 1: crash in the at-least-once window of batch 2 — the
    # on_batch hook runs after the table commit, before the
    # checkpoint commit, exactly where a real failure duplicates data
    boom = {"armed": True}

    def inject(batch_id):
        if batch_id == 2 and boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected failure between table and checkpoint commit")

    with pytest.raises(Exception, match="injected failure"):
        stream_ingest_lineage(make_stream(), t, on_batch=inject)

    # batch 2's DATA is durably committed despite the crash
    assert t.current_view().count() == 300

    # phase 2: restart from the same checkpoint; Spark replays batch 2
    n2 = stream_ingest_lineage(make_stream(), t)
    assert n2 == 3, f"replayed batch was re-ingested (n2={n2})"

    # exactly-once: view equals the batch twin, no duplicates anywhere
    static = spark.read.parquet(src_dir)
    view = t.current_view()
    assert view.count() == static.count() == 600
    assert view.select("event_id").distinct().count() == 600
    assert (
        t.current_view(include_meta=True).select("_rid").distinct().count() == 600
    )
    assert (
        view.agg(F.sum("value")).first()[0] == static.agg(F.sum("value")).first()[0]
    )

    # marker reflects the last applied spark batch
    marker = t.manifest.extra["stream_ingest"]["default"]
    assert int(marker["stream_batch"]) == 5

    # idle restart: nothing to do, nothing ingested
    assert stream_ingest_lineage(make_stream(), t) == 0
    assert t.current_view().count() == 600



def test_stream_maintained_join_mv_checkpoint_restart(spark, tmp_path):
    """Stream-maintained join MV (VERDICT r5 item 4): ingest a stream
    into the fact side while incrementally refreshing the join MV each
    micro-batch; crash in the at-least-once window mid-stream, restart
    from the same checkpoint, and the drained MV must hash-equal the
    batch twin (direct join of the current views) with no duplicate
    pairs."""
    import glob
    import os

    from pyspark.sql import types as T

    from lineage_store_database_management_system_spark.catalog import Database
    from lineage_store_database_management_system_spark.streaming import (
        stream_maintain_join_mv,
    )

    src_dir = str(tmp_path / "src")
    schema = T.StructType([
        T.StructField("o_id", T.LongType()),
        T.StructField("o_cust", T.LongType()),
        T.StructField("o_amt", T.DoubleType()),
    ])
    for i in range(5):
        spark.range(i * 40, i * 40 + 40).selectExpr(
            "id as o_id", "id % 30 as o_cust", "cast(id as double) as o_amt"
        ).coalesce(1).write.mode("append").parquet(src_dir)
    assert len(glob.glob(os.path.join(src_dir, "*.parquet"))) == 5

    db = Database().open(str(tmp_path / "db"), spark)
    cust = spark.range(25).selectExpr("id as c_id", "id % 4 as c_seg")
    c = db.create_table_typed("cust", cust.schema, "c_id")
    c.ingest_dataframe(cust)
    o = db.create_table_typed("orders", schema, "o_id")
    # seed so the MV exists before the stream starts
    o.ingest_dataframe(
        spark.createDataFrame([(100000, 1, 0.5)], schema)
    )
    db.create_join_mv(
        "jmv", "orders", "cust", "o_cust", "c_id",
        left_cols=["o_id", "o_amt"], right_cols=["c_seg"],
    )

    def make_stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )

    def twin():
        return sorted(
            (r["o_id"], round(r["o_amt"], 6), r["c_id"], r["c_seg"])
            for r in o.current_view()
            .join(c.current_view(), F.col("o_cust") == F.col("c_id"))
            .select("o_id", "o_amt", "c_id", "c_seg")
            .collect()
        )

    def stored():
        return sorted(
            (r["o_id"], round(r["o_amt"], 6), r["c_id"], r["c_seg"])
            for r in db.materialized_view("jmv").collect()
        )

    # crash after batch 1's ingest+refresh, before its checkpoint commit
    boom = {"armed": True}

    def inject(batch_id):
        if batch_id == 1 and boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected failure before checkpoint commit")

    with pytest.raises(Exception, match="injected failure"):
        stream_maintain_join_mv(make_stream(), db, "jmv", "orders", on_batch=inject)

    # mid-crash state: MV already tracks the 2 committed batches
    assert stored() == twin()

    # restart from the same checkpoint: batch 1 replays -> skipped,
    # remaining 3 batches apply; drained MV equals the batch twin
    n2 = stream_maintain_join_mv(make_stream(), db, "jmv", "orders")
    assert n2 == 3, f"replayed batch was re-ingested (n2={n2})"
    assert db.refresh_join_mv("jmv") == "fresh"
    final = stored()
    assert final == twin()
    # no duplicate pairs and full coverage: every order with a live
    # customer appears exactly once (200 streamed + 1 seed, o_cust<25)
    assert len(final) == len(set(final))
    expect_n = (
        o.current_view().where(F.col("o_cust") < 25).count()
    )
    assert len(final) == expect_n

    # idle restart: no-op
    assert stream_maintain_join_mv(make_stream(), db, "jmv", "orders") == 0
    assert stored() == twin()
