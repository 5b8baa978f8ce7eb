"""Round-11 fourth batch: batch filtered ANN (per-query filter values
in one job)."""

from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import similarity


def _labeled(spark, n=600):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.when(F.col("id") % 3 == 0, -8.0)
             .when(F.col("id") % 3 == 1, 0.0)
             .otherwise(8.0)
             + F.sin((F.col("id") + 1) * 0.37)).cast("float"),
            F.sin((F.col("id") + 1) * 0.53).cast("float"),
            F.sin((F.col("id") + 1) * 0.71).cast("float"),
            F.sin((F.col("id") + 1) * 0.97).cast("float"),
        ).alias("embedding"),
        (F.col("id") % 4).cast("int").alias("label"),
    )


def test_batch_filtered_matches_per_query_exact(spark):
    df = _labeled(spark)
    cents = similarity.ivf_centroids(df, n_lists=4, sample_n=256)
    assigned = similarity.ivf_assign(df, cents)
    hist = similarity.ivf_filter_histogram(assigned, "label")
    queries = spark.createDataFrame(
        [
            (0, [8.0, 0.0, 0.0, 0.0], 1),
            (1, [-8.0, 0.0, 0.0, 0.0], 2),
            (2, [0.0, 1.0, 0.0, 0.0], 3),
        ],
        "q_id long, q_embedding array<float>, q_filter int",
    )
    got = similarity.ivf_filtered_topk_batch(
        assigned, queries, cents, "label", k=5,
        histogram=hist, min_candidates=600, round_to=4,
    )
    rows = got.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r["vec_id"])
    # min_candidates=600 forces every query to probe ALL lists, so
    # each query's answer must equal its exact filtered top-k
    for qid, qvec, qval in [
        (0, [8.0, 0.0, 0.0, 0.0], 1),
        (1, [-8.0, 0.0, 0.0, 0.0], 2),
        (2, [0.0, 1.0, 0.0, 0.0], 3),
    ]:
        exact = similarity.filtered_topk(
            df, qvec, F.col("label") == qval, k=5, round_to=4
        )
        assert by_q[qid] == [r["vec_id"] for r in exact.collect()], qid
    # and every returned row satisfies ITS query's filter
    lab = {r["vec_id"]: r["label"] for r in df.collect()}
    want = {0: 1, 1: 2, 2: 3}
    for r in rows:
        assert lab[r["vec_id"]] == want[r["q_id"]]


def test_batch_filtered_escalation_is_per_query(spark):
    df = _labeled(spark)
    cents = similarity.ivf_centroids(df, n_lists=4, sample_n=256)
    assigned = similarity.ivf_assign(df, cents)
    hist = similarity.ivf_filter_histogram(assigned, "label")
    # label 3 lives only in the +8 blob (ids % 3 == 2 and % 4 == 3);
    # a query at -8 filtering label 3 must escalate to reach it while
    # a query at +8 filtering label 2 stops in its own lists
    queries = spark.createDataFrame(
        [(0, [-8.0, 0.0, 0.0, 0.0], 3), (1, [8.0, 0.0, 0.0, 0.0], 2)],
        "q_id long, q_embedding array<float>, q_filter int",
    )
    got = similarity.ivf_filtered_topk_batch(
        assigned, queries, cents, "label", k=3,
        histogram=hist, min_candidates=20, round_to=4,
    )
    rows = got.collect()
    assert {r["q_id"] for r in rows} == {0, 1}
    assert len([r for r in rows if r["q_id"] == 0]) == 3
