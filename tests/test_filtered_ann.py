"""Filtered vector search (round 11): predicate + top-k with
metadata-driven strategy selection — prefilter brute force when the
filter is selective, predicate-aware nprobe escalation otherwise.
Extends the reference's single-dimension select/sum surface
(reference query.py:24-66 has no vector ops at all) along the
LLM-data-pipeline axis the brief demands."""

from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import similarity


def _labeled_blobs(spark):
    """600 vecs in 3 well-separated 4-d blobs (x = -10 / 0 / +10);
    label = blob id for 0/1, but blob 2 mixes labels 2 and 3 so one
    label ('3', 20 rows: id % 30 == 2) lives ONLY in the far blob."""
    return spark.range(600).select(
        F.col("id").alias("vec_id"),
        F.array(
            (
                F.when(F.col("id") % 3 == 0, -10.0)
                .when(F.col("id") % 3 == 1, 0.0)
                .otherwise(10.0)
                + F.sin((F.col("id") + 1) * 0.37)
            ).cast("float"),
            F.sin((F.col("id") + 1) * 0.53).cast("float"),
            F.sin((F.col("id") + 1) * 0.71).cast("float"),
            F.sin((F.col("id") + 1) * 0.97).cast("float"),
        ).alias("embedding"),
        F.when(F.col("id") % 3 == 0, 0)
        .when(F.col("id") % 3 == 1, 1)
        .when(F.col("id") % 10 == 2, 3)
        .otherwise(2)
        .alias("label"),
    )


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_histogram_counts_match_groupby(spark):
    df = _labeled_blobs(spark)
    cents = similarity.ivf_centroids(df, n_lists=4, sample_n=256)
    assigned = similarity.ivf_assign(df, cents)
    hist = similarity.ivf_filter_histogram(assigned, "label")
    truth = {
        (r["label"], r["_list"]): r["n"]
        for r in assigned.groupBy("label", "_list").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    flat = {(lab, li): n for lab, d in hist.items() for li, n in d.items()}
    assert flat == truth


def test_prefilter_strategy_is_exact(spark):
    df = _labeled_blobs(spark)
    cents = similarity.ivf_centroids(df, n_lists=4, sample_n=256)
    assigned = similarity.ivf_assign(df, cents)
    q = [10.0, 0.0, 0.0, 0.0]
    # label 3 has 20 rows -> under the threshold -> prefilter
    got, info = similarity.ivf_filtered_topk(
        assigned, q, cents, "label", 3, k=10, brute_threshold=128, round_to=4
    )
    assert info["strategy"] == "prefilter"
    assert info["total_matches"] == 20
    exact = similarity.filtered_topk(df, q, F.col("label") == 3, k=10, round_to=4)
    assert _ids(got) == _ids(exact)


def test_probe_strategy_escalates_to_cover_matches(spark):
    df = _labeled_blobs(spark)
    cents = similarity.ivf_centroids(df, n_lists=4, sample_n=256)
    assigned = similarity.ivf_assign(df, cents)
    hist = similarity.ivf_filter_histogram(assigned, "label")
    # query sits in the -10 blob; label 2 lives ONLY in the +10 blob,
    # so the nearest lists hold zero matches — a predicate-blind
    # nprobe=1 probe would return nothing. Escalation must walk out
    # to the matching lists before scanning.
    q = [-10.0, 0.0, 0.0, 0.0]
    got, info = similarity.ivf_filtered_topk(
        assigned, q, cents, "label", 2, k=10,
        histogram=hist, brute_threshold=8, min_candidates=80, round_to=4,
    )
    assert info["strategy"] == "probe"
    assert info["candidates_available"] >= 80
    rows = got.collect()
    assert len(rows) == 10
    # escalated far enough that the probe set holds every match ->
    # result is the exact filtered top-k
    exact = similarity.filtered_topk(df, q, "label = 2", k=10, round_to=4)
    assert _ids(got) == _ids(exact)


def test_probe_stops_early_when_near_lists_have_matches(spark):
    df = _labeled_blobs(spark)
    cents = similarity.ivf_centroids(df, n_lists=4, sample_n=256)
    assigned = similarity.ivf_assign(df, cents)
    hist = similarity.ivf_filter_histogram(assigned, "label")
    # label 1 (200 rows) lives in the query's own blob: the first
    # list already satisfies min_candidates, so NO escalation happens
    q = [0.0, 1.0, 0.0, 0.0]
    got, info = similarity.ivf_filtered_topk(
        assigned, q, cents, "label", 1, k=5,
        histogram=hist, brute_threshold=8, min_candidates=40, round_to=4,
    )
    assert info["strategy"] == "probe"
    assert len(info["probes"]) < 4
    exact = similarity.filtered_topk(df, q, F.col("label") == 1, k=5, round_to=4)
    assert _ids(got) == _ids(exact)


def test_filtered_topk_rows_all_match_predicate(spark):
    df = _labeled_blobs(spark)
    q = [0.0, 1.0, 0.0, 0.0]
    got = similarity.filtered_topk(df, q, "label = 0", k=7)
    ids = _ids(got)
    assert len(ids) == 7
    labels = {r["label"] for r in df.where(F.col("vec_id").isin(ids)).collect()}
    assert labels == {0}
