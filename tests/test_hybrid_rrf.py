"""Reciprocal-rank fusion (round 12): deterministic hybrid-search
composition of two top-k lists."""

from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import similarity


def _lists(spark):
    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0), (4, 6.0)], ["doc_id", "s1"])
    b = spark.createDataFrame(
        [(3, 0.99), (5, 0.95), (1, 0.90), (6, 0.85)], ["doc_id", "s2"])
    return a, b


def test_rrf_scores_and_order(spark):
    a, b = _lists(spark)
    got = similarity.hybrid_topk_rrf(a, "s1", b, "s2", k=10).collect()
    scores = {r["doc_id"]: r["rrf"] for r in got}
    # doc 1: rank 1 in a, rank 3 in b; doc 3: rank 3 in a, rank 1 in b
    expect_13 = round(1 / 61 + 1 / 63, 6)
    assert scores[1] == expect_13 and scores[3] == expect_13
    # docs in one list only contribute a single term
    assert scores[2] == round(1 / 62, 6)
    assert scores[5] == round(1 / 62, 6)
    # fused order: docs in both lists first, ties broken by id
    assert [r["doc_id"] for r in got][:2] == [1, 3]


def test_rrf_k_and_disjoint_lists(spark):
    a = spark.createDataFrame([(i, float(10 - i)) for i in range(5)],
                              ["doc_id", "s1"])
    b = spark.createDataFrame([(i + 100, float(10 - i)) for i in range(5)],
                              ["doc_id", "s2"])
    got = similarity.hybrid_topk_rrf(a, "s1", b, "s2", k=4).collect()
    assert len(got) == 4
    # equal ranks across disjoint lists -> id tiebreak interleaves
    assert [r["doc_id"] for r in got] == [0, 100, 1, 101]


def test_rrf_score_ties_break_by_id_rank(spark):
    # identical scores within a list: rank must still be total (id
    # order), so fusion stays deterministic
    a = spark.createDataFrame([(7, 1.0), (3, 1.0), (5, 1.0)],
                              ["doc_id", "s1"])
    b = spark.createDataFrame([(5, 2.0)], ["doc_id", "s2"])
    got = similarity.hybrid_topk_rrf(a, "s1", b, "s2", k=3).collect()
    assert [r["doc_id"] for r in got] == [5, 3, 7]
