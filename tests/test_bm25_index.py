"""Durable BM25 index (round 12): the inverted-index form of
textops.bm25_topk — query work scales with the query terms' posting
lists, and the index path must reproduce the scan path exactly,
including under appends, deletes, and updates."""

from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import textops, textsearch


def _docs(spark, extra=()):
    rows = [
        (0, "join the filter merge join join"),
        (1, "filter tables then merge results"),
        (2, "a plain sentence with no keywords"),
        (3, "merge merge merge"),
        (4, "join filter"),
        (5, ""),
        (6, "the join of all joins is a join"),
    ] + list(extra)
    return spark.createDataFrame(rows, ["doc_id", "text"])


TERMS = ["join", "filter", "merge"]


def _rows(df):
    return [(r["doc_id"], r["bm25"]) for r in df.collect()]


def test_index_matches_scan_path(spark, tmp_path):
    idx = str(tmp_path / "bm")
    docs = _docs(spark)
    textsearch.write_bm25_index(docs, idx)
    got = textsearch.bm25_topk_from_index(spark, idx, TERMS, k=10)
    want = textops.bm25_topk(docs, "doc_id", "text", TERMS, k=10)
    assert _rows(got) == _rows(want)


def test_append_matches_rebuilt_scan(spark, tmp_path):
    idx = str(tmp_path / "bm_app")
    base = _docs(spark)
    textsearch.write_bm25_index(base, idx)
    extra = spark.createDataFrame(
        [(100, "join merge"), (101, "nothing relevant here")],
        ["doc_id", "text"],
    )
    textsearch.append_bm25_index(extra, idx)
    whole = base.unionByName(extra)
    got = textsearch.bm25_topk_from_index(spark, idx, TERMS, k=10)
    want = textops.bm25_topk(whole, "doc_id", "text", TERMS, k=10)
    assert _rows(got) == _rows(want)


def test_delete_matches_scan_of_survivors(spark, tmp_path):
    idx = str(tmp_path / "bm_del")
    docs = _docs(spark)
    textsearch.write_bm25_index(docs, idx)
    dead = spark.createDataFrame([(0,), (3,)], ["doc_id"])
    n = textsearch.delete_from_bm25_index(dead, idx)
    assert n == 2
    live = docs.where("doc_id NOT IN (0, 3)")
    got = textsearch.bm25_topk_from_index(spark, idx, TERMS, k=10)
    # n_docs, avgdl, df, and every score must reflect the live corpus
    want = textops.bm25_topk(live, "doc_id", "text", TERMS, k=10)
    assert _rows(got) == _rows(want)


def test_update_matches_scan_of_current(spark, tmp_path):
    idx = str(tmp_path / "bm_upd")
    docs = _docs(spark)
    textsearch.write_bm25_index(docs, idx)
    changed = spark.createDataFrame(
        [(2, "join join filter now full of keywords")],
        ["doc_id", "text"],
    )
    textsearch.update_bm25_index(changed, idx)
    current = docs.where("doc_id != 2").unionByName(changed)
    got = textsearch.bm25_topk_from_index(spark, idx, TERMS, k=10)
    want = textops.bm25_topk(current, "doc_id", "text", TERMS, k=10)
    assert _rows(got) == _rows(want)
    # the updated doc now ranks (it scores on join+filter)
    assert 2 in {d for d, _ in _rows(got)}


def test_compaction_invariant_answers(spark, tmp_path):
    idx = str(tmp_path / "bm_cmp")
    docs = _docs(spark)
    textsearch.write_bm25_index(docs, idx)
    textsearch.delete_from_bm25_index(
        spark.createDataFrame([(0,), (1,)], ["doc_id"]), idx)
    before = _rows(textsearch.bm25_topk_from_index(spark, idx, TERMS, k=10))
    rep = textsearch.compact_bm25_index(spark, idx)
    assert rep["compacted"] is True  # 2 of 7 dead > 0.2
    assert textsearch.trigram_tombstones(spark, idx) is None
    after = _rows(textsearch.bm25_topk_from_index(spark, idx, TERMS, k=10))
    assert before == after
    # postings hold no trace of the dead docs
    p, d = textsearch.open_bm25_index(spark, idx)
    assert p.where(F.col("doc_id").isin([0, 1])).count() == 0
    assert d.where(F.col("doc_id").isin([0, 1])).count() == 0


def test_batch_topk_matches_sequential(spark, tmp_path):
    """Batch BM25 answers equal Q single-query calls (same formula,
    rounding, ties) — and unknown-term queries return nothing without
    affecting the others."""
    from lineage_store_database_management_system_spark.operators import (
        textsearch as T,
    )

    idx = str(tmp_path / "bm25_batch")
    docs = spark.range(120).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 3 == 0, "join filter merge ").otherwise(
                "scan probe "
            ),
            F.lit("body text "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    T.write_bm25_index(docs, idx)
    out = T.bm25_topk_batch_from_index(
        spark, idx,
        {7: ["join", "filter"], 8: ["scan"], 9: ["zzzunknown"]},
        k=5,
    )
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append((r["doc_id"], r["bm25"]))
    assert 9 not in by_q  # unknown term: no postings, no rows
    for qid, terms in ((7, ["join", "filter"]), (8, ["scan"])):
        single = T.bm25_topk_from_index(spark, idx, terms, k=5)
        want = [(r["doc_id"], r["bm25"]) for r in single.collect()]
        assert sorted(by_q[qid]) == sorted(want)
