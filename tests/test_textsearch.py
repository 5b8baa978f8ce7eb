"""Trigram inverted-index substring search (round 11): exact
contains() answers from posting-list intersection + verify, never a
blind full-corpus scan."""

from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import textsearch


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
        (2, "a quick brown dog outpaces a quick fox"),
        (3, "sphinx of black quartz judge my vow"),
        (4, "the five boxing wizards jump quickly"),
        (5, ""),
        (6, "qu"),  # shorter than a trigram
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def _truth(spark, pattern):
    return _ids(_docs(spark).where(F.col("text").contains(pattern)))


def test_postings_are_distinct_per_doc(spark):
    docs = _docs(spark)
    p = textsearch.trigram_postings(docs)
    assert (
        p.groupBy("doc_id", "gram").count().where(F.col("count") > 1).count() == 0
    )
    # doc 6 ("qu") and doc 5 ("") contribute nothing
    assert p.where(F.col("doc_id").isin([5, 6])).count() == 0


def test_index_search_matches_full_scan(spark):
    docs = _docs(spark)
    postings = textsearch.trigram_postings(docs)
    stats = textsearch.trigram_stats(postings)
    for pattern in ["quick brown", "five", "jump", "the quick brown fox"]:
        got, info = textsearch.substring_search(
            docs, pattern, postings=postings, stats=stats
        )
        assert info["strategy"] == "index"
        assert _ids(got) == _truth(spark, pattern), pattern


def test_rarest_grams_chosen(spark):
    docs = _docs(spark)
    postings = textsearch.trigram_postings(docs)
    stats = textsearch.trigram_stats(postings)
    got, info = textsearch.substring_search(
        docs, "quick brown fox", postings=postings, stats=stats, n_probe_grams=2
    )
    df_map = {
        r["gram"]: r["df"]
        for r in stats.where(
            F.col("gram").isin(textsearch.pattern_grams("quick brown fox"))
        ).collect()
    }
    chosen = info["probe_grams"]
    worst_chosen = max(df_map[g] for g in chosen)
    best_skipped = min(v for g, v in df_map.items() if g not in chosen)
    assert worst_chosen <= best_skipped
    assert _ids(got) == _truth(spark, "quick brown fox")


def test_absent_gram_short_circuits_to_empty(spark):
    docs = _docs(spark)
    postings = textsearch.trigram_postings(docs)
    stats = textsearch.trigram_stats(postings)
    got, info = textsearch.substring_search(
        docs, "zzz_not_here", postings=postings, stats=stats
    )
    assert info["strategy"] == "index"
    assert got.count() == 0


def test_short_pattern_falls_back_to_scan(spark):
    docs = _docs(spark)
    got, info = textsearch.substring_search(docs, "qu")
    assert info["strategy"] == "scan"
    assert _ids(got) == _truth(spark, "qu")


def test_no_false_negatives_without_stats(spark):
    docs = _docs(spark)
    got, info = textsearch.substring_search(docs, "boxing wizards")
    assert info["strategy"] == "index"
    assert _ids(got) == _truth(spark, "boxing wizards")


def test_unselective_pattern_plans_a_scan(spark):
    docs = _docs(spark)
    postings = textsearch.trigram_postings(docs)
    stats = textsearch.trigram_stats(postings)
    # "the " appears in most docs -> min_df exceeds 5% of the corpus
    got, info = textsearch.substring_search(
        docs, "the ", postings=postings, stats=stats, n_docs=7
    )
    assert info["strategy"] == "scan" and info["reason"] == "unselective"
    assert _ids(got) == _truth(spark, "the ")


def test_index_meta_ndocs_additive(spark, tmp_path):
    idx = str(tmp_path / "trgm_meta")
    textsearch.write_trigram_index(_docs(spark), idx)
    assert textsearch.trigram_index_ndocs(idx) == 7
    extra = spark.createDataFrame([(10, "more alpha text")], ["doc_id", "text"])
    textsearch.append_trigram_index(extra, idx)
    assert textsearch.trigram_index_ndocs(idx) == 8


# --- round 12: delete/update reconciliation -------------------------

def test_deleted_docs_never_surface(spark, tmp_path):
    idx = str(tmp_path / "trgm_del")
    docs = _docs(spark)
    textsearch.write_trigram_index(docs, idx)
    dead = spark.createDataFrame([(0,), (2,)], ["doc_id"])
    n = textsearch.delete_from_trigram_index(dead, idx)
    assert n == 2
    postings, stats = textsearch.open_trigram_index(spark, idx)
    # even verifying against the STALE corpus snapshot, tombstoned
    # docs produce no candidates
    got, info = textsearch.substring_search(
        docs, "quick brown", postings=postings, stats=stats
    )
    assert info["strategy"] == "index"
    assert _ids(got) == []  # only docs 0 and 2 matched; both deleted
    got2, _ = textsearch.substring_search(
        docs, "five", postings=postings, stats=stats
    )
    assert _ids(got2) == [1, 4]  # untouched docs still found
    rep = textsearch.trigram_index_staleness(idx)
    assert rep["n_dead"] == 2 and rep["n_docs"] == 5


def test_updated_doc_found_under_new_text_not_old(spark, tmp_path):
    idx = str(tmp_path / "trgm_upd")
    docs = _docs(spark)
    textsearch.write_trigram_index(docs, idx)
    changed = spark.createDataFrame(
        [(1, "pack my crate with seven flagons of mead")],
        ["doc_id", "text"],
    )
    textsearch.update_trigram_index(changed, idx)
    current = docs.where("doc_id != 1").unionByName(changed)
    postings, stats = textsearch.open_trigram_index(spark, idx)
    # new text IS found (the false-negative hazard without re-index)
    got, info = textsearch.substring_search(
        current, "flagons", postings=postings, stats=stats
    )
    assert info["strategy"] == "index" and _ids(got) == [1]
    # old text no longer produces doc 1, even against the stale corpus
    got2, _ = textsearch.substring_search(
        docs, "liquor jugs", postings=postings, stats=stats
    )
    assert _ids(got2) == []


def test_compaction_sweeps_tombstones_and_heals_stats(spark, tmp_path):
    idx = str(tmp_path / "trgm_cmp")
    docs = _docs(spark)
    textsearch.write_trigram_index(docs, idx)
    dead = spark.createDataFrame([(0,), (2,), (4,)], ["doc_id"])
    textsearch.delete_from_trigram_index(dead, idx)
    # 3 of 7 dead -> above the 0.2 default threshold
    rep = textsearch.compact_trigram_index(spark, idx)
    assert rep["compacted"] is True
    assert textsearch.trigram_tombstones(spark, idx) is None
    rep2 = textsearch.trigram_index_staleness(idx)
    assert rep2["n_dead"] == 0 and rep2["n_docs"] == 4
    postings, stats = textsearch.open_trigram_index(spark, idx)
    # postings hold no trace of the dead docs
    assert postings.where(F.col("doc_id").isin([0, 2, 4])).count() == 0
    # stats rebuilt from live postings only: "qui" (quick/quickly,
    # docs 0/2/4 — all dead) drops out of the vocabulary entirely,
    # while "iqu" survives at df=1 through doc 1's "liquor"
    assert stats.where(F.col("gram") == "qui").count() == 0
    iqu = stats.where(F.col("gram") == "iqu").collect()
    assert iqu and iqu[0]["df"] == 1
    got, _ = textsearch.substring_search(
        docs.where("doc_id != 0 and doc_id != 2 and doc_id != 4"),
        "five", postings=postings, stats=stats,
    )
    assert _ids(got) == [1]
    # below-threshold compaction is a metadata no-op
    rep3 = textsearch.compact_trigram_index(spark, idx)
    assert rep3["compacted"] is False


def test_compaction_noop_below_threshold(spark, tmp_path):
    idx = str(tmp_path / "trgm_noop")
    textsearch.write_trigram_index(_docs(spark), idx)
    rep = textsearch.compact_trigram_index(spark, idx)
    assert rep["compacted"] is False and rep["dead_fraction"] == 0.0
    # force sweeps regardless
    rep2 = textsearch.compact_trigram_index(spark, idx, force=True)
    assert rep2["compacted"] is True


# --- round 12: fuzzy (trigram-Jaccard) similarity search ------------

def _jaccard(a, b):
    def grams(s):
        return {s[i:i + 3] for i in range(max(len(s) - 2, 0))}
    ga, gb = grams(a), grams(b)
    return len(ga & gb) / len(ga | gb) if ga | gb else 0.0


def test_fuzzy_matches_exact_jaccard(spark):
    docs = _docs(spark)
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    query = "quick brown"
    got, info = textsearch.fuzzy_similarity_search(docs, query, threshold=0.2)
    res = {r["doc_id"]: r["similarity"] for r in got.collect()}
    want = {
        d: round(_jaccard(query, t), 4)
        for d, t in rows.items()
        if _jaccard(query, t) >= 0.2
    }
    assert res == want and 0 in res and 2 in res
    assert info["strategy"] == "index"


def test_fuzzy_pruning_no_false_negatives(spark):
    # a permissive threshold with an off-by-one-ish query: every doc
    # meeting the threshold must appear despite candidate pruning
    docs = _docs(spark)
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    query = "jumps quickly"
    got, _ = textsearch.fuzzy_similarity_search(docs, query, threshold=0.1)
    res = set(r["doc_id"] for r in got.collect())
    want = {d for d, t in rows.items() if _jaccard(query, t) >= 0.1}
    assert res == want


def test_fuzzy_respects_tombstones_via_index(spark, tmp_path):
    idx = str(tmp_path / "trgm_fz")
    docs = _docs(spark)
    textsearch.write_trigram_index(docs, idx)
    textsearch.delete_from_trigram_index(
        spark.createDataFrame([(0,)], ["doc_id"]), idx)
    postings, _stats = textsearch.open_trigram_index(spark, idx)
    got, _ = textsearch.fuzzy_similarity_search(
        docs, "quick brown", threshold=0.2, postings=postings)
    assert 0 not in {r["doc_id"] for r in got.collect()}
    assert 2 in {r["doc_id"] for r in got.collect()}


def test_fuzzy_short_query_empty(spark):
    got, info = textsearch.fuzzy_similarity_search(_docs(spark), "qu")
    assert got.count() == 0 and info["strategy"] == "empty"
