"""Cross-run incremental dedup against persisted fingerprint / band
stores (operators/incremental.py)."""

import os

import pytest
from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import dedup, incremental


@pytest.fixture()
def store_dir(tmp_path):
    return os.path.join(str(tmp_path), "fp")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_batch_sequence_dedups_across_runs(spark, store_dir):
    b1 = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, "alpha beta gamma")])
    s1 = incremental.dedup_against_store(b1, "doc_id", "text", store_dir)
    # in-batch: doc 3 duplicates doc 1 -> min-id keeper wins
    assert sorted(r.doc_id for r in s1.collect()) == [1, 2]

    b2 = _docs(
        spark,
        [
            (10, "alpha beta gamma"),      # dup of stored doc 1
            (11, "eta theta iota"),        # fresh
            (12, "Delta  epsilon zeta"),   # dup of stored doc 2 after normalization
        ],
    )
    s2 = incremental.dedup_against_store(b2, "doc_id", "text", store_dir)
    assert sorted(r.doc_id for r in s2.collect()) == [11]

    # replay of batch 2: everything is stored now -> zero survivors
    replay = incremental.dedup_against_store(
        b2, "doc_id", "text", store_dir, update_store=False
    )
    assert replay.count() == 0


def test_survivors_stable_after_store_update(spark, store_dir):
    # the returned frame must not silently recompute against the
    # post-update store (refreshByPath recomputes persisted plans)
    incremental.update_fingerprint_store(
        _docs(spark, [(1, "one two three")]), "doc_id", "text", store_dir
    )
    batch = _docs(spark, [(5, "four five six"), (6, "one two three")])
    surv = incremental.dedup_against_store(batch, "doc_id", "text", store_dir)
    assert [r.doc_id for r in surv.collect()] == [5]
    assert [r.doc_id for r in surv.collect()] == [5]  # still, post-update


def test_update_store_idempotent(spark, store_dir):
    df = _docs(spark, [(1, "a b c"), (2, "d e f")])
    assert incremental.update_fingerprint_store(df, "doc_id", "text", store_dir) == 2
    assert incremental.update_fingerprint_store(df, "doc_id", "text", store_dir) == 0
    assert spark.read.parquet(store_dir).count() == 2


def test_store_is_bucket_partitioned(spark, store_dir):
    df = _docs(spark, [(i, f"document number {i}") for i in range(50)])
    incremental.update_fingerprint_store(df, "doc_id", "text", store_dir)
    buckets = [d for d in os.listdir(store_dir) if d.startswith("fpb=")]
    assert len(buckets) > 1  # bucket layout on disk (partition pruning works)
    st = spark.read.parquet(store_dir)
    assert st.count() == 50
    # digests recompute identically from the same text
    again = incremental.dedup_against_store(
        df, "doc_id", "text", store_dir, update_store=False
    )
    assert again.count() == 0


def test_minhash_store_candidates_and_no_self_pairs(spark, tmp_path):
    store = os.path.join(str(tmp_path), "bands")
    base = [(i, f"the quick brown fox jumps over lazy dog number {i} " * 3) for i in range(20)]
    incremental.update_minhash_store(_docs(spark, base), "doc_id", "text", store)

    batch = _docs(
        spark,
        [
            (100, base[3][1] + " extra"),   # near-clone of stored doc 3
            (101, "entirely different words with no overlap at all here today"),
        ],
    )
    cands = incremental.minhash_candidates_against_store(
        batch, "doc_id", "text", store, update_store=True
    )
    got = {(r.batch_id, r.store_id) for r in cands.collect()}
    assert (100, 3) in got
    assert all(b in (100, 101) for b, _ in got)  # batch ids on the left only
    # the result must NOT contain batch-vs-batch pairs even though the
    # store was updated with the batch afterwards
    assert (100, 100) not in got and (100, 101) not in got

    # store now contains the batch: replaying pairs the clone with
    # itself (and its source), proving the append landed
    replay = incremental.minhash_candidates_against_store(
        batch, "doc_id", "text", store, update_store=False
    )
    rg = {(r.batch_id, r.store_id) for r in replay.collect()}
    assert (100, 100) in rg and (100, 3) in rg


def test_minhash_store_seeds_from_corpus_sketch(spark, tmp_path):
    # a corpus-level sketch persisted via sketch_dir is the SAME
    # layout: candidates against it equal candidates against a store
    # built by update_minhash_store
    rows = [(i, f"shared common prefix words for document {i} " * 2) for i in range(10)]
    rows[5] = (5, rows[4][1])  # 4 and 5 identical
    corpus = _docs(spark, rows)
    sketch = os.path.join(str(tmp_path), "sketch")
    dedup.minhash_lsh_candidates(corpus, "doc_id", "text", sketch_dir=sketch)

    batch = _docs(spark, [(200, rows[4][1])])
    via_sketch = incremental.minhash_candidates_against_store(
        batch, "doc_id", "text", sketch, update_store=False
    )
    got = {(r.batch_id, r.store_id) for r in via_sketch.collect()}
    assert (200, 4) in got and (200, 5) in got


def test_cdc_ingest_dedup_loop(spark, tmp_path):
    import os

    from lineage_store_database_management_system_spark import Database

    db = Database().open(os.path.join(str(tmp_path), "db"), spark)
    docs1 = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon zeta")])
    t = db.create_table_typed("docs", docs1.schema, "doc_id")
    t.ingest_dataframe(docs1)
    store = os.path.join(str(tmp_path), "fp")

    s1, w1 = incremental.dedup_cdc_inserts(t, store, "doc_id", "text")
    assert sorted(r.doc_id for r in s1.collect()) == [1, 2]

    # second wave: one dup of wave 1, one fresh; only the fresh survives
    t.ingest_dataframe(_docs(spark, [(10, "alpha beta gamma"), (11, "eta theta iota")]))
    s2, w2 = incremental.dedup_cdc_inserts(t, store, "doc_id", "text")
    assert [r.doc_id for r in s2.collect()] == [11]
    assert w2[0] == w1[1]  # resumed exactly where wave 1 stopped

    # no new inserts -> empty window, nothing to dedup
    s3, w3 = incremental.dedup_cdc_inserts(t, store, "doc_id", "text")
    assert s3.count() == 0 and w3[0] == w2[1]

    # updates are not inserts: mutating wave-1 docs adds nothing
    t.bulk_update(_docs(spark, [(1, "alpha beta gamma EDITED")]))
    s4, _ = incremental.dedup_cdc_inserts(t, store, "doc_id", "text")
    assert s4.count() == 0


def test_simhash_store_candidates(spark, tmp_path):
    store = os.path.join(str(tmp_path), "sh")
    base = [(i, f"the quick brown fox jumps over the lazy dog variant {i} " * 4)
            for i in range(10)]
    incremental.update_simhash_store(_docs(spark, base), "doc_id", "text", store)
    batch = _docs(
        spark,
        [
            (100, base[2][1]),  # exact clone of stored doc 2 -> hamming 0
            (101, "totally different content with nothing shared at all whatsoever"),
        ],
    )
    cands = incremental.simhash_candidates_against_store(
        batch, "doc_id", "text", store, update_store=True
    )
    got = {(r.batch_id, r.store_id): r.hamming for r in cands.collect()}
    assert got[(100, 2)] == 0
    assert all(b in (100, 101) for b, _ in got)
    # replay after the append: the clone now also pairs with itself
    replay = incremental.simhash_candidates_against_store(
        batch, "doc_id", "text", store, update_store=False
    )
    rg = {(r.batch_id, r.store_id) for r in replay.collect()}
    assert (100, 100) in rg and (100, 2) in rg
