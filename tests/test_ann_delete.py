"""Durable ANN index deletes (round 13): tombstoned removal with
live-view query reads, matched-live counters, dead-fraction
compaction that preserves answers and re-derives sidecars, and a
maintenance rebuild that never resurrects deleted vectors."""

import json
import os

from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import similarity


def _blobs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (
                F.when(F.col("id") % 4 == 0, -9.0)
                .when(F.col("id") % 4 == 1, -3.0)
                .when(F.col("id") % 4 == 2, 3.0)
                .otherwise(9.0)
                + F.sin((F.col("id") + 1) * 0.41)
            ).cast("float"),
            F.sin((F.col("id") + 1) * 0.59).cast("float"),
        ).alias("embedding"),
        (F.col("id") % 5).cast("int").alias("label"),
    )


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_delete_hides_rows_from_every_query_path(spark, tmp_path):
    idx = str(tmp_path / "ann")
    df = _blobs(spark)
    similarity.ivf_pq_write_index(
        df, idx, n_lists=4, m=2, nbits=4, filter_cols=["label"]
    )
    q = [3.0, 0.2]
    before = set(
        _ids(similarity.ivf_pq_topk_from_index(spark, idx, q, k=10, nprobe=4))
    )
    dead_ids = set(list(before)[:5])
    dead = spark.createDataFrame([(i,) for i in dead_ids], "vec_id long")
    assert similarity.ivf_pq_delete_from_index(dead, idx) == 5
    # full-probe top-k: none of the deleted ids can appear
    after = _ids(
        similarity.ivf_pq_topk_from_index(
            spark, idx, q, k=10, nprobe=4, n_candidates=400
        )
    )
    assert not (set(after) & dead_ids)
    # equals brute force over the surviving corpus
    live = df.join(dead, on="vec_id", how="left_anti")
    want = _ids(similarity.brute_force_topk(live, q, k=10, round_to=4))
    got = _ids(
        similarity.ivf_pq_topk_from_index(
            spark, idx, q, k=10, nprobe=4, n_candidates=400, round_to=4
        )
    )
    assert got == want
    # filtered prefilter branch is live-exact too
    gotf, info = similarity.ivf_pq_filtered_topk_from_index(
        spark, idx, q, "label", 2, k=8, brute_threshold=10**9, round_to=4
    )
    assert info["strategy"] == "prefilter"
    wantf = similarity.filtered_topk(
        live, q, F.col("label") == 2, k=8, round_to=4
    )
    assert _ids(gotf) == _ids(wantf)


def test_delete_counts_matched_live_only(spark, tmp_path):
    idx = str(tmp_path / "ann2")
    similarity.ivf_pq_write_index(_blobs(spark, 200), idx, n_lists=4, m=2, nbits=4)
    unknown = spark.range(3).select((F.col("id") + 10_000).alias("vec_id"))
    assert similarity.ivf_pq_delete_from_index(unknown, idx) == 0
    assert not os.path.isdir(os.path.join(idx, "_tombstones"))
    dead = spark.range(10).select(F.col("id").alias("vec_id"))
    assert similarity.ivf_pq_delete_from_index(dead, idx) == 10
    assert similarity.ivf_pq_delete_from_index(dead, idx) == 0  # repeat no-op
    rep = similarity.ivf_pq_index_dead_fraction(spark, idx)
    assert rep["n_dead"] == 10 and rep["rows"] == 200
    with open(os.path.join(idx, "_ann_meta.json")) as f:
        assert json.load(f)["n_dead"] == 10


def test_compact_sweeps_tombstones_and_preserves_answers(spark, tmp_path):
    idx = str(tmp_path / "ann3")
    df = _blobs(spark, 300)
    similarity.ivf_pq_write_index(
        df, idx, n_lists=4, m=2, nbits=4, filter_cols=["label"]
    )
    dead = spark.range(0, 300, 4).select(F.col("id").alias("vec_id"))  # 25%
    similarity.ivf_pq_delete_from_index(dead, idx)
    q = [-3.0, 0.1]
    before = _ids(
        similarity.ivf_pq_topk_from_index(
            spark, idx, q, k=10, nprobe=4, n_candidates=300, round_to=4
        )
    )
    rep = similarity.ivf_pq_compact_index(spark, idx, tombstone_fraction=0.2)
    assert rep["compacted"] is True
    assert not os.path.isdir(os.path.join(idx, "_tombstones"))
    after = _ids(
        similarity.ivf_pq_topk_from_index(
            spark, idx, q, k=10, nprobe=4, n_candidates=300, round_to=4
        )
    )
    assert after == before
    # sidecar re-derived from survivors: hist totals match live rows,
    # hist_rows marker matches the new footers
    with open(os.path.join(idx, "_ann_meta.json")) as f:
        meta = json.load(f)
    live_n = 300 - dead.count()
    assert meta["hist_rows"] == live_n and meta["n_dead"] == 0
    hist_total = sum(
        c for _v, _l, c in meta["filter_hist"]["label"]
    )
    assert hist_total == live_n
    # below threshold: zero-job no-op
    assert (
        similarity.ivf_pq_compact_index(spark, idx, tombstone_fraction=0.2)[
            "compacted"
        ]
        is False
    )


def test_maintain_rebuild_never_resurrects(spark, tmp_path):
    idx = str(tmp_path / "ann4")
    df = _blobs(spark, 240)
    similarity.ivf_pq_write_index(df, idx, n_lists=4, m=2, nbits=4)
    dead = spark.range(0, 240, 3).select(F.col("id").alias("vec_id"))
    similarity.ivf_pq_delete_from_index(dead, idx)
    rep = similarity.ivf_pq_maintain_index(
        spark, idx, skew_factor=0.0, err_factor=0.0  # force a rebuild
    )
    assert rep["rebuilt"] is True
    idx_rows = spark.read.parquet(idx)
    assert idx_rows.count() == 160  # dead rows gone physically
    assert (
        idx_rows.join(dead, on="vec_id", how="left_semi").count() == 0
    )
    assert not os.path.isdir(os.path.join(idx, "_tombstones"))


def test_batch_topk_from_index_matches_sequential(spark, tmp_path):
    """Batch durable-index queries: each query's answer equals the
    single-query operator's at the same nprobe (full probe here, so
    both equal brute force); the scan is pruned to the probed lists."""
    idx = str(tmp_path / "ann5")
    df = _blobs(spark, 300)
    similarity.ivf_pq_write_index(df, idx, n_lists=4, m=2, nbits=4)
    dead = spark.range(0, 300, 11).select(F.col("id").alias("vec_id"))
    similarity.ivf_pq_delete_from_index(dead, idx)
    queries = df.where(F.col("vec_id").isin([2, 5, 9])).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    out = similarity.ivf_pq_topk_batch_from_index(
        spark, idx, queries, k=6, nprobe=4, round_to=4
    )
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r["vec_id"])
    for r in queries.collect():
        single = similarity.ivf_pq_topk_from_index(
            spark, idx, [float(x) for x in r["q_embedding"]],
            k=6, nprobe=4, n_candidates=300, round_to=4,
        )
        assert sorted(by_q[r["q_id"]]) == sorted(
            x["vec_id"] for x in single.collect()
        )
    dead_ids = {r["vec_id"] for r in dead.collect()}
    assert not (set().union(*by_q.values()) & dead_ids)


def test_batch_topk_partial_probe_prunes_partitions(spark, tmp_path):
    idx = str(tmp_path / "ann6")
    df = _blobs(spark, 400)  # 4 well-separated blobs -> 4 lists
    similarity.ivf_pq_write_index(df, idx, n_lists=4, m=2, nbits=4)
    queries = df.where(F.col("vec_id").isin([0, 4])).select(  # blobs 0 and 0? ids 0,4 -> blobs 0,0
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    out = similarity.ivf_pq_topk_batch_from_index(
        spark, idx, queries, k=3, nprobe=1, round_to=4
    )
    # nprobe=1 with both queries in the same blob: the scan carries a
    # single-list partition filter (inputFiles() ignores pruning, so
    # assert on the plan)
    import re

    from lineage_store_database_management_system_spark.plans.explain import (
        explain_str,
    )

    plan = explain_str(out)
    m = re.search(r"PartitionFilters: \[[^\]]*_list[^\]]*\]", plan)
    assert m, plan[:2000]
    assert re.search(r"_list#\d+ = \d+", m.group(0)), m.group(0)
    assert out.count() == 6


def test_batch_topk_query_cap(spark, tmp_path):
    import pytest as _pytest

    idx = str(tmp_path / "ann7")
    similarity.ivf_pq_write_index(_blobs(spark, 100), idx, n_lists=2, m=2, nbits=4)
    queries = _blobs(spark, 30).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    with _pytest.raises(ValueError, match="max_queries"):
        similarity.ivf_pq_topk_batch_from_index(
            spark, idx, queries, k=3, max_queries=10
        )
