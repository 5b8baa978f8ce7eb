"""Round-10 operator additions: IVF-PQ index maintenance under append
drift (VERDICT #5)."""

import math

import pytest
from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import similarity


def _vecs(spark, n, dim=8, offset=0.0, id_base=0):
    # deterministic pseudo-random cloud, optionally displaced by
    # ``offset`` on every axis (the drift)
    return spark.range(n).select(
        (F.col("id") + id_base).alias("vec_id"),
        F.array(
            *[
                (
                    F.sin((F.col("id") + 1) * (0.37 + 0.11 * d))
                    + F.lit(offset + 0.05 * (d + 1))
                ).cast("float")
                for d in range(dim)
            ]
        ).alias("embedding"),
    )


def test_append_drift_flags_stale_and_rebuild_restores_recall(spark, tmp_path):
    idx = str(tmp_path / "idx")
    base = _vecs(spark, 400)
    similarity.ivf_pq_write_index(base, idx, n_lists=8, m=4, nbits=4)
    fresh = similarity.ivf_pq_index_staleness(spark, idx)
    assert not fresh["stale"]
    assert fresh["err_ratio"] == pytest.approx(1.0, rel=1e-6)
    # drift: a displaced cloud twice the original size appends under
    # the frozen centroids — assignment error must grow
    drifted = _vecs(spark, 800, offset=4.0, id_base=10_000)
    similarity.ivf_pq_append_index(drifted, idx)
    post = similarity.ivf_pq_index_staleness(spark, idx)
    assert post["err_ratio"] > 2.0
    assert post["stale"]
    # query in the drifted region BEFORE maintenance vs exact truth
    q = [float(x) for x in drifted.where("vec_id = 10003").first()["embedding"]]
    corpus = base.unionByName(drifted)
    exact = {
        r["vec_id"]
        for r in similarity.brute_force_topk(corpus, q, k=10).collect()
    }
    # maintenance rebuilds (retrains centroids+codebooks from the
    # index's own rows) and the staleness clears
    rep = similarity.ivf_pq_maintain_index(spark, idx)
    assert rep["rebuilt"]
    after = similarity.ivf_pq_index_staleness(spark, idx)
    assert not after["stale"]
    assert after["rows"] == 1200
    got = {
        r["vec_id"]
        for r in similarity.ivf_pq_topk_from_index(
            spark, idx, q, k=10, nprobe=4, n_candidates=200
        ).collect()
    }
    # the fresh-build recall bound from the registry gates: >= 4 of 10
    assert len(exact & got) >= 4
    # maintenance on a healthy index is a no-op
    rep2 = similarity.ivf_pq_maintain_index(spark, idx)
    assert not rep2["rebuilt"]
