"""Round-11 second batch: MaxSim late interaction, linear-interpolation
gap fill, durable incremental trigram index."""

import math

from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import (
    similarity,
    textsearch,
)
from lineage_store_database_management_system_spark.operators import timeseries as ts


# ---------------------------------------------------------------- MaxSim


def test_multi_vector_split_shapes(spark):
    df = spark.createDataFrame(
        [(0, [float(i) for i in range(8)])], ["vec_id", "embedding"]
    )
    out = similarity.multi_vector_split(df, n_tokens=4).first()["token_vecs"]
    assert out == [[0.0, 1.0], [2.0, 3.0], [4.0, 5.0], [6.0, 7.0]]


def test_maxsim_matches_python_reference(spark):
    rows = [
        (0, [[1.0, 0.0], [0.0, 1.0]]),
        (1, [[0.5, 0.5], [0.2, 0.8]]),
        (2, [[-1.0, 0.0], [0.0, -1.0]]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, token_vecs array<array<double>>")
    q = [[0.5, 0.5], [1.0, 0.0]]

    def ref(dtoks):
        return sum(
            max(sum(a * b for a, b in zip(qt, dt)) for dt in dtoks) for qt in q
        )

    got = {
        r["vec_id"]: r["maxsim"]
        for r in similarity.maxsim_topk(df, q, k=3, round_to=6).collect()
    }
    for vid, dtoks in rows:
        assert math.isclose(got[vid], round(ref(dtoks), 6), abs_tol=1e-9)
    # ranking: doc 0 (1.5) > doc 1 (0.7) > doc 2 (-0.5)
    order = [r["vec_id"] for r in similarity.maxsim_topk(df, q, k=3).collect()]
    assert order == [0, 1, 2]


def test_maxsim_plan_is_maponly_topk(spark):
    df = similarity.multi_vector_split(
        spark.range(50).select(
            F.col("id").alias("vec_id"),
            F.expr("transform(sequence(1, 8), i -> cast(i * (id + 1) as float))")
            .alias("embedding"),
        ),
        n_tokens=2,
    )
    plan = similarity.maxsim_topk(df, [[1.0] * 4, [0.5] * 4], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


# ------------------------------------------------- interpolation gapfill


def _series(spark):
    rows = [
        (1, "2024-01-01 00:30:00", 10.0),
        (1, "2024-01-01 03:15:00", 40.0),   # 2-bucket gap at 01:00, 02:00
        (1, "2024-01-01 04:10:00", 0.0),
        (2, "2024-01-01 02:05:00", 8.0),    # starts late; tail after 02:00
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "value"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )


def test_interpolate_fills_linear_between_observations(spark):
    out = ts.gapfill_interpolate(
        _series(spark), "ts", "user_id", "value",
        "2024-01-01 00:00:00", "2024-01-01 05:00:00", round_to=3,
    )
    got = {
        (r["user_id"], str(r["bucket"])): (r["filled"], r["is_gap"])
        for r in out.collect()
    }
    # key 1: observed 00:00->10, 03:00->40, 04:00->0
    assert got[(1, "2024-01-01 00:00:00")] == (10.0, False)
    # linear between 10 @00 and 40 @03: 20 @01, 30 @02
    assert got[(1, "2024-01-01 01:00:00")] == (20.0, True)
    assert got[(1, "2024-01-01 02:00:00")] == (30.0, True)
    assert got[(1, "2024-01-01 03:00:00")] == (40.0, False)
    assert got[(1, "2024-01-01 04:00:00")] == (0.0, False)
    # after the last observation: LOCF
    assert got[(1, "2024-01-01 05:00:00")] == (0.0, True)
    # key 2: before first observation stays NULL
    assert got[(2, "2024-01-01 00:00:00")] == (None, True)
    assert got[(2, "2024-01-01 01:00:00")] == (None, True)
    assert got[(2, "2024-01-01 02:00:00")] == (8.0, False)
    assert got[(2, "2024-01-01 05:00:00")] == (8.0, True)


def test_interpolate_observed_matches_locf_observed(spark):
    kw = dict(
        ts_col="ts", key_col="user_id", value_col="value",
        start="2024-01-01 00:00:00", end="2024-01-01 05:00:00", round_to=3,
    )
    a = ts.gapfill_locf(_series(spark), **kw).select("user_id", "bucket", "observed")
    b = ts.gapfill_interpolate(_series(spark), **kw).select(
        "user_id", "bucket", "observed"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# --------------------------------------------- durable trigram index


def test_incremental_trigram_index_roundtrip(spark, tmp_path):
    idx = str(tmp_path / "trgm")
    base = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta gamma delta")], ["doc_id", "text"]
    )
    textsearch.write_trigram_index(base, idx)
    extra = spark.createDataFrame([(2, "gamma epsilon alpha")], ["doc_id", "text"])
    textsearch.append_trigram_index(extra, idx)
    postings, stats = textsearch.open_trigram_index(spark, idx)
    corpus = base.unionByName(extra)
    got, info = textsearch.substring_search(
        corpus, "gamma", postings=postings, stats=stats
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1, 2]
    assert info["strategy"] == "index"
    # stats fold the two batches: 'gam' appears in all 3 docs
    df_gam = stats.where(F.col("gram") == "gam").first()["df"]
    assert df_gam == 3
