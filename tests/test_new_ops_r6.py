"""Round-6 continuation operators: keep-best dedup, pointer-jumping
hierarchy resolution (WITH RECURSIVE equivalence), KMV overlap
sketches."""

import pytest
from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import dedup, graph, sketch


# ---------------------------------------------------------------------------
# dedup.dedup_keep_best
# ---------------------------------------------------------------------------


def test_keep_best_picks_max_score_min_id(spark):
    rows = [
        (1, "a b c", 5),
        (2, "A  b   c", 9),  # same normalized text, higher score -> keeper
        (3, "a b c", 9),  # score tie with 2 -> id 2 wins
        (4, "unique text", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, q long")
    out = dedup.dedup_keep_best(df, "doc_id", "text", score=F.col("q")).collect()
    got = {r["doc_id"]: r["n_copies"] for r in out}
    assert got == {2: 3, 4: 1}


def test_keep_best_min_id_score_reduces_to_dedup_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.unionByName(
        docs.limit(20).select(
            (F.col("doc_id") + 10_000).alias("doc_id"), "text"
        )
    )
    best = dedup.dedup_keep_best(
        corpus, "doc_id", "text", score=-F.col("doc_id")
    )
    exact = dedup.dedup_exact(corpus, "doc_id", "text")
    assert sorted(r["doc_id"] for r in best.collect()) == sorted(
        r["doc_id"] for r in exact.collect()
    )


# ---------------------------------------------------------------------------
# graph.hierarchy_resolve
# ---------------------------------------------------------------------------


def test_hierarchy_deep_chain_log_rounds(spark):
    """A 4000-deep chain must resolve (pointer jumping: 12 rounds,
    far under max_iter=40; a naive one-hop loop would need 4000)."""
    n = 4000
    edges = spark.range(1, n).select(
        F.col("id").alias("child"), (F.col("id") - 1).alias("parent")
    )
    out = graph.hierarchy_resolve(edges, "child", "parent")
    rows = {r["id"]: (r["root"], r["depth"]) for r in out.collect()}
    assert len(rows) == n
    assert rows[0] == (0, 0)
    assert rows[n - 1] == (0, n - 1)
    assert rows[1234] == (0, 1234)


def test_hierarchy_forest_and_isolated_nodes(spark):
    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 2), (11, 10)], "child long, parent long"
    )
    nodes = spark.createDataFrame([(99,)], "id long")
    out = graph.hierarchy_resolve(edges, "child", "parent", nodes=nodes)
    rows = {r["id"]: (r["root"], r["depth"]) for r in out.collect()}
    assert rows == {
        1: (1, 0),
        2: (1, 1),
        3: (1, 1),
        4: (1, 2),
        10: (10, 0),
        11: (10, 1),
        99: (99, 0),
    }


def test_hierarchy_rejects_multi_parent_and_cycles(spark):
    multi = spark.createDataFrame(
        [(2, 1), (2, 3)], "child long, parent long"
    )
    with pytest.raises(ValueError, match="not a forest"):
        graph.hierarchy_resolve(multi, "child", "parent")
    cycle = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "child long, parent long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        graph.hierarchy_resolve(cycle, "child", "parent", max_iter=8)


# ---------------------------------------------------------------------------
# sketch.kmv_sketches / kmv_overlap_pairs
# ---------------------------------------------------------------------------


def test_kmv_exact_when_group_smaller_than_k(spark):
    df = spark.createDataFrame(
        [("a", f"v{i}") for i in range(50)]
        + [("b", f"v{i}") for i in range(25, 100)],
        "g string, v string",
    )
    sk = sketch.kmv_sketches(df, "g", "v", k=256)
    got = {r["g"]: (len(r["sketch"]), r["n_distinct_est"]) for r in sk.collect()}
    assert got["a"] == (50, 50.0) and got["b"] == (75, 75.0)
    pairs = sketch.kmv_overlap_pairs(sk, "g", k=256).collect()
    assert len(pairs) == 1
    p = pairs[0]
    # overlap v25..v49 = 25 of union 100 -> J exact (sketches complete)
    assert abs(p["jaccard_est"] - 0.25) < 1e-9
    assert abs(p["inter_est"] - 25.0) < 1e-6


def test_kmv_estimates_within_bounds_when_sketching(spark):
    """Groups far larger than k: prune + bottom-k must be the TRUE
    bottom-k (vs unpruned reference) and the estimator within ~4
    sigma."""
    df = spark.range(0, 20000).select(
        F.when(F.col("id") < 12000, "a").otherwise("b").alias("g"),
        F.concat(F.lit("value-"), (F.col("id") % 9000).cast("string")).alias("v"),
    )
    # group a: ids 0..11999 -> v 0..8999 (9000 distinct)
    # group b: ids 12000..19999 -> v 3000..8999 wrap: (12000..19999)%9000
    #   = 3000..8999 then 0..1999 -> 8000 distinct, overlap 8000
    k = 256
    sk = sketch.kmv_sketches(df, "g", "v", k=k)
    got = {r["g"]: r for r in sk.collect()}
    assert len(got["a"]["sketch"]) == k
    # true bottom-k cross-check without the prune path
    truth = (
        df.where("g = 'a'")
        .select(F.xxhash64("v").alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
        .collect()
    )
    assert got["a"]["sketch"] == [r["h"] for r in truth]
    assert abs(got["a"]["n_distinct_est"] - 9000) < 9000 * 0.25
    assert abs(got["b"]["n_distinct_est"] - 8000) < 8000 * 0.25
    p = sketch.kmv_overlap_pairs(sk, "g", k=k).collect()[0]
    true_j = 8000 / 9000
    assert abs(p["jaccard_est"] - true_j) < 0.12


# ---------------------------------------------------------------------------
# textops.chunk_content_defined
# ---------------------------------------------------------------------------


def test_cdc_chunks_realign_after_prefix_edit(spark, sf_dir):
    """The CDC property fixed-width chunking lacks: prepending tokens
    to a document shifts at most the leading chunk(s); the tail
    chunks re-align byte-identically (same md5 set)."""
    from lineage_store_database_management_system_spark.operators import textops

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("n_chars > 200")
        .limit(10)
        .select("doc_id", "text")
    )
    edited = docs.select(
        "doc_id",
        F.concat(F.lit("inserted prefix tokens here "), F.col("text")).alias(
            "text"
        ),
    )
    a = textops.chunk_content_defined(docs, "doc_id", "text", k=4)
    b = textops.chunk_content_defined(edited, "doc_id", "text", k=4)
    for doc in [r["doc_id"] for r in docs.select("doc_id").collect()]:
        ha = {r["chunk_md5"] for r in a.where(F.col("doc_id") == doc).collect()}
        hb = {r["chunk_md5"] for r in b.where(F.col("doc_id") == doc).collect()}
        shared = len(ha & hb)
        # every chunk except the (shifted) leading one must survive
        assert shared >= len(ha) - 2, (doc, len(ha), len(hb), shared)


def test_cdc_chunks_cover_document_exactly(spark):
    from lineage_store_database_management_system_spark.operators import textops

    rows = [(1, "a b c d e f g h i j k l m n o p q r s t u v w x y z"), (2, "x"), (3, "one two three")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.chunk_content_defined(df, "doc_id", "text", k=4)
    per = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.sum("n_tokens").alias("n")).collect()
    }
    assert per == {1: 26, 2: 1, 3: 3}


# ---------------------------------------------------------------------------
# graph.pagerank_integer
# ---------------------------------------------------------------------------


def test_pagerank_integer_hand_computed(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 1)], "src long, dst long"
    )
    out = graph.pagerank_integer(e, "src", "dst", n_iter=2)
    got = {r["id"]: r["rank_mass"] for r in out.collect()}
    # iter1: m1=1850000, m2=1000000, m3=150000
    # iter2: m1=150000+850000+127500, m2=150000+floor(1850000*.85), m3=150000
    assert got == {1: 1127500, 2: 1722500, 3: 150000}


def test_pagerank_deterministic_across_partitionings(spark):
    import random

    random.seed(7)
    edges = [(random.randrange(100), random.randrange(100)) for _ in range(500)]
    e1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    e2 = spark.createDataFrame(edges, "src long, dst long").repartition(17)
    r1 = {r["id"]: r["rank_mass"] for r in graph.pagerank_integer(e1, "src", "dst").collect()}
    r2 = {r["id"]: r["rank_mass"] for r in graph.pagerank_integer(e2, "src", "dst").collect()}
    assert r1 == r2


# ---------------------------------------------------------------------------
# timeseries.ewma / funnel_stages
# ---------------------------------------------------------------------------


def test_ewma_hand_computed(spark):
    import datetime as dt

    from lineage_store_database_management_system_spark.operators import timeseries

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, 8.0),
        (1, t0 + dt.timedelta(hours=1), 2, 4.0),
        (1, t0 + dt.timedelta(hours=2), 3, 0.0),
        (2, t0, 4, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = {
        r["user_id"]: (r["n_events"], r["ewma_e4"])
        for r in timeseries.ewma(
            df, "user_id", "ts", "value", order_tiebreak="event_id"
        ).collect()
    }
    # user 1: e1=8, e2=4*.25+8*.75=7, e3=0*.25+7*.75=5.25 -> 52500
    assert out == {1: (3, 52500), 2: (1, 50000)}


def test_funnel_tie_and_order_semantics(spark):
    import datetime as dt

    from lineage_store_database_management_system_spark.operators import timeseries

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: full ordered funnel
        (1, t0, 1, "view"), (1, t0 + h, 2, "click"), (1, t0 + 2 * h, 3, "purchase"),
        # user 2: purchase BEFORE view/click -> stage stops at 2
        (2, t0, 4, "purchase"), (2, t0 + h, 5, "view"), (2, t0 + 2 * h, 6, "click"),
        # user 3: same-ts view/click; event_id order advances the funnel
        (3, t0, 7, "view"), (3, t0, 8, "click"),
        # user 4: no funnel events
        (4, t0, 9, "error"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {
        r["user_id"]: r["funnel_stage"]
        for r in timeseries.funnel_stages(
            df, "user_id", "ts", "event_type",
            steps=["view", "click", "purchase"], order_tiebreak="event_id",
        ).collect()
    }
    assert out == {1: 3, 2: 2, 3: 2, 4: 0}


# ---------------------------------------------------------------------------
# textops.source_drift_tv
# ---------------------------------------------------------------------------


def test_tv_distance_identical_and_disjoint(spark):
    from lineage_store_database_management_system_spark.operators import textops

    rows = [
        (1, "a", "x y z"),
        (2, "b", "x y z"),      # identical mix to a -> TV 0
        (3, "c", "p q r"),      # disjoint from a/b -> TV 1
        (4, "d", "x y p q"),    # half-overlap: TV vs a = 0.5
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        (r["group_a"], r["group_b"]): r["tv_e6"]
        for r in textops.source_drift_tv(df, "source", "text").collect()
    }
    assert out[("a", "b")] == 0
    assert out[("a", "c")] == 1000000
    assert out[("b", "c")] == 1000000
    # a = {x,y,z}@1/3; d = {x,y,p,q}@1/4: shared |1/3-1/4|*2 = 1/6,
    # private 1/3 + 2/4 = 5/6 -> TV = (1/6 + 5/6)/2 = 0.5
    assert out[("a", "d")] == 500000


# ---------------------------------------------------------------------------
# sampling.proportional_sample
# ---------------------------------------------------------------------------


def test_proportional_sample_exact_budget_and_quotas(spark):
    from lineage_store_database_management_system_spark.operators import sampling

    rows = (
        [(i, "a") for i in range(60)]
        + [(i + 100, "b") for i in range(30)]
        + [(i + 200, "c") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.proportional_sample(df, "source", "doc_id", total_k=7).collect()
    per = {}
    for r in out:
        per[r["source"]] = per.get(r["source"], 0) + 1
    # quotas: a 7*60/100=4.2, b 2.1, c 0.7 -> floors 4,2,0 (sum 6);
    # remainders .7(c) > .2(a) > .1(b): the 1 leftover seat -> c
    assert sum(per.values()) == 7
    assert per == {"a": 4, "b": 2, "c": 1}


def test_proportional_sample_is_deterministic(spark):
    from lineage_store_database_management_system_spark.operators import sampling

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).cast("string").alias("source")
    )
    a = {r["doc_id"] for r in sampling.proportional_sample(df, "source", "doc_id", 50).collect()}
    b = {r["doc_id"] for r in sampling.proportional_sample(df.repartition(13), "source", "doc_id", 50).collect()}
    assert a == b and len(a) == 50


def test_chunk_dedup_corpus_removes_shifted_clone_tail(spark):
    from lineage_store_database_management_system_spark.operators import textops

    # diverse tokens (a periodic text has ~4 distinct windows and may
    # produce no boundary at all — then each doc is one big chunk)
    base = " ".join(f"tok{i}" for i in range(160))
    rows = [
        (1, base),
        (2, "shift pad junk " + base),  # shifted clone
        (3, "totally different words here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_kept"], r["text"])
        for r in textops.chunk_dedup_corpus(df, "doc_id", "text", k=4).collect()
    }
    # doc 1 keeps everything (first occurrence); doc 2's re-aligned
    # tail chunks dedup away, keeping at most its leading chunk(s)
    assert out[1][1] == base
    assert out[2][0] <= 2 and len(out[2][1]) < len(rows[1][1])
    assert out[3][1] == rows[2][1]
