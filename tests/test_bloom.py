"""Distributed Bloom filter + decontamination (operators/bloom.py)."""

import pytest
from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.functions.text import word_shingles
from lineage_store_database_management_system_spark.operators import bloom


def test_no_false_negatives_exhaustive(spark):
    members = spark.range(0, 2000).select(
        F.concat(F.lit("member-"), F.col("id")).alias("v")
    )
    bf = bloom.build_bloom(members, "v", num_bits=1 << 16, num_hashes=5)
    hits = members.withColumn("hit", bloom.might_contain(members, "v", bf))
    assert hits.where(~F.col("hit")).count() == 0  # every member found


def test_false_positive_rate_in_theory_band(spark):
    n, m, k = 2000, 1 << 16, 5
    members = spark.range(0, n).select(
        F.concat(F.lit("member-"), F.col("id")).alias("v")
    )
    bf = bloom.build_bloom(members, "v", num_bits=m, num_hashes=k)
    assert 0.0 < bf.fill_ratio() < 0.25
    strangers = spark.range(0, 20000).select(
        F.concat(F.lit("stranger-"), F.col("id")).alias("v")
    )
    fp = strangers.withColumn(
        "hit", bloom.might_contain(strangers, "v", bf)
    ).where("hit").count()
    # theoretical FPR ~ (1 - e^{-kn/m})^k ~ 2.2e-4 here; allow 10x
    assert fp / 20000 < 2.2e-3


def test_build_is_distribution_invariant(spark):
    vals = spark.range(0, 500).select(F.concat(F.lit("x"), F.col("id")).alias("v"))
    a = bloom.build_bloom(vals.repartition(16), "v", num_bits=1 << 13, num_hashes=3)
    b = bloom.build_bloom(vals.coalesce(1), "v", num_bits=1 << 13, num_hashes=3)
    assert a.bits == b.bits  # partitioning must not change the filter


def test_decontaminate_matches_exact_join(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog in the park today ok"),
            (2, "completely unrelated sentence with distinct vocabulary choices only"),
            (3, "another clean document talking about weather patterns and rain"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog in the park today yes")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.n_leaked)
        for r in bloom.bloom_decontaminate(
            train, test, "doc_id", "text", n=8
        ).collect()
    }
    # direct exact computation, no bloom involved
    tr = train.select("doc_id", F.explode(word_shingles(F.col("text"), 8)).alias("g"))
    te = test.select(F.explode(word_shingles(F.col("text"), 8)).alias("g")).distinct()
    exact = (
        tr.join(te, on="g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_leaked"))
    )
    assert got == {(r.doc_id, r.n_leaked) for r in exact.collect()}
    assert got and all(d == 1 for d, _ in got)  # only doc 1 leaks


def test_num_bits_must_be_byte_aligned(spark):
    df = spark.range(1).select(F.lit("a").alias("v"))
    with pytest.raises(ValueError):
        bloom.build_bloom(df, "v", num_bits=1001)


def test_save_load_union_roundtrip(spark, tmp_path):
    import os

    a_side = spark.range(0, 300).select(F.concat(F.lit("a"), F.col("id")).alias("v"))
    b_side = spark.range(0, 300).select(F.concat(F.lit("b"), F.col("id")).alias("v"))
    bf_a = bloom.build_bloom(a_side, "v", num_bits=1 << 14, num_hashes=4)
    bf_b = bloom.build_bloom(b_side, "v", num_bits=1 << 14, num_hashes=4)
    p = os.path.join(str(tmp_path), "f.bloom")
    bf_a.save(p)
    loaded = bloom.BloomFilter.load(p)
    assert loaded.bits == bf_a.bits
    assert (loaded.num_bits, loaded.num_hashes) == (1 << 14, 4)

    merged = loaded.union(bf_b)
    both = a_side.unionAll(b_side)
    hits = both.withColumn("hit", bloom.might_contain(both, "v", merged))
    assert hits.where(~F.col("hit")).count() == 0  # no FN through save+union

    with pytest.raises(ValueError):
        bf_a.union(bloom.build_bloom(b_side, "v", num_bits=1 << 13, num_hashes=4))


def test_tree_fold_bounds_driver_intake(spark):
    """Scale contract (r10 VERDICT #1): the driver-side fold must
    receive at most fold_groups rows REGARDLESS of input partition
    count — partials merge executor-side first. And the tree-folded
    filter must be bit-identical to a narrow build (OR is associative
    and commutative, so grouping cannot change the result)."""
    vals = spark.range(2000).select(F.concat(F.lit("w"), "id").alias("g"))
    wide = vals.repartition(64)  # 64 partials
    bf_wide = bloom.build_bloom(wide, "g", num_bits=1 << 13, fold_groups=4)
    assert bf_wide.driver_fold_rows <= 4
    bf_narrow = bloom.build_bloom(
        vals.coalesce(1), "g", num_bits=1 << 13, fold_groups=4
    )
    assert bf_narrow.driver_fold_rows <= 4
    assert bf_wide.bits == bf_narrow.bits
