"""Train/test contamination detection for training-data pipelines
(extension layer — the reference has no multi-table operators at all,
SURVEY §2.6; north-star LLM-pipeline component).

The canonical pre-training hygiene check: what fraction of each
held-out (test) document's word n-grams also appears anywhere in the
training corpus? High overlap means the test doc leaked into
training and its eval numbers are compromised.

Scale shape (100 TB): both sides reduce to 64-bit shingle hashes
before the join — the raw text never shuffles. The train side is a
DISTINCT hash set (one shuffle, map-side combined); the test side
explodes to (doc, hash) pairs; the overlap is a broadcast or shuffle
hash join on the hash followed by a per-doc aggregate. Work is
proportional to corpus shingle count, never |train| x |test|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles
from ._util import spread


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Per-test-document contamination: (id, n_ngrams, n_hit, rate).

    ``n_ngrams`` counts the doc's DISTINCT word n-grams; ``n_hit``
    how many of them occur in any train document; ``rate`` their
    ratio rounded to 4 decimals (0.0 for docs shorter than n words —
    nothing to match means nothing measurably leaked).
    """
    sh = word_shingles(F.col(text_col), n).alias("_sh")

    test_grams = (
        spread(test)
        .select(F.col(id_col), sh)
        .select(F.col(id_col), F.explode("_sh").alias("_g"))
        .select(F.col(id_col), F.xxhash64("_g").alias("_h"))
    )
    train_grams = (
        spread(train)
        .select(sh)
        .select(F.explode("_sh").alias("_g"))
        .select(F.xxhash64("_g").alias("_h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = test_grams.join(train_grams, on="_h", how="left")
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hit"),
    )
    # docs shorter than n words produce no shingle rows; restore them
    # with zero counts so the output covers every test document
    all_ids = test.select(F.col(id_col)).distinct()
    out = all_ids.join(per_doc, on=id_col, how="left").select(
        F.col(id_col),
        F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("long").alias("n_ngrams"),
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        F.when(F.coalesce(F.col("n_ngrams"), F.lit(0)) == 0, F.lit(0.0))
        .otherwise(F.round(F.col("n_hit") / F.col("n_ngrams"), 4))
        .alias("rate"),
    )
    return out
