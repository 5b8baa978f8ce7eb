"""Dataset-curation sampling operators for training-data pipelines.

The reference has no sampling of any kind (SURVEY §2.6); these are
extension-layer operators sized for the 100 TB corpus case:

- deterministic_split : reproducible train/val/test assignment from a
  stable key — pure arithmetic on the key, no RNG state, so the split
  is identical across runs, partitionings, and engines, and a document
  never migrates between splits when the corpus is re-processed.
- cap_per_group       : keep at most N rows per group (domain/source
  caps — the standard guard against one crawl domain dominating a
  pretraining mix). One window over the group key; deterministic
  order by the id column.
- stratified_fraction : per-stratum deterministic fraction (e.g. 10%
  of every language) — same key arithmetic, applied within strata.

All three are single-shuffle (or shuffle-free for the splits) and
stay entirely in JVM expressions. At real scale the split key should
be a content-stable id (e.g. xxhash64 of a canonical url), not a
dense sequence — the arithmetic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def deterministic_split(
    df: DataFrame,
    key_col: str,
    buckets: int = 100,
    train: int = 80,
    val: int = 10,
) -> DataFrame:
    """Adds a `split` column: bucket = pmod(key, buckets); [0, train)
    -> 'train', [train, train+val) -> 'val', rest -> 'test'. No
    shuffle: the assignment is a projection. ``pmod`` (not ``%``)
    because split keys are typically signed hashes (xxhash64) and
    Spark's ``%`` follows the dividend's sign — a plain modulo would
    send every negative key to 'train'."""
    b = F.pmod(F.col(key_col), F.lit(buckets))
    return df.withColumn(
        "split",
        F.when(b < train, F.lit("train"))
        .when(b < train + val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def cap_per_group(
    df: DataFrame, group_col: str, id_col: str, max_rows: int
) -> DataFrame:
    """At most ``max_rows`` rows per group, keeping the smallest ids
    (deterministic). Compiles to a single window with WindowGroupLimit
    pushdown — Spark stops ranking beyond the cap per partition, so
    the cost is one shuffle on the group key, not a full sort."""
    w = Window.partitionBy(group_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_rows)
        .drop("_rn")
    )


def stratified_fraction(
    df: DataFrame, stratum_col: str, key_col: str, percent: int, buckets: int = 100
) -> DataFrame:
    """Deterministic ~percent% of every stratum: keep rows whose
    key bucket falls below ``percent``. Because the predicate is
    per-row arithmetic, sampling is a filter (pushdown-friendly),
    never a shuffle; strata are preserved exactly (no variance in
    which rows are kept, unlike RNG-based sampleBy). ``pmod`` keeps
    signed hash keys in [0, buckets)."""
    return df.where(F.pmod(F.col(key_col), F.lit(buckets)) < percent)
