"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a frame whose scan partitioning is too
    coarse for a compute-heavy per-row stage (e.g. one small Parquet
    file = one partition = one core doing all the shingling).

    No-op when the input already has enough partitions — so at real
    scale (thousands of input splits) this costs nothing, while in
    small-file corners it unlocks the full executor count. The shuffle
    it introduces moves exactly the columns the downstream op needs,
    once, and is strictly cheaper than serializing the whole stage on
    one core.
    """
    # Callers are compute-heavy per-ROW stages (shingling, hashing,
    # Pandas-UDF kernels), so the right target is the executor count,
    # not input bytes: a 500 KB / 5k-doc corpus still deserves all
    # cores when each row costs ~100 µs of CPU. (A bytes-derived
    # target was tried in round 2 and collapsed small-but-hot corpora
    # to one partition — a 3x headline regression.)
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
