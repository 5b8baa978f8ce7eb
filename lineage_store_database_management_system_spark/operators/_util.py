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
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if min_parts is None:
        # Scale the target with the input size (Catalyst's plan-stats
        # estimate — for a bare scan, the file bytes): one partition
        # per ~2 MB of input. Over-splitting a tiny corpus costs more
        # in task scheduling than the parallelism returns; a corpus
        # big enough to need all cores still gets them.
        try:
            size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            target = max(1, min(target, size // (2 * 1024 * 1024)))
        except Exception:
            pass
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
