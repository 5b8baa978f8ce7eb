"""Sinks: format-dispatched writers (the counterpart of
``sources.readers``).

The reference's only sink is its hand-rolled struct/pickle/CSV
persistence (/root/reference/lstore/db.py:58-140, SURVEY §2.4) —
replaced here by Spark's native writers. Parquet is the primary sink
(columnar, schema-preserving, min/max + dictionary stats for pushdown
on re-read); CSV/JSON exist for interchange.

Scale notes: ``partition_by`` maps to Hive-style directory
partitioning (the thing that makes downstream partition pruning work);
``target_file_rows`` bounds file counts via ``repartition`` so a
100 TB write neither produces a million tiny files (NameNode/listing
pressure) nor ten giant ones (no scan parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_partitions: int | None = None,
    **options,
) -> None:
    """Write a DataFrame to a directory sink.

    ``target_partitions`` controls output file count per partition
    directory (repartition by the partition columns when given, else
    round-robin) — at scale, size this so files land in the
    100 MB - 1 GB sweet spot.
    """
    out = df
    if target_partitions is not None:
        if partition_by:
            out = df.repartition(target_partitions, *partition_by)
        else:
            out = df.repartition(target_partitions)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, str(v))
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt in ("json", "jsonl", "ndjson"):
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        raise ValueError(f"unsupported format: {fmt!r}")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a hash-bucketed (optionally sort-ordered) catalog table.

    Bucketing is THE shuffle-avoidance layout for repeated big-big
    joins/aggregations on the same key: two tables bucketed into the
    same ``n_buckets`` on the join key sort-merge-join with NO
    Exchange on either side (asserted in tests/test_plans_skew), and a
    ``groupBy`` on the bucket key needs no shuffle either. At 100 TB
    you pay one shuffle at write time and never again — size
    ``n_buckets`` so each bucket file lands in the 100 MB-1 GB range.

    ``path`` makes it an external table (files live there, catalog
    entry points at it); required under the default in-memory catalog
    when the data must outlive ad-hoc warehouse defaults.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)
