"""Sequence packing for pretraining-data pipelines (extension layer;
north-star LLM-pipeline component — the reference has no notion of
token streams).

GPT-style "concat and split" packing: documents are laid head-to-tail
in a deterministic order and the resulting token stream is cut into
fixed-length context windows. The pipeline needs, per document, its
byte/token offset in the stream and which context chunks it lands in
(a doc crossing a chunk boundary is split across training sequences).

Scale shape (100 TB): a GLOBAL running sum would serialize the corpus
through one partition, so the stream is packed independently per
``part_col`` (source/shard) — one window per partition group, which
is how production packers shard anyway (each worker packs its own
shard). The prefix sum is a single partitioned window over a
2-column projection; no joins, no explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_concat_split(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str | Column,
    context_len: int,
    part_col: str | None = None,
) -> DataFrame:
    """Assign every document its position in the packed token stream:
    ``(id, [part], n_tokens, tok_offset, first_chunk, last_chunk,
    n_chunks)`` where chunk ``i`` covers tokens ``[i*context_len,
    (i+1)*context_len)`` of its partition's stream.

    Documents are ordered by ``id_col`` within ``part_col`` (global
    stream if ``part_col`` is None — fine for small corpora, use a
    partition column at scale). Zero-token documents occupy no
    stream space: they report the chunk the cursor is in and
    ``n_chunks = 0``.
    """
    n = F.col(n_tokens_col) if isinstance(n_tokens_col, str) else n_tokens_col
    w = (
        Window.partitionBy(part_col) if part_col is not None else Window.partitionBy()
    ).orderBy(id_col)
    off = F.coalesce(
        F.sum(n).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    first = F.floor(off / context_len).cast("long")
    last = F.when(n > 0, F.floor((off + n - 1) / context_len).cast("long")).otherwise(
        first
    )
    cols = [F.col(id_col)] + ([F.col(part_col)] if part_col else [])
    return df.select(
        *cols,
        n.cast("long").alias("n_tokens"),
        off.cast("long").alias("tok_offset"),
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        F.when(n > 0, last - first + 1).otherwise(F.lit(0)).cast("long").alias(
            "n_chunks"
        ),
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str,
    seed: int = 0,
) -> dict:
    """Deterministic global shuffle + shard — the last mile before a
    trainer reads the corpus. Every row's position is a pure function
    of (seed, id): shard = pmod(xxhash64(seed, id), n_shards), order
    within the shard = the same hash — so the layout is reproducible
    across runs, clusters, and partitionings (no rand(), no
    zipWithIndex), and changing the seed is a full reshuffle. One
    hash-partitioned write, each shard one sorted file (at cluster
    scale raise files per shard via a second repartition level).
    Returns {shard: rows} from the write-side aggregation."""
    h = F.xxhash64(F.lit(seed), F.col(id_col))
    sharded = (
        df.withColumn("_shard", F.pmod(h, F.lit(n_shards)).cast("int"))
        .withColumn("_ord", h)
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_ord", id_col)
    )
    sharded.write.mode("overwrite").partitionBy("_shard").parquet(out_dir)
    spark = df.sparkSession
    counts = (
        spark.read.parquet(out_dir)
        .groupBy("_shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {int(r["_shard"]): int(r["n"]) for r in counts}


def repeat_by_weight(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Per-domain epoch repetition — the data-mixing knob that sees a
    domain w times per training pass (fractional w = a deterministic
    subset sees one extra epoch). Every row of domain d appears
    floor(w_d) times, plus once more iff
    ``pmod(xxhash64(seed, id), 2^31) < frac(w_d) * 2^31`` — RNG-free,
    so the realized corpus is a pure function of (seed, ids), stable
    under retries/partitioning, and a seed change redraws the
    fractional subset. Unlisted domains keep weight 1. An ``_epoch``
    column (0-based repeat index) disambiguates copies downstream
    (e.g. as part of the shard-writer sort key). Map-only: one
    explode, no shuffle."""
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    scale = 1 << 31
    frac_thresh = F.lit(0)
    n_full = F.lit(1)
    for d, w in weights.items():
        full, frac = int(w), w - int(w)
        n_full = F.when(F.col(domain_col) == d, F.lit(full)).otherwise(n_full)
        frac_thresh = F.when(
            F.col(domain_col) == d, F.lit(int(frac * scale))
        ).otherwise(frac_thresh)
    draw = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(scale))
    n_copies = n_full + (draw < frac_thresh).cast("int")
    return (
        df.withColumn("_n", n_copies)
        .where(F.col("_n") > 0)
        .withColumn(
            "_epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1))
        )
        .drop("_n")
    )
