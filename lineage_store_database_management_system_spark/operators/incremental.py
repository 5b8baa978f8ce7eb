"""Incremental (cross-run) deduplication against persisted stores.

At 100 TB you never re-dedup the whole corpus: each ingest batch is
deduplicated against a FINGERPRINT STORE built up by every previous
batch (the pattern behind production training-data pipelines — the
corpus-side state is a table of 8-byte digests / band hashes, never
raw text). Two granularities:

- exact     : xxhash64(normalized text) digests. A batch survives if
              its digest is unseen in the store AND it is the min-id
              holder of its digest within the batch.
- near-dup  : MinHash band hashes (same sketch layout as
              ``dedup.minhash_lsh_candidates``'s ``sketch_dir``) —
              candidates are batch docs sharing >= 1 LSH band bucket
              with a stored doc.

Scale shape: the store is Parquet partitioned by a digest bucket
(``fpb = pmod(_h, n_buckets)``); batch-side joins shuffle only 8-byte
digests + ids (never text), and a small batch prunes the store scan
to the buckets it actually touches. Store updates are plain Parquet
appends of new files (job-commit protocol: staged then renamed, so a
crashed update never publishes partial files). On a real cluster the
bucket layout makes the anti-join a co-partitioned storage join.

The reference has no dedup at all (extension layer, SURVEY §2.6);
the incremental flavor follows the corpus-level operators in
operators/dedup.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text
from .dedup import minhash_signatures

DEFAULT_BUCKETS = 64


def _digests(df: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    h = F.xxhash64(normalized_text(F.col(text_col)))
    return df.select(
        F.col(id_col).alias("keep_id"),
        h.alias("_h"),
        F.pmod(h, F.lit(n_buckets)).cast("int").alias("fpb"),
    )


def _store_df(spark, store_dir: str) -> DataFrame | None:
    if not os.path.isdir(store_dir) or not any(
        not f.startswith(("_", ".")) for f in os.listdir(store_dir)
    ):
        return None
    return spark.read.parquet(store_dir)


def update_fingerprint_store(
    df: DataFrame,
    id_col: str,
    text_col: str,
    store_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> int:
    """Append the digests of ``df``'s per-digest keepers (min id) that
    are not already stored. Returns the number of new fingerprints.
    Idempotent: re-running with the same input appends nothing."""
    spark = df.sparkSession
    fresh = (
        _digests(df, id_col, text_col, n_buckets)
        .groupBy("_h", "fpb")
        .agg(F.min("keep_id").alias("keep_id"))
    )
    stored = _store_df(spark, store_dir)
    if stored is not None:
        fresh = fresh.join(stored.select("_h"), on="_h", how="left_anti")
    fresh = fresh.select("_h", "keep_id", "fpb").persist()
    n = fresh.count()
    if n:
        fresh.write.mode("append").partitionBy("fpb").parquet(store_dir)
    fresh.unpersist()
    return n


def dedup_against_store(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    store_dir: str,
    update_store: bool = True,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Rows of ``batch`` that survive exact dedup against the store
    AND within the batch (min-id keeper per digest). With
    ``update_store`` the survivors' fingerprints are appended, so the
    next batch — or a replay of this one — deduplicates against them.

    The returned frame is materialized (localCheckpoint) BEFORE the
    store update: appending to the store triggers Spark's
    refreshByPath, which would silently RECOMPUTE a merely-persisted
    plan against the now-updated store and return zero survivors.
    Lineage truncation pins the answer to the pre-update store."""
    spark = batch.sparkSession
    d = _digests(batch, id_col, text_col, n_buckets)
    keepers = d.groupBy("_h", "fpb").agg(F.min("keep_id").alias("keep_id"))
    stored = _store_df(spark, store_dir)
    if stored is not None:
        # prune the store scan to buckets the batch actually touches —
        # for a small increment this skips most partitions on disk
        touched = [r["fpb"] for r in keepers.select("fpb").distinct().collect()]
        pruned = stored.where(F.col("fpb").isin(touched))
        keepers = keepers.join(pruned.select("_h"), on="_h", how="left_anti")
    survivors = batch.join(
        keepers.select(F.col("keep_id").alias(id_col)), on=id_col, how="left_semi"
    ).localCheckpoint(eager=True)
    if update_store:
        update_fingerprint_store(survivors, id_col, text_col, store_dir, n_buckets)
    return survivors


def update_minhash_store(
    df: DataFrame,
    id_col: str,
    text_col: str,
    store_dir: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
) -> None:
    """Append ``df``'s banded MinHash sketch rows (id, band, bh) to
    the near-dup store — the same layout
    ``dedup.minhash_lsh_candidates`` persists via ``sketch_dir``, so
    a corpus-level sketch can seed the incremental store directly."""
    banded = _banded(df, id_col, text_col, num_hashes, bands, shingle_words)
    banded.write.mode("append").parquet(store_dir)


def _banded(df, id_col, text_col, num_hashes, bands, shingle_words):
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_words)
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("signature")[b * r + j] for j in range(r)]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")


def minhash_candidates_against_store(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    store_dir: str,
    update_store: bool = True,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    bucket_cap: int | None = None,
) -> DataFrame:
    """(batch_id, store_id, n_shared_bands) candidate near-dup pairs
    between the new batch and everything previously stored. Work is
    proportional to band-bucket collisions (the join key is
    (band, bh)), exactly like the corpus-level LSH self-join — but
    the batch side is the increment, so each run touches the store
    once instead of re-pairing the whole corpus with itself.

    ``bucket_cap``: the bipartite analogue of the corpus-level star
    link (dedup.minhash_lsh_candidates) — an sf10 run on a 100-way
    clone-family corpus showed the uncapped bucket join emitting
    store_rows x batch_rows pairs per hot bucket. With a cap, any
    (band, bh) bucket holding more than ``bucket_cap`` STORE rows
    links each colliding batch doc to the bucket's minimum store id
    only (its hub) instead of to every member. A batch doc still
    surfaces as "has a near-dup in the store" with a concrete
    representative — the property incremental ingest dedup consumes —
    and hub-linked rows count oversized-bucket bands in
    n_shared_bands just like exhaustive ones. Default None preserves
    exhaustive pairs."""
    spark = batch.sparkSession
    banded = _banded(
        batch, id_col, text_col, num_hashes, bands, shingle_words
    ).persist()
    banded.count()
    stored = _store_df(spark, store_dir)
    if stored is None:
        out = spark.createDataFrame(
            [], "batch_id long, store_id long, n_shared_bands long"
        )
    else:
        a = banded.alias("a")
        if bucket_cap is not None:
            # One aggregate over the store keyed on the SAME (band, bh)
            # as the pair join — co-partitioned, no extra shuffle shape.
            stats = stored.groupBy("band", "bh").agg(
                F.count(F.lit(1)).alias("_ssz"), F.min(id_col).alias("_hub")
            )
            small = stored.join(
                stats.where(F.col("_ssz") <= bucket_cap), on=["band", "bh"]
            ).drop("_ssz", "_hub")
            exhaustive = a.join(
                small.alias("b"),
                (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")),
            ).select(
                F.col(f"a.{id_col}").alias("batch_id"),
                F.col(f"b.{id_col}").alias("store_id"),
            )
            # Oversized buckets: hub only — batch_rows pairs per bucket
            # instead of batch_rows x store_rows. Join against the
            # (band, bh, _hub) stats rows themselves, never the members.
            star = a.join(
                stats.where(F.col("_ssz") > bucket_cap).alias("s"),
                (F.col("a.band") == F.col("s.band")) & (F.col("a.bh") == F.col("s.bh")),
            ).select(
                F.col(f"a.{id_col}").alias("batch_id"),
                F.col("s._hub").alias("store_id"),
            )
            pairs = exhaustive.unionByName(star)
        else:
            pairs = (
                a.join(
                    stored.alias("b"),
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bh") == F.col("b.bh")),
                ).select(
                    F.col(f"a.{id_col}").alias("batch_id"),
                    F.col(f"b.{id_col}").alias("store_id"),
                )
            )
        # localCheckpoint, not persist: the store append below fires
        # refreshByPath, which would recompute a persisted plan
        # against the post-append store (pairing the batch with its
        # own freshly-added bands)
        out = (
            pairs.groupBy("batch_id", "store_id")
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
            .localCheckpoint(eager=True)
        )
    if update_store:
        banded.write.mode("append").parquet(store_dir)
    banded.unpersist()
    return out


def dedup_cdc_inserts(
    table,
    store_dir: str,
    id_col: str,
    text_col: str,
    update_store: bool = True,
    n_buckets: int = DEFAULT_BUCKETS,
):
    """The lineage-native ingest-dedup loop: dedup a lineage table's
    newly INSERTED documents against the fingerprint store, resuming
    from the watermark the store recorded last time. Each call
    processes only the CDC window since the previous one
    (``changes_between`` — an incremental scan, not a snapshot diff),
    so repeated invocation over a growing table does work
    proportional to the NEW documents. Returns ``(survivors_df,
    window)`` where ``window`` is the ``(from_seq, to_seq]`` range
    this call covered; the watermark advances only when
    ``update_store`` is set (a dry run inspects without consuming).
    """
    import json

    from pyspark.sql import functions as F

    wm_path = os.path.join(store_dir, "_cdc_watermark.json")
    last = 0
    if os.path.isfile(wm_path):
        with open(wm_path) as f:
            last = int(json.load(f)["last_seq"])
    to_seq = table.watermark()
    feed = (
        table.changes_between(last, to_seq)
        .where(F.col("_op") == "I")
        .select(id_col, text_col)
    )
    survivors = dedup_against_store(
        feed, id_col, text_col, store_dir, update_store=update_store,
        n_buckets=n_buckets,
    )
    if update_store:
        tmp = wm_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_seq": int(to_seq)}, f)
        os.replace(tmp, wm_path)
    return survivors, (last, int(to_seq))


def update_simhash_store(
    df: DataFrame,
    id_col: str,
    text_col: str,
    store_dir: str,
    max_hamming: int = 3,
    blocks: int | None = None,
) -> None:
    """Append ``df``'s pigeonhole-exploded SimHash rows
    (id, simhash, blk, bv) — the same layout
    ``dedup.simhash_candidates`` persists via ``sketch_dir``, so a
    corpus sketch seeds this store directly (third member of the
    incremental family, after exact digests and MinHash bands)."""
    from .dedup import simhash_exploded

    if blocks is None:
        blocks = min(64, max_hamming + 1)
    simhash_exploded(df, id_col, text_col, blocks).write.mode("append").parquet(
        store_dir
    )


def simhash_candidates_against_store(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    store_dir: str,
    update_store: bool = True,
    max_hamming: int = 3,
    blocks: int | None = None,
) -> DataFrame:
    """(batch_id, store_id, hamming) near-dup candidates of the new
    batch against everything stored: pigeonhole guarantees any pair
    within ``max_hamming`` shares an exact (blk, bv) bucket, the join
    verifies with bit_count(a XOR b). One bucket join per increment."""
    from .dedup import simhash_exploded

    if blocks is None:
        blocks = min(64, max_hamming + 1)
    spark = batch.sparkSession
    ex = simhash_exploded(batch, id_col, text_col, blocks).persist()
    ex.count()
    stored = _store_df(spark, store_dir)
    if stored is None:
        out = spark.createDataFrame([], "batch_id long, store_id long, hamming long")
    else:
        ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        out = (
            ex.alias("a")
            .join(
                stored.alias("b"),
                (F.col("a.blk") == F.col("b.blk")) & (F.col("a.bv") == F.col("b.bv")),
            )
            .select(
                F.col(f"a.{id_col}").alias("batch_id"),
                F.col(f"b.{id_col}").alias("store_id"),
                ham.cast("long").alias("hamming"),
            )
            .where(F.col("hamming") <= max_hamming)
            .distinct()
            .localCheckpoint(eager=True)  # pin before the append below
        )
    if update_store:
        ex.write.mode("append").parquet(store_dir)
    ex.unpersist()
    return out
