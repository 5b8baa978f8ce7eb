"""Hypertable-style continuous rollups ("real-time aggregates").

The TimescaleDB / Druid pattern for time-series at scale: time
buckets at or before a SEAL boundary are served from a pre-aggregated
rollup table (a bare Parquet scan — no touch of raw data), and only
the open tail past the boundary is aggregated from raw events at
query time. Exactness holds because the seal boundary is a bucket
edge: every raw event belongs to exactly one side.

Partial-aggregate state (count + sum [+ min/max]) is stored rather
than finished averages, so sealed buckets can be advanced
incrementally — refresh aggregates ONLY raw events in
(sealed_until, new_boundary] and appends those buckets, never
recomputing history. The same state merges with the live tail when a
query straddles a refresh.

At 100 TB: the rollup table is ~ (n_buckets x n_groups) rows —
orders of magnitude smaller than raw — and the query-time scan of
raw is bounded by one open bucket's worth of data, pruned by the
``ts >= sealed_until`` predicate pushed into the Parquet scan. The
rollup dir is partitioned by bucket date so bucket-range queries
prune partitions.

Beyond the reference (it has no time-series support at all);
extension layer per SURVEY §2.6.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META = "_rollup_meta.json"
_GRAINS = {"hour": "1 hour", "day": "1 day", "minute": "1 minute"}
_QSKETCH = "_qsketch"  # underscore prefix: hidden from the rollup's own scan


def _bucket(ts_col: str, grain: str):
    if grain not in _GRAINS:
        raise ValueError(f"grain must be one of {sorted(_GRAINS)}, got {grain!r}")
    return F.date_trunc(grain, F.col(ts_col))


def _state_agg(value_col: str, distinct_col: str | None = None):
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    ]
    if distinct_col:
        # HyperLogLog state, not a finished count: per-bucket distinct
        # counts cannot be re-aggregated (sum overcounts), but HLL
        # sketches UNION losslessly — any bucket range or regrouping
        # re-merges the sealed sketches without touching raw data.
        # lgConfigK=14 (16 KiB/bucket): stderr 1.04/sqrt(2^14) = 0.81%
        # — the default 12 (1.6%) left the registry's 2% accuracy gate
        # at ~1.2 sigma, which duly broke at sf1 cardinalities (first
        # post-sparse-mode day missed by >2%). State is still constant
        # in data volume; only the constant grew 4x.
        aggs.append(F.hll_sketch_agg(distinct_col, 14).alias("hll_state"))
    return aggs


def _meta_path(rollup_dir: str) -> str:
    return os.path.join(rollup_dir, _META)


def _qsketch_rows(
    events: DataFrame, meta: dict, lo=None, hi=None
) -> DataFrame:
    """Per-bucket quantile-sketch histogram rows (see
    operators/quantile.py) for the raw events in [lo, hi) — the
    mergeable state that answers percentiles over sealed history
    without re-reading raw data."""
    from . import quantile as _q

    ts, bucket = meta["ts_col"], _bucket(meta["ts_col"], meta["grain"])
    if lo is not None:
        events = events.where(F.col(ts) >= F.lit(lo))
    if hi is not None:
        events = events.where(F.col(ts) < F.lit(hi))
    return _q.quantile_sketch(
        events.withColumn("bucket", bucket),
        ["bucket", *meta["key_cols"]],
        meta["quantile_col"],
        meta.get("quantile_alpha", 0.01),
    ).withColumn("bucket_date", F.to_date("bucket"))


def rollup_meta(rollup_dir: str) -> dict:
    with open(_meta_path(rollup_dir)) as f:
        return json.load(f)


def create_rollup(
    events: DataFrame,
    rollup_dir: str,
    seal_before,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    grain: str = "hour",
    distinct_col: str | None = None,
    quantile_col: str | None = None,
    quantile_alpha: float = 0.01,
) -> None:
    """Materialize partial-aggregate state for every bucket strictly
    before ``seal_before`` (a bucket edge; events at or past it stay
    in the open tail). One aggregation job over the sealed range.
    With ``distinct_col``, each bucket also stores an HLL sketch of
    that column (see :func:`_state_agg`); with ``quantile_col``, a
    mergeable log-histogram quantile sketch of that column lands in a
    ``_qsketch`` side table (operators/quantile.py) so sealed-history
    percentiles never re-read raw events."""
    key_cols = key_cols or []
    bucket = _bucket(ts_col, grain)
    sealed = (
        events.where(F.col(ts_col) < F.lit(seal_before))
        .groupBy(bucket.alias("bucket"), *key_cols)
        .agg(*_state_agg(value_col, distinct_col))
        .withColumn("bucket_date", F.to_date("bucket"))
    )
    sealed.write.mode("overwrite").partitionBy("bucket_date").parquet(rollup_dir)
    meta = {
        "sealed_until": str(seal_before),
        "ts_col": ts_col,
        "key_cols": key_cols,
        "value_col": value_col,
        "grain": grain,
        "distinct_col": distinct_col,
        "quantile_col": quantile_col,
        "quantile_alpha": quantile_alpha,
    }
    if quantile_col:
        _qsketch_rows(events, meta, hi=seal_before).write.mode(
            "overwrite"
        ).partitionBy("bucket_date").parquet(os.path.join(rollup_dir, _QSKETCH))
    tmp = _meta_path(rollup_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(rollup_dir))


def refresh_rollup(events: DataFrame, rollup_dir: str, seal_before) -> int:
    """Advance the seal boundary: aggregate ONLY raw events in
    [old_boundary, new_boundary) and append those buckets. History is
    never rescanned — refresh cost tracks the new data, not the
    table. Returns the number of appended bucket rows."""
    meta = rollup_meta(rollup_dir)
    lo = meta["sealed_until"]
    bucket = _bucket(meta["ts_col"], meta["grain"])
    fresh = (
        events.where(
            (F.col(meta["ts_col"]) >= F.lit(lo))
            & (F.col(meta["ts_col"]) < F.lit(seal_before))
        )
        .groupBy(bucket.alias("bucket"), *meta["key_cols"])
        .agg(*_state_agg(meta["value_col"], meta.get("distinct_col")))
        .withColumn("bucket_date", F.to_date("bucket"))
        .localCheckpoint(eager=True)  # pin before touching the dir we read from
    )
    n = fresh.count()
    if n:
        fresh.write.mode("append").partitionBy("bucket_date").parquet(rollup_dir)
    if meta.get("quantile_col"):
        q = _qsketch_rows(
            events, meta, lo=lo, hi=seal_before
        ).localCheckpoint(eager=True)
        if q.limit(1).count():
            q.write.mode("append").partitionBy("bucket_date").parquet(
                os.path.join(rollup_dir, _QSKETCH)
            )
    meta["sealed_until"] = str(seal_before)
    tmp = _meta_path(rollup_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(rollup_dir))
    return n


def rollup_query(
    spark: SparkSession,
    rollup_dir: str,
    raw_events: DataFrame,
    bucket_lo=None,
    bucket_hi=None,
    keep_sketch: bool = False,
) -> DataFrame:
    """The real-time aggregate: sealed buckets from the rollup table
    (bare Parquet scan, partition-pruned by the bucket range) UNION
    the open tail aggregated from raw at query time (``ts >=
    sealed_until`` pushed into the raw scan). Returns finished
    aggregates per (bucket, *key_cols): n_events, sum/avg/min/max.

    Exact at every instant: the boundary is a bucket edge, so no
    bucket is half-sealed. With a ``distinct_col`` rollup the output
    carries ``n_distinct_est`` (merged-HLL estimate); pass
    ``keep_sketch`` to ALSO keep the mergeable ``hll_state`` so
    callers can re-merge across buckets (see
    :func:`estimate_distinct`)."""
    meta = rollup_meta(rollup_dir)
    dcol = meta.get("distinct_col")
    sealed = spark.read.parquet(rollup_dir).drop("bucket_date")
    bucket = _bucket(meta["ts_col"], meta["grain"])
    tail = (
        raw_events.where(F.col(meta["ts_col"]) >= F.lit(meta["sealed_until"]))
        .groupBy(bucket.alias("bucket"), *meta["key_cols"])
        .agg(*_state_agg(meta["value_col"], dcol))
    )
    merge_aggs = [
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    ]
    if dcol:
        merge_aggs.append(F.hll_union_agg("hll_state").alias("hll_state"))
    merged = (
        sealed.unionByName(tail)
        # a bucket can appear in both halves only if the tail was
        # refreshed into the rollup between plan build and execution;
        # merging partial states keeps the answer exact regardless
        .groupBy("bucket", *meta["key_cols"])
        .agg(*merge_aggs)
        .withColumn("avg_value", F.col("sum_value") / F.col("n_events"))
    )
    if dcol:
        merged = merged.withColumn(
            "n_distinct_est", F.hll_sketch_estimate("hll_state")
        )
        if not keep_sketch:
            merged = merged.drop("hll_state")
    if bucket_lo is not None:
        merged = merged.where(F.col("bucket") >= F.lit(bucket_lo))
    if bucket_hi is not None:
        merged = merged.where(F.col("bucket") < F.lit(bucket_hi))
    return merged


def estimate_distinct(rolled: DataFrame, group_cols: list[str]) -> DataFrame:
    """Re-aggregate a ``keep_sketch=True`` rollup result to ANY
    coarser grouping (hour sketches -> daily / weekly / per-key
    distinct counts) by unioning the HLL states — the query that
    finished distinct counts cannot answer from pre-aggregates (sums
    of per-bucket distincts overcount shared members). One sketch
    merge, zero raw-data access."""
    return rolled.groupBy(*group_cols).agg(
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("hll_state")).alias("n_distinct_est"),
    )


def rollup_quantile_state(
    spark: SparkSession,
    rollup_dir: str,
    raw_events: DataFrame,
    bucket_lo=None,
    bucket_hi=None,
) -> DataFrame:
    """The real-time quantile-sketch state per (bucket, *key_cols):
    sealed buckets from the stored ``_qsketch`` side table (bare
    Parquet scan, partition-pruned by the bucket range), the open
    tail sketched from raw events past ``sealed_until`` at query
    time. Histogram rows — regroup to ANY coarser key (daily from
    hourly, per-key from per-bucket) with
    :func:`quantile.merge_quantile_sketches` before extraction."""
    meta = rollup_meta(rollup_dir)
    if not meta.get("quantile_col"):
        raise ValueError(f"rollup at {rollup_dir} has no quantile_col state")
    sealed = spark.read.parquet(os.path.join(rollup_dir, _QSKETCH)).drop(
        "bucket_date"
    )
    tail = _qsketch_rows(raw_events, meta, lo=meta["sealed_until"]).drop(
        "bucket_date"
    )
    merged = sealed.unionByName(tail)
    if bucket_lo is not None:
        merged = merged.where(F.col("bucket") >= F.lit(bucket_lo))
    if bucket_hi is not None:
        merged = merged.where(F.col("bucket") < F.lit(bucket_hi))
    return merged


def rollup_quantiles(
    spark: SparkSession,
    rollup_dir: str,
    raw_events: DataFrame,
    qs: list[float],
    bucket_lo=None,
    bucket_hi=None,
) -> DataFrame:
    """Real-time percentiles from a ``quantile_col`` rollup: the
    merged sealed+tail histogram (:func:`rollup_quantile_state`)
    yields every requested q within ``quantile_alpha`` relative
    error — the query finished per-bucket percentiles cannot answer
    (a p95 of p95s is meaningless; histogram counts merge
    losslessly). Output: (bucket, *key_cols, q, quantile_est)."""
    from . import quantile as _q

    meta = rollup_meta(rollup_dir)
    merged = rollup_quantile_state(
        spark, rollup_dir, raw_events, bucket_lo, bucket_hi
    )
    keys = ["bucket", *meta["key_cols"]]
    sketch = _q.merge_quantile_sketches([merged], keys)
    return _q.sketch_quantiles(
        sketch, keys, qs, meta.get("quantile_alpha", 0.01)
    )


def stream_maintain_rollup(
    stream_df: DataFrame,
    rollup_dir: str,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    grain: str = "hour",
    distinct_col: str | None = None,
    quantile_col: str | None = None,
    quantile_alpha: float = 0.01,
) -> int:
    """Maintain a rollup FROM A STREAM: every micro-batch aggregates
    to partial state and lands in its own ``batch=<id>`` partition —
    ``foreachBatch`` replay after a crash OVERWRITES the same
    partition, so maintenance is idempotent across checkpoint
    restarts with no marker bookkeeping (the partition IS the
    marker). The rollup is a partial-state log: the same bucket may
    appear in many batches, and :func:`streaming_rollup_state` merges
    states exactly — the same property that makes a mid-refresh
    ``rollup_query`` exact. With ``quantile_col`` each micro-batch
    also logs its quantile-sketch histogram (``qdata/batch=<id>``,
    same idempotence) for :func:`streaming_rollup_quantiles`. Drains
    available input (availableNow); returns the number of
    micro-batches processed this run."""
    key_cols = key_cols or []
    data_dir = os.path.join(rollup_dir, "data")
    os.makedirs(rollup_dir, exist_ok=True)
    meta = {
        "ts_col": ts_col,
        "key_cols": key_cols,
        "value_col": value_col,
        "grain": grain,
        "distinct_col": distinct_col,
        "quantile_col": quantile_col,
        "quantile_alpha": quantile_alpha,
        "streaming": True,
    }
    tmp = _meta_path(rollup_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(rollup_dir))
    bucket = _bucket(ts_col, grain)
    n = {"n": 0}

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.groupBy(bucket.alias("bucket"), *key_cols).agg(
            *_state_agg(value_col, distinct_col)
        )
        part.write.mode("overwrite").parquet(
            os.path.join(data_dir, f"batch={batch_id}")
        )
        if quantile_col:
            from . import quantile as _q

            _q.quantile_sketch(
                batch_df.withColumn("bucket", bucket),
                ["bucket", *key_cols],
                quantile_col,
                quantile_alpha,
            ).write.mode("overwrite").parquet(
                os.path.join(rollup_dir, "qdata", f"batch={batch_id}")
            )
        n["n"] += 1

    q = (
        stream_df.writeStream.foreachBatch(_upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(rollup_dir, "_checkpoint"))
        .start()
    )
    q.awaitTermination()
    return n["n"]


def streaming_rollup_state(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Merged finished aggregates of a stream-maintained rollup —
    one partial-state merge over the batch log, no raw events."""
    meta = rollup_meta(rollup_dir)
    parts = spark.read.parquet(os.path.join(rollup_dir, "data")).drop("batch")
    merge_aggs = [
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    ]
    if meta.get("distinct_col"):
        merge_aggs.append(F.hll_union_agg("hll_state").alias("hll_state"))
    out = parts.groupBy("bucket", *meta["key_cols"]).agg(*merge_aggs)
    if meta.get("distinct_col"):
        out = out.withColumn(
            "n_distinct_est", F.hll_sketch_estimate("hll_state")
        ).drop("hll_state")
    return out


def streaming_rollup_quantiles(
    spark: SparkSession, rollup_dir: str, qs: list[float]
) -> DataFrame:
    """Percentiles of a stream-maintained ``quantile_col`` rollup:
    merge the per-micro-batch sketch log (one sum per bucket) and
    extract — same guarantees as :func:`rollup_quantiles`, zero raw
    or in-flight data access."""
    from . import quantile as _q

    meta = rollup_meta(rollup_dir)
    if not meta.get("quantile_col"):
        raise ValueError(f"rollup at {rollup_dir} has no quantile_col state")
    parts = spark.read.parquet(os.path.join(rollup_dir, "qdata")).drop("batch")
    keys = ["bucket", *meta["key_cols"]]
    sketch = _q.merge_quantile_sketches([parts], keys)
    return _q.sketch_quantiles(
        sketch, keys, qs, meta.get("quantile_alpha", 0.01)
    )


def patch_rollup(
    events: DataFrame,
    rollup_dir: str,
    bucket_lo,
    bucket_hi,
) -> int:
    """Late-data / backfill repair: recompute the SEALED buckets in
    ``[bucket_lo, bucket_hi)`` from raw and swap them in — the
    bounded-work answer to events that arrived behind the seal
    boundary (a sealed bucket was materialized without them, and
    ``rollup_query``'s tail predicate will never look at them again).
    Work is proportional to the patched range: only the affected
    bucket-date partitions rewrite (dynamic partition overwrite);
    rows of those dates OUTSIDE the range are carried over untouched.
    Returns the number of bucket rows written into the range."""
    meta = rollup_meta(rollup_dir)
    if str(bucket_hi) > meta["sealed_until"]:
        raise ValueError(
            f"patch range end {bucket_hi} exceeds sealed_until "
            f"{meta['sealed_until']}; the open tail needs no patching"
        )
    spark = events.sparkSession
    bucket = _bucket(meta["ts_col"], meta["grain"])
    fresh = (
        events.where(
            (F.col(meta["ts_col"]) >= F.lit(bucket_lo))
            & (F.col(meta["ts_col"]) < F.lit(bucket_hi))
        )
        .groupBy(bucket.alias("bucket"), *meta["key_cols"])
        .agg(*_state_agg(meta["value_col"], meta.get("distinct_col")))
        .withColumn("bucket_date", F.to_date("bucket"))
    )
    stored = spark.read.parquet(rollup_dir)
    dates = [r["bucket_date"] for r in fresh.select("bucket_date").distinct().collect()]
    keep = stored.where(
        F.col("bucket_date").isin(dates)
        & ~(
            (F.col("bucket") >= F.lit(bucket_lo))
            & (F.col("bucket") < F.lit(bucket_hi))
        )
    )
    # pin BEFORE the overwrite: both inputs read the directory being
    # rewritten (and refreshByPath would recompute a lazy plan
    # against the half-written state)
    out = fresh.unionByName(keep).localCheckpoint(eager=True)
    n = fresh.count()
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket_date")
        .parquet(rollup_dir)
    )
    if meta.get("quantile_col"):
        qdir = os.path.join(rollup_dir, _QSKETCH)
        qfresh = _qsketch_rows(events, meta, lo=bucket_lo, hi=bucket_hi)
        qkeep = spark.read.parquet(qdir).where(
            F.col("bucket_date").isin(dates)
            & ~(
                (F.col("bucket") >= F.lit(bucket_lo))
                & (F.col("bucket") < F.lit(bucket_hi))
            )
        )
        qout = qfresh.unionByName(qkeep).localCheckpoint(eager=True)
        (
            qout.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket_date")
            .parquet(qdir)
        )
    return n


def late_arrival_range(batch: DataFrame, rollup_dir: str):
    """Ingest-side detection for :func:`patch_rollup`: given a batch
    about to be appended to the raw table, return the (bucket_lo,
    sealed_until) range it invalidates — the late rows' earliest
    bucket up to the seal — or None when nothing in the batch lands
    behind the seal. O(batch), never a rescan of the table: at scale
    the writer calls this per ingest and patches exactly the
    invalidated range."""
    meta = rollup_meta(rollup_dir)
    sealed = meta["sealed_until"]
    bucket = _bucket(meta["ts_col"], meta["grain"])
    row = (
        batch.where(F.col(meta["ts_col"]) < F.lit(sealed))
        .agg(F.min(bucket).alias("lo"))
        .collect()[0]
    )
    if row["lo"] is None:
        return None
    return (str(row["lo"]), sealed)
