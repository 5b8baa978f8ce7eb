"""Time-series gap-filling (extension layer — the reference has no
time-series surface at all, SURVEY §2.6; the shape is TimescaleDB's
``time_bucket_gapfill`` + ``locf()``).

Scale shape: the dense grid is built by exploding ONE
``sequence(start, end, interval)`` array per distinct key — the
explode is map-side over a frame bounded by key cardinality (never by
raw event count), the observed side is pre-aggregated per (key,
bucket) before the join, and the carry-forward is a per-key window —
every shuffle keys on the series key, so a 100 TB event log with a
bounded device/user population stays bounded after the first
aggregate. No UDFs; everything is Catalyst expressions + one window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._util import spread


def gapfill_locf(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    start: str,
    end: str,
    bucket: str = "hour",
    agg: str = "avg",
    round_to: int = 4,
) -> DataFrame:
    """Dense per-key time grid from ``start`` to ``end`` (inclusive,
    ``bucket`` granularity: 'hour' or 'day') with the per-bucket
    ``agg`` of ``value_col``; empty buckets carry the last observed
    value forward (LOCF). Buckets before a key's first observation
    stay NULL (nothing to carry). Returns
    (key, bucket, observed, filled, is_gap).

    ``observed`` is the bucket's own aggregate (NULL for gaps),
    ``filled`` the carry-forward, rounded for engine-stable hashing.
    """
    if bucket not in ("hour", "day"):
        raise ValueError(f"unsupported bucket {bucket!r}")
    step = F.expr(f"interval 1 {bucket}")
    agg_fn = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}[agg]

    observed = (
        spread(df)
        .select(
            F.col(key_col).alias("_k"),
            F.date_trunc(bucket, F.col(ts_col)).alias("_b"),
            F.col(value_col).alias("_v"),
        )
        .where(
            (F.col("_b") >= F.lit(start).cast("timestamp"))
            & (F.col("_b") <= F.lit(end).cast("timestamp"))
        )
        .groupBy("_k", "_b")
        .agg(F.round(agg_fn("_v"), round_to).alias("observed"))
    )
    grid = (
        df.select(F.col(key_col).alias("_k"))
        .distinct()
        .select(
            "_k",
            F.explode(
                F.sequence(
                    F.lit(start).cast("timestamp"),
                    F.lit(end).cast("timestamp"),
                    step,
                )
            ).alias("_b"),
        )
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(observed, on=["_k", "_b"], how="left")
        .select(
            F.col("_k").alias(key_col),
            F.col("_b").alias("bucket"),
            F.col("observed"),
            F.last("observed", ignorenulls=True).over(w).alias("filled"),
            F.col("observed").isNull().alias("is_gap"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    end: str,
    round_to: int = 4,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key time-weighted average of an irregularly-sampled signal
    up to ``end``: each observation's value is weighted by how long it
    remained current (the interval to the next observation, the last
    one extending to ``end``) — the step-function integral TimescaleDB
    calls ``time_weight('LOCF', ...)``. One per-key window (lead) +
    one aggregate; shuffles key on the series key only.

    ``tiebreak_col`` makes the within-timestamp ordering total (same-
    ts observations otherwise get engine-dependent zero-duration
    assignment)."""
    order = [F.col("_t")] + ([F.col("_tb")] if tiebreak_col else [])
    w = Window.partitionBy("_k").orderBy(*order)
    cols = [
        F.col(key_col).alias("_k"),
        F.col(ts_col).cast("timestamp").alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    ]
    if tiebreak_col:
        cols.append(F.col(tiebreak_col).alias("_tb"))
    stepped = (
        spread(df)
        .select(*cols)
        .where(F.col("_t") <= F.lit(end).cast("timestamp"))
        .withColumn(
            "_dur",
            F.coalesce(
                F.lead("_t").over(w), F.lit(end).cast("timestamp")
            ).cast("double")
            - F.col("_t").cast("double"),
        )
    )
    return (
        stepped.groupBy(F.col("_k").alias(key_col))
        .agg(
            F.round(
                F.sum(F.col("_v") * F.col("_dur")) / F.sum("_dur"), round_to
            ).alias("tw_avg"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
