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


def gapfill_interpolate(
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
    """Dense per-key grid like :func:`gapfill_locf`, but gaps fill by
    LINEAR INTERPOLATION between the surrounding observations
    (TimescaleDB's ``interpolate()``): a gap at t between observations
    (t0, v0) and (t1, v1) fills with v0 + (v1-v0)*(t-t0)/(t1-t0).
    Gaps after the last observation carry the last value forward
    (nothing ahead to interpolate toward); gaps before the first stay
    NULL. Same scale shape as LOCF — grid bounded by key cardinality,
    observed side pre-aggregated, then two per-key windows (the
    backward look and the forward look); no UDFs."""
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
    wb = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("observed").isNotNull(), F.col("_b"))
    joined = (
        grid.join(observed, on=["_k", "_b"], how="left")
        .select(
            "_k",
            "_b",
            "observed",
            F.last("observed", ignorenulls=True).over(wb).alias("_pv"),
            F.last(obs_ts, ignorenulls=True).over(wb).alias("_pt"),
            F.first("observed", ignorenulls=True).over(wf).alias("_nv"),
            F.first(obs_ts, ignorenulls=True).over(wf).alias("_nt"),
        )
    )
    frac = (
        (F.unix_timestamp("_b") - F.unix_timestamp("_pt")).cast("double")
        / (F.unix_timestamp("_nt") - F.unix_timestamp("_pt")).cast("double")
    )
    interp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac
    filled = (
        F.when(F.col("observed").isNotNull(), F.col("observed"))
        .when(F.col("_pv").isNotNull() & F.col("_nv").isNotNull(),
              F.round(interp, round_to))
        .when(F.col("_pv").isNotNull(), F.col("_pv"))
    )
    return joined.select(
        F.col("_k").alias(key_col),
        F.col("_b").alias("bucket"),
        F.col("observed"),
        filled.alias("filled"),
        F.col("observed").isNull().alias("is_gap"),
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


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    alpha: float = 0.25,
) -> DataFrame:
    """Per-key exponentially-weighted moving average, final value per
    key: e_1 = v_1, e_i = alpha*v_i + (1-alpha)*e_{i-1} over events
    ordered by (ts, tiebreak). The recursion is inherently sequential
    per key — not a windowed aggregate — so it runs as a Catalyst
    higher-order fold over the key's sorted value array: one shuffle
    to group, then array arithmetic; no UDF, no iteration driver-side.

    DETERMINISM: the fold order is total (ts, tiebreak), so the IEEE
    double sequence is identical on any engine that folds in order —
    unlike associative float SUMs, whose reduction tree varies. The
    result is scaled to integer ten-thousandths (floor(x*1e4 + 0.5))
    rather than ROUND'ed, the boundary-proof comparator from
    SCALING.md's rotation catches.

    Per-key state is the key's full event array — fine for per-entity
    series (bounded churn per key); for million-event keys use the
    rollup path instead. Returns (key, n_events, ewma_e4 bigint)."""
    seq = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(order_tiebreak).alias("k"),
                F.col(value_col).cast("double").alias("v"),
            )
        )
    )
    grouped = df.groupBy(F.col(key_col)).agg(seq.alias("_seq"))
    vals = F.transform(F.col("_seq"), lambda s: s["v"])
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: x * F.lit(alpha) + acc * F.lit(1.0 - alpha),
    )
    return grouped.select(
        F.col(key_col),
        F.size("_seq").cast("long").alias("n_events"),
        F.floor(folded * 10000 + F.lit(0.5)).cast("long").alias("ewma_e4"),
    )


def funnel_stages(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    order_tiebreak: str,
) -> DataFrame:
    """Ordered-funnel analysis: the furthest step each key reached,
    where step i+1 counts only STRICTLY AFTER the event that
    completed step i (the standard product-analytics funnel, not
    set-membership). One shuffle groups each key's (ts, type) events;
    a Catalyst fold walks the sorted sequence as a state machine —
    equivalent to the chained min-timestamp formulation but one pass,
    no self-joins, and the state is a single int per key.

    Returns (key, funnel_stage) with stage in [0, len(steps)]."""
    seq = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(order_tiebreak).alias("k"),
                F.col(type_col).alias("y"),
            )
        )
    )
    grouped = df.groupBy(F.col(key_col)).agg(seq.alias("_seq"))
    n = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    stage = F.aggregate(
        F.col("_seq"),
        F.lit(0),
        lambda acc, e: F.when(
            (acc < n) & (e["y"] == F.element_at(step_arr, acc + 1)), acc + 1
        ).otherwise(acc),
    )
    return grouped.select(
        F.col(key_col), stage.cast("long").alias("funnel_stage")
    )
