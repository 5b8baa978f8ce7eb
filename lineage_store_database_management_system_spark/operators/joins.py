"""Temporal join operators Spark lacks as built-ins: as-of join and
interval (range) join (extension layer — the reference has no joins of
any kind, SURVEY §2.6).

Both are compositions of existing DataFrame ops chosen for their 100 TB
shape rather than the naive join+filter formulation:

- **as_of_join** uses the union-then-window formulation: tag both
  inputs, union them, and carry the last right-side value forward with
  ``last(..., ignorenulls=True)`` over a per-key event-time window.
  Cost: ONE shuffle on the join key (the same shuffle a plain equi-join
  would pay) and no build-side explosion — unlike the naive
  ``left.join(right, key).where(r_ts <= l_ts)`` + rank, which
  materializes |left_per_key| x |right_per_key| intermediate rows per
  key before pruning. Skewed keys degrade exactly like any keyed
  window: salt the key upstream if one user dominates.
- **interval_join** equi-joins where it can and broadcasts where it
  can't: the intervals side of a training pipeline (promo windows,
  maintenance windows, session boundaries) is small, so the range
  predicate rides a broadcast nested-loop join — the probe side streams
  once, no shuffle at all. At 1000-executor scale with a LARGE interval
  side you would instead bucketize both sides by coarse time bucket and
  equi-join on the bucket (helper ``bucketized_interval_join``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right_ts <= left_ts`` for the same ``key`` (NULLs when no right
    row precedes it). Right rows at exactly ``left_ts`` match, like
    DuckDB/QuestDB ASOF JOIN semantics.

    Implementation: union the two inputs with a side tag and compute
    ``last(right value) ignorenulls`` over
    ``partitionBy(key).orderBy(ts, side)`` — right rows sort before
    left rows at equal timestamps so same-instant matches are visible.
    One shuffle total, linear in |left| + |right|.

    When several RIGHT rows share a timestamp, which one is "most
    recent" is undefined; pass ``right_tiebreak`` (a right column,
    e.g. an event id) to make the choice total-order deterministic
    (the largest tiebreak value wins).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    lcols = [c for c in left.columns]
    # side 0 = right (sorts first at equal ts), side 1 = left
    tb_type = right.schema[right_tiebreak].dataType if right_tiebreak else None
    r = right.select(
        F.col(key).alias(key),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *([F.col(right_tiebreak).alias("_tb")] if right_tiebreak else []),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(key).alias(key),
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *([F.lit(None).cast(tb_type).alias("_tb")] if right_tiebreak else []),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    order = [F.col("_ats").asc(), F.col("_side").asc()]
    if right_tiebreak:
        # among right rows at one instant the largest tiebreak carries;
        # asc_nulls_last keeps left rows AFTER the tied right rows
        order = [F.col("_ats").asc(), F.col("_tb").asc_nulls_last(), F.col("_side").asc()]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r.unionByName(l).select(
        F.col(key),
        F.col("_side"),
        *[F.col(f"_l_{c}").alias(f"__keep_{c}") for c in lcols],
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )
    out = carried.where(F.col("_side") == 1).select(
        *[F.col(f"__keep_{c}").alias(c) for c in lcols if c != key],
        F.col(key),
        *[F.col(f"{prefix}{c}") for c in right_cols],
    )
    # restore original left column order
    return out.select(*lcols, *[f"{prefix}{c}" for c in right_cols])


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    how: str = "inner",
) -> DataFrame:
    """Join events to intervals on ``start <= ts < end``. The intervals
    side is broadcast (training-pipeline interval sets are small);
    the event side streams through a broadcast nested-loop join with
    zero shuffle. For two large sides use
    :func:`bucketized_interval_join`."""
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return events.join(F.broadcast(intervals), cond, how)


def bucketized_interval_join(
    events: DataFrame,
    intervals: DataFrame,
    bucket: str = "1 day",
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Scale path for LARGE interval sides: explode each interval into
    the coarse time buckets it overlaps, equi-join events on their
    bucket (a plain shuffled hash join with a sane key), then apply the
    exact range predicate. Shuffle volume is |events| + |intervals x
    avg_buckets_per_interval| instead of a nested loop.

    Both sides floor arithmetically to the SAME bucket width (epoch
    seconds // width), so any bucket granularity is consistent between
    the event side and the interval's exploded sequence — truncating
    one side to calendar days while stepping the other by the bucket
    would silently drop matches for buckets coarser than a day."""
    width_s = _bucket_seconds(bucket)

    def _floor(c):
        return F.timestamp_seconds(
            F.floor(F.unix_timestamp(c) / F.lit(width_s)) * F.lit(width_s)
        )

    ev = events.withColumn("_bkt", _floor(F.col(ts_col)))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                _floor(F.col(start_col)),
                _floor(F.col(end_col)),
                F.expr(f"INTERVAL {width_s} SECONDS"),
            )
        ),
    )
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return ev.join(iv, on="_bkt", how="inner").where(cond).drop("_bkt")


def _bucket_seconds(bucket: str) -> int:
    """Parse '2 days' / '6 hours' / '30 minutes' into whole seconds."""
    units = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}
    parts = bucket.strip().lower().split()
    if len(parts) != 2 or parts[1].rstrip("s") not in units:
        raise ValueError(
            f"bucket must be '<n> <unit>' with unit in {sorted(units)}: {bucket!r}"
        )
    n = int(parts[0])
    if n <= 0:
        raise ValueError(f"bucket width must be positive: {bucket!r}")
    return n * units[parts[1].rstrip("s")]
