"""Event-time window operators over event streams (extension layer —
the reference has no windows or streaming at all, SURVEY §2.6).

Batch implementations here share semantics with the Structured
Streaming versions in ``streaming/``: tumbling and session windows
give identical answers run over a static table or a stream (Spark's
unified model), which is how the batch DuckDB oracle can gate the
streaming operators' logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Fixed tumbling windows: count + sum per (window_start, keys).
    One hash aggregate; window assignment is a pure projection."""
    keys = keys or []
    return (
        df.groupBy(F.window(F.col(ts_col), width).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "sum_value")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    keys = keys or []
    return (
        df.groupBy(F.window(F.col(ts_col), width, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum(value_col), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``. Classic
    lag + cumulative-sum formulation — one shuffle on user_id; both
    window functions reuse the same partitioning, so Catalyst plans a
    single exchange. Returns one row per session with bounds and
    aggregates. (Semantically identical to F.session_window /
    streaming sessionization; SQL-replicable for the oracle.)

    ``tiebreak_col`` makes the window ordering total when timestamps
    tie, so results are engine- and partitioning-stable."""
    order_cols = [ts_col] if tiebreak_col is None else [ts_col, tiebreak_col]
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    gap = F.lit(gap_minutes * 60)
    prev_ts = F.lag(ts_col).over(w)
    new_sess = (
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap)
    ).cast("int")
    with_sess = df.withColumn("_new", new_sess).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sess.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def session_stats(df: DataFrame, user_col: str = "user_id", ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Per-user session rollup (n_sessions, total events) — the
    compact, oracle-friendly shape."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )
