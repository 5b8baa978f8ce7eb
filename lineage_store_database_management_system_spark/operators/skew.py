"""Skew-mitigation helpers for hot-key aggregations and joins.

AQE's skew-join handling (enabled in ``session.get_spark``) splits
oversized SHUFFLE partitions at runtime, but it cannot help when a
single KEY is hot inside an aggregation, or when the skewed side of a
join must co-locate with a small dimension. These helpers implement
the classic salting patterns as plain DataFrame ops:

- **salted_aggregate**: two-phase agg — salt the key with ``n_salts``
  random-ish buckets (deterministic: hash of a row id), partial-agg on
  (key, salt), then final-agg on key. The hot key's rows spread over
  ``n_salts`` reducers; the second shuffle moves only ``n_salts`` rows
  per key. Works for any algebraic aggregate (sum/count/min/max and
  avg via sum+count).
- **salted_broadcast_left_join**: replicate the (small) right side
  ``n_salts`` times, salt the left side — a hot left key fans across
  executors while the join stays broadcast (no shuffle of the big
  side at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, n_salts: int, cols: list[str]) -> Column:
    """Deterministic per-row salt in [0, n_salts): hash of the full
    row's non-key content — uniform without RNG (repeatable plans,
    no ``rand()`` non-determinism under task retries, which matters
    for exactly-once at scale)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Example::

        salted_aggregate(ev, ["user_id"],
                         {"n": ("*", "count"), "total": ("value", "sum")})
    """
    other = [c for c in df.columns if c not in key_cols]
    salted = df.withColumn("_salt", _salt(df, n_salts, other or key_cols))
    partial_exprs, final_exprs = [], []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{out}"))
            final_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{out}"))
            final_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported agg fn {fn!r} (use sum/count/min/max)")
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)


def salted_broadcast_left_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big ``left`` to a small ``right`` without
    shuffling the left side: replicate right ``n_salts``x with an
    explicit salt column, salt left deterministically, broadcast-join
    on (key, salt). Output columns = left ∪ right (minus the dup key).
    """
    other = [c for c in left.columns if c != on]
    l = left.withColumn("_salt", _salt(left, n_salts, other or [on]))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l.join(F.broadcast(r), on=[on, "_salt"], how=how)
    return out.drop("_salt")
