"""Mergeable log-histogram quantile sketches (the UDDSketch /
DDSketch family; Masson et al., "DDSketch: a fast and fully-mergeable
quantile sketch with relative-error guarantees", VLDB 2019).

The missing member of the rollup state family (count/sum/min/max +
HLL, operators/rollup.py): percentiles cannot be finished per bucket
and re-aggregated (a p95 of p95s is meaningless), but a log-bucketed
histogram of the values IS mergeable — sum the bucket counts — and
answers ANY quantile of ANY bucket range afterwards with a bounded
RELATIVE error: with gamma = (1+alpha)/(1-alpha), a value v maps to
bucket ceil(log_gamma(|v|)) and the bucket midpoint representative
2*gamma^i/(gamma+1) is within alpha*|v| of every value in the bucket.

State representation is EXPLODED rows ``(group..., _qtag, _qidx,
_qcnt)`` rather than one map per group: rows merge with a plain
union + groupBy-sum (map-side combinable, skew-free — a hot group
spreads across its buckets), Parquet stores them columnar, and no
single row grows with the value range. ``_qtag`` = sign(v) splits
negatives / zero / positives so one signed scheme covers the full
real line (negative reps mirror, zero is its own bucket).

Everything is Catalyst expressions — bucketing is a map-only
projection, merging one aggregate, quantile extraction one
cumulative-sum window plus a broadcast join against the (tiny)
requested-quantile list. No UDFs, no driver-side state.

At 100 TB: the sketch of a partition/bucket is at most
``n_groups x O(log_gamma(range))`` rows (~1500 buckets covering
1e-9..1e9 at alpha=0.01) regardless of event count, so sealed
history answers p50/p95/p99 from a scan that never touches raw data.

Beyond the reference (no quantile support at all); extension layer
per SURVEY §2.6.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATE_COLS = ["_qtag", "_qidx", "_qcnt"]


def _gamma(alpha: float) -> float:
    if not (0 < alpha < 1):
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    return (1 + alpha) / (1 - alpha)


def bucket_exprs(value_col: str, alpha: float):
    """(tag, idx) bucket key for one value: tag = sign, idx =
    ceil(log_gamma(|v|)) (0 for v = 0). Pure Catalyst."""
    g = _gamma(alpha)
    v = F.col(value_col).cast("double")
    tag = F.signum(v).cast("int").alias("_qtag")
    idx = (
        F.when(v == 0, F.lit(0))
        .otherwise(F.ceil(F.log(F.abs(v)) / math.log(g)))
        .cast("int")
        .alias("_qidx")
    )
    return tag, idx


def rep_expr(alpha: float):
    """Representative value of a (_qtag, _qidx) bucket: the midpoint
    2*gamma^idx/(gamma+1), signed by tag (0 for the zero bucket).
    Guarantees |rep - v| <= alpha*|v| for every v in the bucket."""
    g = _gamma(alpha)
    mid = F.pow(F.lit(g), F.col("_qidx")) * (2.0 / (g + 1.0))
    return (F.col("_qtag").cast("double") * mid).alias("_qrep")


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    alpha: float = 0.01,
) -> DataFrame:
    """Build the sketch: one map-side-combinable aggregate producing
    histogram rows (group..., _qtag, _qidx, _qcnt). NULL values are
    excluded (SQL aggregate semantics)."""
    tag, idx = bucket_exprs(value_col, alpha)
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, tag, idx)
        .agg(F.count(F.lit(1)).alias("_qcnt"))
    )


def merge_quantile_sketches(
    sketches: list[DataFrame], group_cols: list[str]
) -> DataFrame:
    """Merge sketches losslessly: union + sum per bucket. The merged
    sketch is identical to sketching the concatenated inputs, so
    partial sketches (per file, per day, per micro-batch) compose."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "_qtag", "_qidx").agg(
        F.sum("_qcnt").alias("_qcnt")
    )


def sketch_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    qs: list[float],
    alpha: float = 0.01,
) -> DataFrame:
    """Extract discrete quantiles per group: for each q, the
    representative of the bucket holding the rank = max(1,
    ceil(q*N))-th smallest value — within alpha relative error of
    that order statistic. One cumulative window over the (tiny,
    ~log-range-sized) per-group histogram + a broadcast join against
    the requested q list. Output: (group..., q, quantile_est)."""
    for q in qs:
        if not (0 <= q <= 1):
            raise ValueError(f"quantile must be in [0,1], got {q}")
    spark = sketch.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_qrep")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    hist = (
        sketch.withColumn("_qrep", rep_expr(alpha))
        .withColumn("_cum", F.sum("_qcnt").over(w_cum))
        .withColumn("_total", F.sum("_qcnt").over(w_all))
    )
    rank = F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("_total")))
    return (
        hist.join(F.broadcast(qdf))
        .where((F.col("_cum") >= rank) & (F.col("_cum") - F.col("_qcnt") < rank))
        .select(*group_cols, "q", F.col("_qrep").alias("quantile_est"))
    )
