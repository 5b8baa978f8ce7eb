"""Count-min sketch + exact heavy hitters (Cormode & Muthukrishnan
2005) — the frequency analogue of operators/bloom.py's membership
pruning, and like it an extension beyond the reference (which has no
sketch surface, SURVEY §2.6).

The 100 TB problem: "which tokens appear >= T times corpus-wide"
naively shuffles EVERY token occurrence into a groupBy. The sketch
route: build a (depth x width) count matrix in one distributed pass
(per-partition numpy ``np.add.at`` inside ``mapInPandas``; partials
tree-fold executor-side into a bounded group count before the driver
SUM, so driver memory is ``fold_groups`` x sketch size — independent
of token count and split count), broadcast it, and prune the token
stream MAP-SIDE to rows whose CMS estimate reaches the threshold.
CMS only ever OVER-estimates, so the surviving rows are a guaranteed
superset of the true heavy hitters; the exact groupBy then runs over
~heavy-hitter traffic only and drops the false positives. Exact
answer, shuffle cut to the skew.

Hash positions are computed JVM-side (``pmod(xxhash64(i, v), w)``,
pure Catalyst) so build and probe agree by construction; the probe
UDF is two vectorized numpy indexings per Arrow batch. Sketches are
mergeable (elementwise +) and persistable, like BloomFilter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._util import spread, tree_fold_partials

DEFAULT_WIDTH = 1 << 16
DEFAULT_DEPTH = 4


def cms_positions(col: Column, width: int, depth: int) -> Column:
    """array<long> of the d bucket positions of a value — pure
    Catalyst (one xxhash64 per row of the sketch)."""
    return F.array(
        *[F.pmod(F.xxhash64(F.lit(i), col), F.lit(width)) for i in range(depth)]
    )


class CountMinSketch:
    """depth x width int64 count matrix + parameters."""

    def __init__(self, counts: np.ndarray, width: int, depth: int):
        assert counts.shape == (depth, width)
        self.counts = counts
        self.width = width
        self.depth = depth

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        """Elementwise sum — CMS is a linear sketch, so per-shard /
        per-day sketches combine losslessly (same reason the rollup
        HLL states do)."""
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("sketch parameters differ; cannot merge")
        return CountMinSketch(self.counts + other.counts, self.width, self.depth)

    def save(self, path: str) -> None:
        import json as _json
        import os as _os

        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            header = _json.dumps({"width": self.width, "depth": self.depth}).encode()
            f.write(len(header).to_bytes(4, "big") + header)
            f.write(self.counts.astype("<i8").tobytes())
        _os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "CountMinSketch":
        import json as _json

        with open(path, "rb") as f:
            hlen = int.from_bytes(f.read(4), "big")
            meta = _json.loads(f.read(hlen).decode())
            counts = np.frombuffer(f.read(), dtype="<i8").reshape(
                meta["depth"], meta["width"]
            )
        return cls(counts.copy(), meta["width"], meta["depth"])


def build_cms(
    df: DataFrame,
    col: str | Column,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    fold_groups: int = 16,
) -> CountMinSketch:
    """One distributed pass over every OCCURRENCE of ``col`` (counts,
    not set semantics — duplicates are the point). Partials tree-fold
    executor-side into at most ``fold_groups`` rows before the driver
    SUM (``_util.tree_fold_partials``) — CMS is linear, so the grouped
    elementwise sums compose losslessly. ``driver_fold_rows`` on the
    returned sketch records the driver's actual intake."""
    c = F.col(col) if isinstance(col, str) else col
    pos = spread(df).select(cms_positions(c, width, depth).alias("pos"))

    def _part(batches):
        arr = np.zeros((depth, width), dtype=np.int64)
        rows = np.arange(depth)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.vstack(pdf["pos"].to_numpy()).astype(np.int64)  # (n, depth)
            np.add.at(arr, (rows[None, :], m), 1)
        yield pd.DataFrame({"counts": [arr.tobytes()]})

    def _sum(acc, b):
        a = np.frombuffer(b, dtype=np.int64)
        return a.copy() if acc is None else acc + a

    blobs = tree_fold_partials(
        pos.mapInPandas(_part, "counts binary"), "counts", _sum, groups=fold_groups
    )
    out = np.zeros((depth, width), dtype=np.int64)
    for b in blobs:
        out += np.frombuffer(b, dtype=np.int64).reshape(depth, width)
    sk = CountMinSketch(out, width, depth)
    sk.driver_fold_rows = len(blobs)
    return sk


def cms_estimate(df: DataFrame, col: str | Column, sk: CountMinSketch) -> Column:
    """Upper-bound frequency estimate column (min over the d rows) —
    the matrix ships once per executor; each Arrow batch is two numpy
    indexings."""
    c = F.col(col) if isinstance(col, str) else col
    b = df.sparkSession.sparkContext.broadcast(sk.counts.tobytes())
    depth, width = sk.depth, sk.width

    @F.pandas_udf("long")
    def _est(pos: pd.Series) -> pd.Series:
        arr = np.frombuffer(b.value, dtype=np.int64).reshape(depth, width)
        if not len(pos):
            return pd.Series([], dtype="int64")
        m = np.vstack(pos.to_numpy()).astype(np.int64)  # (n, depth)
        return pd.Series(arr[np.arange(depth)[None, :], m].min(axis=1))

    return _est(cms_positions(c, sk.width, sk.depth))


def kmv_sketches(
    df: DataFrame,
    group_col: str,
    value_col: str | Column,
    k: int = 256,
    prune_safety: int = 16,
) -> DataFrame:
    """Per-group KMV (bottom-k / k-minimum-values) sketch: the ``k``
    smallest DISTINCT ``xxhash64(value)`` per group (Bar-Yossef et al.
    2002; Beyer et al. SIGMOD'07 for the multi-set estimators). The
    set-theoretic sketch HLL cannot be: because it keeps actual hash
    values, two groups' sketches support INTERSECTION estimates
    (cross-source overlap, contamination rates) — union-only HLL
    (operators/rollup.py) cannot answer those without the exact
    distinct join this sketch exists to avoid.

    100 TB shape — the naive build ("sort each group's distinct
    hashes, take k") shuffles every distinct value. Instead:

    1. one pass estimates each group's distinct count
       (``approx_count_distinct``, partial-aggregated map-side);
    2. the k smallest of n uniform 64-bit hashes all fall below
       ``min + 2^64 * k/n`` with overwhelming probability, so a
       MAP-SIDE filter at ``k * prune_safety / n`` of the hash range
       drops ~all rows before the shuffle (expected survivors
       ~k*safety per group, P[true kth value pruned] < e^{-k(s-1)^2/2s}
       by Chernoff — ~1e-26 at k=256, s=16);
    3. the exact bottom-k runs on survivors only:
       ``slice(array_sort(collect_set), 1, k)`` over a bounded set.

    A per-group guard re-runs UNPRUNED any group whose survivor count
    came in under ``min(k, distinct)`` (possible only if the cardinality
    estimate was grossly high), so the result is always the TRUE bottom-k.

    Returns (group_col, sketch array<long> ascending, n_distinct_est
    double) where n_distinct_est is the KMV estimator
    ``(k-1) / F(kth)`` (exact size when the group has < k distinct
    values), with F the unsigned fraction of the hash range."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    hashed = df.select(F.col(group_col), F.xxhash64(c).alias("_h"))

    # Stage 1: per-group cardinality estimate -> per-group threshold.
    est = hashed.groupBy(group_col).agg(
        F.approx_count_distinct("_h", rsd=0.05).alias("_nd")
    )
    # Signed threshold: -2^63 + 2^64 * min(1, k*safety/nd). Computed in
    # float (2^64 loses 11 bits of precision) — irrelevant: the margin
    # is a factor of `prune_safety`, not ulps. When nd <= k*safety the
    # min() clamps to the top of the range (the long cast saturates at
    # Long.MaxValue — verified under ANSI mode) AND the filter below
    # independently passes such groups whole, so the clamp is belt-
    # and-suspenders, never load-bearing.
    thr = (
        F.lit(-(2.0**63))
        + F.lit(2.0**64)
        * F.least(F.lit(1.0), F.lit(float(k * prune_safety)) / F.col("_nd"))
    ).cast("long")
    est = est.select(group_col, thr.alias("_thr"), "_nd")

    pruned = hashed.join(F.broadcast(est), on=group_col).where(
        (F.col("_h") <= F.col("_thr")) | (F.col("_nd") <= k * prune_safety)
    )
    sk = pruned.groupBy(group_col).agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("sketch"),
        F.count_distinct("_h").alias("_nsurv"),
    )
    # Guard: a group is complete iff it yielded k survivors or was
    # passed through whole (nd small / threshold spanning the range).
    short = (
        sk.where(F.col("_nsurv") < k)
        .join(F.broadcast(est), on=group_col)
        .where(F.col("_nd") > k * prune_safety)
        .select(group_col)
    )
    redo = (
        hashed.join(F.broadcast(short), on=group_col)
        .groupBy(group_col)
        .agg(F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("sketch"))
    )
    done = sk.join(F.broadcast(short), on=group_col, how="left_anti").select(
        group_col, "sketch"
    )
    out = done.unionByName(redo)
    # KMV estimator: full sketch -> (k-1)/F(kth); short sketch -> exact.
    kth_u = (F.element_at("sketch", k).cast("double") + F.lit(2.0**63)) / F.lit(
        2.0**64
    )
    return out.select(
        F.col(group_col),
        F.col("sketch"),
        F.when(F.size("sketch") < k, F.size("sketch").cast("double"))
        .otherwise(F.lit(float(k - 1)) / kth_u)
        .alias("n_distinct_est"),
    )


def kmv_overlap_pairs(sketches: DataFrame, group_col: str, k: int) -> DataFrame:
    """Pairwise set-overlap estimates from per-group KMV sketches
    (Beyer et al.: the k smallest of the UNION of two bottom-k
    sketches is the union's bottom-k; the fraction of those present
    in both sketches is an unbiased Jaccard estimate).

    Input is the (tiny) sketch frame — one row per group — so the
    pair join is a broadcast self-join over n_groups^2 rows with all
    set arithmetic in Catalyst array functions; nothing here ever
    touches the base data again. Returns
    (group_a, group_b, jaccard_est, inter_est) with group_a < group_b;
    inter_est = jaccard_est * (union KMV estimate)."""
    a = sketches.select(
        F.col(group_col).alias("group_a"),
        F.col("sketch").alias("_ska"),
        F.col("n_distinct_est").alias("_na"),
    )
    b = sketches.select(
        F.col(group_col).alias("group_b"),
        F.col("sketch").alias("_skb"),
        F.col("n_distinct_est").alias("_nb"),
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    merged = F.slice(F.array_sort(F.array_union("_ska", "_skb")), 1, k)
    both = F.size(
        F.filter(
            merged,
            lambda h: F.array_contains(F.col("_ska"), h)
            & F.array_contains(F.col("_skb"), h),
        )
    )
    m = F.size(merged)
    kth_u = (F.element_at(merged, m).cast("double") + F.lit(2.0**63)) / F.lit(2.0**64)
    union_est = F.when(m < k, m.cast("double")).otherwise(
        (m.cast("double") - 1) / kth_u
    )
    j = both.cast("double") / m.cast("double")
    return pairs.select(
        "group_a",
        "group_b",
        j.alias("jaccard_est"),
        (j * union_est).alias("inter_est"),
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold: int,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """EXACT (value, n_occurrences) for every value appearing at least
    ``threshold`` times — sketch-pruned: the CMS filter runs map-side
    BEFORE the shuffle, the exact count confirms (dropping CMS
    collisions). Returns columns (``col``, n_occurrences)."""
    pruned = spread(df).select(F.col(col)).where(
        cms_estimate(df, col, build_cms(df, col, width, depth)) >= threshold
    )
    return (
        pruned.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") >= threshold)
    )
