"""Count-min sketch + exact heavy hitters (Cormode & Muthukrishnan
2005) — the frequency analogue of operators/bloom.py's membership
pruning, and like it an extension beyond the reference (which has no
sketch surface, SURVEY §2.6).

The 100 TB problem: "which tokens appear >= T times corpus-wide"
naively shuffles EVERY token occurrence into a groupBy. The sketch
route: build a (depth x width) count matrix in one distributed pass
(per-partition numpy ``np.add.at`` inside ``mapInPandas``, driver
SUMS one matrix per partition — memory bounded by partitions x
sketch size, never by token count), broadcast it, and prune the token
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

from ._util import spread

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
) -> CountMinSketch:
    """One distributed pass over every OCCURRENCE of ``col`` (counts,
    not set semantics — duplicates are the point)."""
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

    out = np.zeros((depth, width), dtype=np.int64)
    for row in pos.mapInPandas(_part, "counts binary").collect():
        out += np.frombuffer(row["counts"], dtype=np.int64).reshape(depth, width)
    return CountMinSketch(out, width, depth)


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
