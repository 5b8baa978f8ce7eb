"""Distributed Bloom filters for map-side membership pruning.

The decontamination workhorse at corpus scale (the shape used to
scrub eval benchmarks out of pretraining data): the *small* side's
membership set (test-set n-grams) compresses into a packed bitset of
``num_bits/8`` bytes; probing is then a broadcast + O(1) per-element
check executed MAP-SIDE on the huge side — clean shingles are
rejected before any shuffle, and only Bloom candidates (guaranteed
superset: no false negatives) reach the exact verification join.

Build is distributed: each input partition folds its elements' bit
positions into a local numpy bitset inside one ``mapInPandas`` pass
(Arrow-batched, ``np.bitwise_or.at`` — no per-row Python); the
partials then tree-fold executor-side into a bounded group count
before the driver's final OR, so driver memory is bounded by
``fold_groups`` x filter size — independent of both element count
and input split count.

Probing stays deterministic and engine-checkable because the k bit
positions are computed JVM-side (``xxhash64(i, value) mod num_bits``,
a Catalyst expression); the Pandas UDF only indexes the broadcast
bitset — vectorized numpy over the whole Arrow batch.

False-positive rate: standard (1 - e^{-kn/m})^k; with the default
m = 2^23 bits, k = 5, a 100k-element set sits at ~1e-5. False
negatives are impossible, which is what makes the two-phase
decontaminate EXACT (the verify join removes false positives).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles
from ._util import spread, tree_fold_partials

DEFAULT_BITS = 1 << 23
DEFAULT_HASHES = 5


def bit_positions(col: Column, num_bits: int, num_hashes: int) -> Column:
    """array<long> of the k Bloom positions of a value — pure
    Catalyst, so build and probe are bit-identical by construction."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), col), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


class BloomFilter:
    """Packed bitset + parameters. ``bits`` is ``num_bits/8`` bytes."""

    def __init__(self, bits: bytes, num_bits: int, num_hashes: int):
        assert len(bits) == num_bits // 8
        self.bits = bits
        self.num_bits = num_bits
        self.num_hashes = num_hashes

    def fill_ratio(self) -> float:
        arr = np.frombuffer(self.bits, dtype=np.uint8)
        return float(np.unpackbits(arr).mean())

    def save(self, path: str) -> None:
        """Persist for cross-run reuse (the decontamination filter of
        a frozen eval set is built once, probed by every ingest).
        Atomic: temp file + rename."""
        import json as _json
        import os as _os

        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            header = _json.dumps(
                {"num_bits": self.num_bits, "num_hashes": self.num_hashes}
            ).encode()
            f.write(len(header).to_bytes(4, "big") + header + self.bits)
        _os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "BloomFilter":
        import json as _json

        with open(path, "rb") as f:
            hlen = int.from_bytes(f.read(4), "big")
            meta = _json.loads(f.read(hlen).decode())
            bits = f.read()
        return cls(bits, meta["num_bits"], meta["num_hashes"])

    def union(self, other: "BloomFilter") -> "BloomFilter":
        """OR-merge two filters built with identical parameters —
        incremental growth of the member set (e.g. a new eval-set
        release) without rebuilding from scratch."""
        if (self.num_bits, self.num_hashes) != (other.num_bits, other.num_hashes):
            raise ValueError("bloom parameters differ; filters cannot merge")
        a = np.frombuffer(self.bits, dtype=np.uint8)
        b = np.frombuffer(other.bits, dtype=np.uint8)
        return BloomFilter((a | b).tobytes(), self.num_bits, self.num_hashes)


def build_bloom(
    df: DataFrame,
    col: str | Column,
    num_bits: int = DEFAULT_BITS,
    num_hashes: int = DEFAULT_HASHES,
    fold_groups: int = 16,
) -> BloomFilter:
    """Build the filter over every value of ``col`` (one distributed
    pass; duplicates are harmless — set semantics are free). Partials
    tree-fold executor-side into at most ``fold_groups`` rows before
    the driver OR (``_util.tree_fold_partials``), so driver intake is
    bounded by ``fold_groups`` x filter bytes regardless of input
    split count — at 100 TB (~1e5 splits) a flat collect would push
    ~100 GiB of partials through the driver. The returned filter's
    ``driver_fold_rows`` records how many rows the driver actually
    merged (unit-tested <= ``fold_groups``)."""
    if num_bits % 8:
        raise ValueError("num_bits must be a multiple of 8")
    c = F.col(col) if isinstance(col, str) else col
    pos = df.select(bit_positions(c, num_bits, num_hashes).alias("pos"))
    nbytes = num_bits // 8

    def _part(batches):
        arr = np.zeros(nbytes, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            ps = np.concatenate(pdf["pos"].to_numpy()).astype(np.int64)
            np.bitwise_or.at(arr, ps >> 3, (1 << (ps & 7)).astype(np.uint8))
        yield pd.DataFrame({"bits": [arr.tobytes()]})

    def _or(acc, b):
        a = np.frombuffer(b, dtype=np.uint8)
        return a.copy() if acc is None else acc | a

    blobs = tree_fold_partials(
        pos.mapInPandas(_part, "bits binary"), "bits", _or, groups=fold_groups
    )
    out = np.zeros(nbytes, dtype=np.uint8)
    for b in blobs:
        out |= np.frombuffer(b, dtype=np.uint8)
    bf = BloomFilter(out.tobytes(), num_bits, num_hashes)
    bf.driver_fold_rows = len(blobs)
    return bf


def might_contain(df: DataFrame, col: str | Column, bf: BloomFilter) -> Column:
    """Boolean probe column for ``df`` rows against a built filter.
    The bitset ships once per executor (Spark broadcast); each Arrow
    batch is checked with two vectorized numpy indexings."""
    c = F.col(col) if isinstance(col, str) else col
    b = df.sparkSession.sparkContext.broadcast(bf.bits)

    @F.pandas_udf("boolean")
    def _probe(pos: pd.Series) -> pd.Series:
        arr = np.frombuffer(b.value, dtype=np.uint8)
        if not len(pos):
            return pd.Series([], dtype=bool)
        m = np.vstack(pos.to_numpy()).astype(np.int64)  # (rows, k)
        hit = (arr[m >> 3] & (1 << (m & 7)).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    return _probe(bit_positions(c, bf.num_bits, bf.num_hashes))


def bloom_decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    num_bits: int = DEFAULT_BITS,
    num_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """EXACT leak report — (train id, n_leaked distinct test n-grams)
    for every train document sharing at least one word n-gram with
    the test corpus — computed the 100 TB way: the test side builds a
    Bloom filter (it is the small side by definition), the train
    shingle stream is pruned MAP-SIDE against it before any shuffle,
    and only candidates reach the exact hash join. No false negatives
    (Bloom) + exact verify of candidates = the same answer as a full
    ngram join, with the train-side shuffle cut to ~the leak rate.

    Compare operators/contamination.ngram_contamination: that scores
    the TEST side per doc; this prunes the TRAIN side, which is the
    direction you delete from."""
    sh = word_shingles(F.col(text_col), n).alias("_sh")
    test_grams = (
        spread(test).select(sh).select(F.explode("_sh").alias("_g")).distinct()
    )
    bf = build_bloom(test_grams, "_g", num_bits, num_hashes)

    train_grams = (
        spread(train)
        .select(F.col(id_col), sh)
        .select(F.col(id_col), F.explode("_sh").alias("_g"))
    )
    candidates = train_grams.where(might_contain(train_grams, "_g", bf))
    exact = candidates.join(
        test_grams.select(F.xxhash64("_g").alias("_h")).distinct(),
        F.xxhash64(candidates["_g"]) == F.col("_h"),
    )
    return exact.groupBy(id_col).agg(
        F.count_distinct("_h").alias("n_leaked")
    )
