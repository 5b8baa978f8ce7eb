"""Multimodal column support: image/audio/video as opaque binary
columns with typed metadata (extension layer, BASELINE.json north
star).

The container has no image/audio codecs, so the *decode kernels* are
stubbed exactly as the task prescribes: either a clearly-marked
NotImplementedError (real codec path) or a deterministic fake
(byte-level features) — while ALL the Spark-side plumbing is real and
tested: the asset schema, Arrow batch shape through ``mapInPandas``,
partition sizing, and metadata pushdown.

Scale design: binary payloads ride in their own column so Parquet
keeps them in separate column chunks — metadata-only queries never
read the bytes (column pruning); decode/feature stages are
``mapInPandas`` so each Arrow batch holds a bounded number of
payloads (maxRecordsPerBatch) instead of whole-row Python pickling.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),  # png/jpeg/wav/mp4/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, src_col: str, media_type: str = "image", fmt: str = "raw"
) -> DataFrame:
    """Build a multimodal table from any column by treating its UTF-8
    bytes as the payload (the deterministic stand-in for real media
    ingestion). Adds ``payload binary`` + ``asset_meta`` struct."""
    payload = F.encode(F.col(src_col), "UTF-8")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.octet_length(F.col(src_col)).cast("long").alias("n_bytes"),
    )
    return df.withColumn("payload", payload).withColumn("asset_meta", meta)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL-CODEC STUB: decoding requires an image library that is not
    in this container. The Spark plumbing (signature, schema, batch
    iteration) is the deliverable; swap `_decode` for PIL/cv2 when
    available."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode requires PIL/cv2 (not installed); "
            "use extract_byte_features for the deterministic fake path"
        )

    schema = T.StructType(df.schema.fields + [T.StructField("pixels", T.BinaryType())])
    return df.mapInPandas(_decode, schema=schema)


def resize_image(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    target_bytes: int = 256,
) -> DataFrame:
    """Deterministic fake 'resize': stride-sample the payload down to
    ``target_bytes`` (the byte-level analogue of nearest-neighbor
    downsampling). The Spark shape is the real one — binary in, binary
    out, Arrow-batched mapInPandas, metadata updated alongside the
    payload; swap the kernel for PIL's ``Image.resize`` when a codec
    is available."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                if payload is None or len(payload) <= target_bytes:
                    out.append(payload)
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                idx = np.linspace(0, len(arr) - 1, target_bytes).astype(np.int64)
                out.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload_resized": out,
                    "n_bytes_resized": [len(p) if p is not None else 0 for p in out],
                }
            )

    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("payload_resized", T.BinaryType()),
            T.StructField("n_bytes_resized", T.LongType()),
        ]
    )
    from ._util import spread

    return spread(df.select(id_col, payload_col)).mapInPandas(_resize, schema=schema)


def extract_byte_features(
    df: DataFrame, id_col: str, payload_col: str = "payload", buckets: int = 16
) -> DataFrame:
    """Deterministic fake 'feature extraction': a normalized byte
    histogram per payload. Exercises the REAL production shape —
    binary column in, fixed-width float vector out, via Arrow-batched
    mapInPandas (bounded memory per batch, linear scale-out)."""

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                if payload is None or len(payload) == 0:
                    feats.append([0.0] * buckets)
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr // (256 // buckets), minlength=buckets)[:buckets]
                feats.append((hist / max(len(arr), 1)).astype(float).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    from ._util import spread

    return spread(df.select(id_col, payload_col)).mapInPandas(_featurize, schema=schema)


def payload_simhash(
    df: DataFrame, id_col: str, payload_col: str = "payload", shingle_bytes: int = 4
) -> DataFrame:
    """(id, simhash bigint) over RAW payload bytes — genuinely
    codec-free near-dup sketching for media columns (no decode stub
    involved): shingle the byte stream into overlapping
    ``shingle_bytes``-grams and sign-of-sums their hashes, exactly
    the text simhash recipe (dedup.simhash_of_hashes) applied to
    bytes. Byte shingling is pure Catalyst: hex() doubles each byte
    into two chars, so byte k-grams are 2k-char substrings of the hex
    string, hashed JVM-side with xxhash64 — only the shared
    vectorized bit-vote kernel is Python (Arrow-batched).

    Re-encoded media won't byte-collide (that needs real decoding —
    see :func:`decode_image`), but exact and near-exact payloads
    (metadata edits, truncated tails, container re-muxes) land within
    a small Hamming distance — the cheap first pass a 100 TB media
    dedup runs before any codec work."""
    from . import dedup

    hx = F.hex(F.col(payload_col))
    width = 2 * shingle_bytes
    shingles = F.expr(
        f"transform(sequence(1, greatest(length({'_hx'}) - {width - 1}, 1), 2), "
        f"i -> substring(_hx, i, {width}))"
    )
    with_hx = df.select(F.col(id_col), hx.alias("_hx"))
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    return dedup.simhash_of_hashes(
        with_hx.select(F.col(id_col), hashes.alias("_h")), id_col, F.col("_h")
    )


def payload_near_duplicates(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    max_hamming: int = 3,
    blocks: int | None = None,
    exact_first: bool = True,
    clone_cap: int = 64,
) -> DataFrame:
    """Near-duplicate payload pairs (id_a, id_b, hamming) by byte
    simhash + the pigeonhole block join shared with the text path
    (dedup.sketch_candidates): any pair within ``max_hamming`` shares
    an exact block, so candidate generation is a bucketed equi-join —
    never all-pairs — and verification is one bit_count(XOR).

    ``exact_first`` (DEFAULT, the clone-group guard SCALING.md's sf1
    probe demanded): byte-identical payloads share every pigeonhole
    block, so a clone group of size g contributes g^2/2 pairs to the
    simhash join — 230 -> 228k pairs at sf1 was this exact blowup.
    The guard groups by an exact 64-bit payload digest FIRST:

    * exact groups of size <= ``clone_cap`` enumerate their full pair
      closure directly (hamming 0 by construction — no simhash work);
    * OVERSIZED groups star-link (min-id representative -> member):
      O(g) pairs whose connected component is provably identical —
      hamming-0 is a transitive equivalence, so the star keeps the
      clone class connected (same argument as minhash ``bucket_cap``;
      simhash's general star-linking unsoundness does NOT apply here
      because exact-digest equality IS transitive);
    * the simhash block join then runs on one REPRESENTATIVE per
      digest, so no clone group is ever re-exploded; cross-group near
      pairs surface between representatives.

    ``exact_first=False`` restores raw enumeration (the full pair set
    per clone group, quadratic in clone-group size — test/oracle
    use)."""
    from . import dedup

    if blocks is None:
        blocks = min(64, max_hamming + 1)
    assert blocks > max_hamming, "pigeonhole needs blocks > max_hamming"
    if not exact_first:
        sk = payload_simhash(df, id_col, payload_col)
        return dedup.sketch_candidates(
            dedup.explode_sketch(sk, id_col, blocks), id_col, max_hamming
        )
    ids = df.select(F.col(id_col), F.xxhash64(F.col(payload_col)).alias("_dg"))
    groups = ids.groupBy("_dg").agg(
        F.count(F.lit(1)).alias("_n"), F.min(id_col).alias("_rep")
    )
    members = ids.join(groups, on="_dg")
    small = members.where((F.col("_n") > 1) & (F.col("_n") <= clone_cap))
    exact_small = (
        small.select("_dg", F.col(id_col).alias("id_a"))
        .join(small.select("_dg", F.col(id_col).alias("id_b")), on="_dg")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    exact_large = members.where(
        (F.col("_n") > clone_cap) & (F.col(id_col) != F.col("_rep"))
    ).select(F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b"))
    exact_pairs = (
        exact_small.unionByName(exact_large)
        .withColumn("hamming", F.lit(0).cast("int"))
    )
    reps = df.join(
        groups.select(F.col("_rep").alias(id_col)), on=id_col, how="left_semi"
    )
    sk = payload_simhash(reps, id_col, payload_col)
    near = dedup.sketch_candidates(
        dedup.explode_sketch(sk, id_col, blocks), id_col, max_hamming
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    return exact_pairs.unionByName(near)


def sample_frames(
    df: DataFrame, id_col: str, payload_col: str = "payload", every_n_bytes: int = 64
) -> DataFrame:
    """Deterministic fake 'frame sampling': slice the payload at fixed
    strides (stand-in for video frame extraction; same explode shape a
    real sampler produces: one row per frame with frame_idx)."""
    n = F.octet_length(F.col(payload_col))
    idxs = F.sequence(F.lit(0), F.greatest((n - 1) / every_n_bytes, F.lit(0)).cast("int"))
    frames = F.transform(
        idxs,
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(F.col(payload_col), (i * every_n_bytes + 1).cast("int"), every_n_bytes).alias(
                "frame_bytes"
            ),
        ),
    )
    return df.select(F.col(id_col), F.explode(frames).alias("f")).select(
        id_col, "f.frame_idx", "f.frame_bytes"
    )
