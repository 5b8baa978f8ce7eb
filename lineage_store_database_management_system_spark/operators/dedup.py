"""Deduplication operators for large-scale document corpora.

Five strategies, each designed for the 100 TB shape of the problem
(the reference has no dedup at all — this is the extension layer,
SURVEY §2.6 / BASELINE.json north star):

- exact        : hash-groupBy. One shuffle on a 64-bit digest, never
                 on the raw text.
- minhash_lsh  : shingle -> k minhashes -> band -> bucket join. The
                 classic near-dup pipeline (Broder '97); candidate
                 generation touches each doc once, the only join is on
                 (band, band_hash) buckets.
- simhash      : 64-bit sign-of-weighted-sum sketch (Charikar '02);
                 near-dups = small Hamming distance, found by joining
                 on rotated prefix blocks.
- ngram_jaccard: EXACT n-gram Jaccard via an inverted-index join —
                 explode shingles, self-join postings, count
                 intersections. No driver-side pairwise loop; the
                 shuffle key is the shingle, so common-shingle skew is
                 the thing to watch (cap posting lists via a frequency
                 filter).
- embedding    : cosine near-dup over an embedding column, delegated
                 to operators.similarity.

All candidate generation is Catalyst expressions (xxhash64 / arrays);
no Python UDFs in any hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text, unicode_normalized_text, word_shingles
from ._util import plan_scoped_persist, spread


def _materialize(
    df: DataFrame, sketch_dir: str | None = None, slot: str = "dedup.sketch"
) -> DataFrame:
    """Make a frame that feeds BOTH sides of a self-join cheap to read
    twice. Spark does not share common subexpressions across join
    branches — without this, the (expensive) sketch computation runs
    twice.

    With ``sketch_dir`` the sketch becomes a PERSISTED TABLE: written
    once as Parquet, reused by every later query that passes the same
    dir (the 100 TB shape — sketches outlive one query and warrant a
    real table; recompute by deleting the dir). Without it, a BOUNDED
    plan-scoped persist (one cached frame per operator slot, previous
    invocation evicted — see _util.plan_scoped_persist), materialized
    EAGERLY: the sketch feeds both sides of a self-join, and the
    planner sizes the join strategy from the materialized cache — a
    lazy persist left the InMemoryRelation with its child's (explode-
    inflated) estimate and flipped the broadcast self-join to a
    sort-merge join (measured: 4x task CPU, 200x shuffle bytes)."""
    if sketch_dir is not None:
        import os

        spark = df.sparkSession
        done = os.path.join(sketch_dir, "_SUCCESS")
        if not os.path.exists(done):
            df.write.mode("overwrite").parquet(sketch_dir)
        return spark.read.parquet(sketch_dir)
    return plan_scoped_persist(df, slot, eager=True)


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical (after whitespace/case normalization)
    documents: one row per group with the keeper (min id) and members.
    Shuffles 64-bit digests + ids only."""
    h = F.xxhash64(normalized_text(F.col(text_col))).alias("_h")
    return (
        df.select(F.col(id_col), h)
        .groupBy("_h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
        .drop("_h")
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The deduplicated corpus: keep the min-id document of each exact
    group. Equivalent SQL: GROUP BY normalized text -> min(id)."""
    w_key = F.xxhash64(normalized_text(F.col(text_col)))
    keep = (
        df.select(F.col(id_col).alias("_id"), w_key.alias("_h"))
        .groupBy("_h")
        .agg(F.min("_id").alias(id_col))
        .drop("_h")
    )
    # broadcast-friendly semi join back to the full rows
    return df.join(keep, on=id_col, how="left_semi")


def dedup_keep_best(
    df: DataFrame,
    id_col: str,
    text_col: str,
    score: Column,
) -> DataFrame:
    """Quality-aware exact dedup: within each group of byte-identical
    (normalized) documents keep the row MAXIMIZING ``score`` (id
    ascending as the tiebreak) — the production selection rule when
    duplicates differ in their metadata (source reliability, recency,
    quality gates): "keep A copy, not THE FIRST copy".
    :func:`dedup_exact` is the min-id special case.

    One shuffle on the 64-bit content digest carrying only
    (digest, score, id); the winner is a single struct-ordered
    aggregate — never a row_number window over the corpus.
    Struct-ordered max/min has no mutable-buffer hash implementation,
    so this compiles to a SortAggregate: still PARTIAL map-side (the
    shuffle carries one candidate per digest per partition, same
    reduction as a hash agg), with a per-partition sort on the digest
    key instead of a hash table — strictly cheaper than the window
    formulation, which shuffles every row and sorts whole groups. The
    join back to full rows broadcasts the winner set when the
    optimizer sizes it so.

    Ids of any orderable type (string/UUID/numeric) are supported:
    numeric ids take an exact max-over-(score, -id) path; other id
    types take a min-over-(-score, id) path that negates the SCORE
    instead (cast to double — exact for integer scores up to 2^53 and
    all float scores; the id is carried untouched).

    Returns the deduplicated corpus with an ``n_copies`` column
    (group size) attached to each keeper."""
    from pyspark.sql.types import NumericType

    h = F.xxhash64(normalized_text(F.col(text_col)))
    ranked = df.select(
        F.col(id_col).alias("_id"), h.alias("_h"), score.alias("_score")
    )
    if isinstance(ranked.schema["_id"].dataType, NumericType):
        # exact path: max over (score asc, id desc) picks the highest
        # score, lowest id on ties — no casts anywhere.
        winners = (
            ranked.groupBy("_h")
            .agg(
                F.max(
                    F.struct(F.col("_score"), (-F.col("_id")).alias("_negid"))
                ).alias("_w"),
                F.count(F.lit(1)).alias("n_copies"),
            )
            .select((-F.col("_w._negid")).alias(id_col), "n_copies")
        )
    else:
        # orderable-but-not-negatable ids (string, UUID, date): flip
        # the SCORE instead — min over (-score, id) is (score desc,
        # id asc) with the id compared natively.
        winners = (
            ranked.groupBy("_h")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("_score").cast("double")).alias("_ns"),
                        F.col("_id"),
                    )
                ).alias("_w"),
                F.count(F.lit(1)).alias("n_copies"),
            )
            .select(F.col("_w._id").alias(id_col), "n_copies")
        )
    return df.join(winners, on=id_col, how="inner")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_words: int = 3,
) -> DataFrame:
    """(id, signature array<long>) — the shingle set is hashed to
    64-bit ints ONCE (xxhash64 over the string), then each of the
    ``num_hashes`` minhash functions is a cheap re-hash of that long
    (xxhash64(i, h)) + min. Hashing strings once instead of
    ``num_hashes`` times is the difference between O(bytes x k) and
    O(bytes + k) per document — at 100 TB the text bytes dominate.

    Physical shape: shingles EXPLODE to (id, hash) rows and the k
    min-hashes are one hash aggregate with k codegen'd ``min`` columns
    (map-side partial aggregation shuffles at most num_docs x k longs).
    This deliberately avoids k array-traversal lambdas over a shingle
    array column: higher-order-function lambdas are interpreted per
    element, and Catalyst's projection collapsing can inline the
    (expensive) shingle expression into every one of the k transforms.
    Deterministic across runs/partitions; entirely JVM-side."""
    sh = word_shingles(F.col(text_col), shingle_words).alias("_sh")
    # No size()>0 filter: explode() already drops empty/null arrays, so
    # the filter was redundant — and Catalyst pushed it below spread's
    # exchange, inlining the whole shingle expression into a Filter
    # that ran BEFORE the projection recomputed it (plan showed the
    # shingle transform twice per row; removing the filter halves the
    # shingling CPU of the scan stage).
    # spread BY the id: the min-hash aggregate below groups on the id,
    # so a hash exchange on it satisfies the aggregate's required
    # distribution and Catalyst elides the aggregate's own exchange —
    # one shuffle for spread+aggregate instead of two (r15; plan diff
    # in plans/r15/ds_minhash_lsh_candidates_{before,after}.txt).
    base = spread(df, by=id_col).select(F.col(id_col), sh)
    hashed = base.select(F.col(id_col), F.explode("_sh").alias("_s")).select(
        F.col(id_col), F.xxhash64("_s").alias("_h")
    )
    mins = hashed.groupBy(id_col).agg(
        *[F.min(F.xxhash64(F.lit(i), F.col("_h"))).alias(f"_m{i}") for i in range(num_hashes)]
    )
    sig = F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("signature")
    return mins.select(F.col(id_col), sig)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    sketch_dir: str | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b, n_shared_bands).
    Pipeline: signatures -> split into ``bands`` bands of r rows ->
    hash each band -> explode -> self-join on (band, hash).

    Scale: the exploded frame is num_docs x bands rows of (int, long,
    id); the join key is the band bucket, so work is proportional to
    actual collisions, not n^2. Giant buckets (degenerate text) are
    capped upstream by the shingle filter. ``sketch_dir`` persists the
    banded sketch as a Parquet table reused across queries (see
    :func:`_materialize`).

    ``bucket_cap``: the sf10 probe showed candidate ENUMERATION going
    quadratic on data with 100-way clone groups (s docs in one bucket
    emit s(s-1)/2 pairs). With a cap, buckets larger than it switch to
    STAR linking — every member pairs only with the bucket's minimum
    id — emitting s-1 pairs instead. Connected components over the
    pair graph (graph.duplicate_clusters) are unchanged (a bucket
    stays one component through its hub); only the explicit pair list
    thins, so downstream "drop everything joined to a smaller id"
    dedup keeps the identical survivor set. This is how production
    MinHash pipelines (e.g. BigCode's) keep clone-heavy corpora
    linear. Default None preserves exhaustive pairs."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_words)
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("signature")[b * r + j] for j in range(r)]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")
    banded = _materialize(banded, sketch_dir, slot="dedup.minhash.banded")
    if bucket_cap is not None:
        # Annotate each sketch row with its bucket's size and hub
        # (minimum id). One extra aggregate + join, both keyed on the
        # SAME (band, bh) the pair join uses — co-partitioned.
        stats = banded.groupBy("band", "bh").agg(
            F.count(F.lit(1)).alias("_sz"), F.min(id_col).alias("_hub")
        )
        ann = banded.join(stats, on=["band", "bh"])
        small = ann.where(F.col("_sz") <= bucket_cap).drop("_sz", "_hub")
        a = small.alias("a")
        b = small.alias("b")
        exhaustive = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        # Oversized buckets: hub -> member star, no join at all (the
        # hub rides on every row), s-1 pairs per bucket.
        star = (
            ann.where(F.col("_sz") > bucket_cap)
            .where(F.col(id_col) != F.col("_hub"))
            .select(F.col("_hub").alias("id_a"), F.col(id_col).alias("id_b"))
        )
        return (
            exhaustive.unionByName(star)
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    return pairs


def simhash_of_hashes(df: DataFrame, id_col: str, hashes) -> DataFrame:
    """(id, simhash bigint) from ANY array<long> of feature hashes —
    the modality-independent core of :func:`simhash` (text tokens
    there; raw-byte shingles in operators/multimodal.py). Feature
    hashing stays JVM-side; the bit-vote kernel is a vectorized
    Pandas UDF (Arrow batches + numpy) — the sanctioned slow path for
    a genuinely non-relational kernel."""

    @F.pandas_udf("long")
    def _bit_votes(hashes: pd.Series) -> pd.Series:
        # Vectorized across the WHOLE Arrow batch: flatten every
        # document's token hashes into one array with a parallel
        # doc-index, expand to a (tokens, 64) sign matrix, and
        # accumulate per-(doc, bit) votes with 64 bincounts — no
        # per-document Python loop. Integer vote sums are
        # order-independent, so results are bit-identical to the
        # per-row formulation. Token chunks bound peak memory.
        n = len(hashes)
        shifts = np.arange(64, dtype=np.uint64)
        lens = np.fromiter(
            (0 if h is None else len(h) for h in hashes), dtype=np.int64, count=n
        )
        total = int(lens.sum())
        if total == 0:
            return pd.Series(np.zeros(n, dtype=np.int64))
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in hashes if h is not None and len(h)]
        ).view(np.uint64)
        doc_idx = np.repeat(np.arange(n), lens)
        votes = np.zeros((n, 64), dtype=np.int64)
        chunk = 1 << 18
        for lo in range(0, total, chunk):
            fl = flat[lo : lo + chunk]
            di = doc_idx[lo : lo + chunk]
            signed = (
                ((fl[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64) * 2
                - 1
            )
            for b in range(64):
                votes[:, b] += np.bincount(di, weights=signed[:, b], minlength=n).astype(
                    np.int64
                )
        out = ((votes > 0).astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return pd.Series(out.view(np.int64))

    # NOTE: no spread() here — the kernel is a Pandas UDF, and fanning
    # a small input across 32 fresh partitions pays a Python-worker
    # spawn per core that dwarfs the kernel itself in a cold local
    # session. At real scale the scan already has many partitions and
    # warm workers.
    return df.select(F.col(id_col), _bit_votes(hashes).alias("simhash"))


def simhash(df: DataFrame, id_col: str, text_col: str, ngram: int = 4) -> DataFrame:
    """(id, simhash bigint): 64-bit sign-of-sums sketch over token
    hashes (xxhash64 JVM-side; see :func:`simhash_of_hashes`)."""
    toks = F.split(normalized_text(F.col(text_col)), " ")
    tok_hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return simhash_of_hashes(df, id_col, tok_hashes)


def simhash_exploded(
    df: DataFrame, id_col: str, text_col: str, blocks: int
) -> DataFrame:
    """(id, simhash, blk, bv): the sketch exploded into its pigeonhole
    blocks — the join-ready (and store-ready) simhash layout shared by
    the corpus self-join and the incremental store."""
    return explode_sketch(simhash(df, id_col, text_col), id_col, blocks)


def explode_sketch(sk: DataFrame, id_col: str, blocks: int) -> DataFrame:
    """Explode ANY (id, simhash) frame into pigeonhole blocks — the
    modality-independent half of :func:`simhash_exploded` (payload
    sketches from operators/multimodal.py reuse it)."""
    # distribute 64 bits over `blocks` blocks (widths differ by <= 1)
    base_w, extra = divmod(64, blocks)
    widths = [base_w + (1 if i < extra else 0) for i in range(blocks)]
    offsets = [sum(widths[:i]) for i in range(blocks)]
    return sk.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("bv"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.blk", "bb.bv")


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    blocks: int | None = None,
    sketch_dir: str | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: split the 64-bit sketch into
    ``blocks`` bit blocks; by pigeonhole, any pair within
    ``max_hamming`` shares at least one exact block as long as
    ``blocks > max_hamming`` (the default derives ``blocks =
    max_hamming + 1``) -> join per block, verify Hamming distance with
    bit_count(a XOR b). Smaller blocks (higher max_hamming) mean bigger
    join buckets — the usual simhash-LSH recall/cost trade."""
    if blocks is None:
        blocks = min(64, max_hamming + 1)
    assert blocks > max_hamming, "pigeonhole needs blocks > max_hamming"
    exploded = simhash_exploded(df, id_col, text_col, blocks)
    return sketch_candidates(
        exploded, id_col, max_hamming, sketch_dir=sketch_dir
    )


def sketch_candidates(
    exploded: DataFrame,
    id_col: str,
    max_hamming: int,
    sketch_dir: str | None = None,
) -> DataFrame:
    """Pigeonhole-blocked near-dup pairs from an already-exploded
    (id, simhash, blk, bv) frame — shared by the text path above and
    the binary-payload path (operators/multimodal.py)."""
    exploded = _materialize(exploded, sketch_dir, slot="dedup.sketch.exploded")
    a, b = exploded.alias("a"), exploded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_words: int = 3,
    max_shingle_freq: int = 1000,
    sketch_dir: str | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard over all pairs via inverted-index join:
    explode shingles -> filter ultra-common shingles (skew guard) ->
    self-join postings -> |intersection| per pair -> Jaccard with
    per-doc set sizes. Returns (id_a, id_b, jaccard >= threshold).

    This is the verification stage behind MinHash candidates and a
    correct standalone dedup for corpora where shingle postings fit
    the shuffle (cap via ``max_shingle_freq``)."""
    # Shingle ONCE (r14 optimization): the sizes / rare-filter /
    # posting-join branches each re-ran the (expensive) shingle
    # transform — one pass now lands the exploded postings in a
    # plan-scoped persist and everything derives from it. No size()>0
    # filter either: explode() drops empty arrays, and zero-shingle
    # docs never survive the inner joins below. word_shingles is
    # array_distinct per doc, so sizes == per-id posting counts
    # exactly.
    postings0 = plan_scoped_persist(
        spread(df).select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), shingle_words)).alias("_s"),
        ),
        "dedup.ngram.postings0",
    )
    sizes = postings0.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    rare = postings0.groupBy("_s").agg(F.count(F.lit(1)).alias("_f")).where(
        F.col("_f") <= max_shingle_freq
    )
    postings = _materialize(
        postings0.join(rare.select("_s"), "_s"),
        sketch_dir,
        slot="dedup.ngram.postings",
    )
    a, b = postings.alias("a"), postings.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a._s") == F.col("b._s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("_inter")
                / (F.col("_na") + F.col("_nb") - F.col("_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def exact_duplicates_unicode(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-dedup groups over UNICODE-normalized text: NFC + lower +
    whitespace collapse. Catches the encoding-level dup class plain
    :func:`exact_duplicates` misses — the same document in NFC vs NFD
    form (mixed crawl sources, OCR output, copy-paste artifacts).

    Plan shape is identical to the exact path and scales the same way:
    one Arrow-batched map-only normalization pass (no Spark built-in
    for Unicode normalization — see functions.text), then a groupBy on
    the 64-bit digest of the normalized key. Shuffles digests + ids
    only, never the raw text. Reference has no dedup at all (extension
    layer, SURVEY §2.6)."""
    h = F.xxhash64(unicode_normalized_text(F.col(text_col))).alias("_h")
    return (
        df.select(F.col(id_col), h)
        .groupBy("_h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_h")
    )
