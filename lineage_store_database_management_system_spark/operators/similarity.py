"""Similarity search over embedding columns (array<float>).

Two tiers (extension layer, BASELINE.json north star):

- **brute-force top-k** — exact cosine against a broadcast query
  vector. The scan is one Catalyst projection (functions.vectors, no
  UDF); ``orderBy(desc).limit(k)`` compiles to TakeOrderedAndProject,
  i.e. per-partition partial top-k + a k-row merge on the driver —
  NO full sort shuffle, so it scales to arbitrarily many partitions.
- **LSH-bucketed** — random-hyperplane signatures (deterministic,
  seeded) prune candidates to matching buckets before exact cosine:
  the 100 TB path where scanning every vector per query is off the
  table. Multi-probe: query all buckets within Hamming radius 0/1 of
  the query signature.
- **knn join / cosine near-dup pairs** — all-pairs above a threshold
  via the same bucketing (used by dedup.embedding strategy).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, dot_product, l2_norm


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: (id, cosine) for the k most similar rows.
    Ties broken by id for determinism."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_similarity(F.col(vec_col), q)
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def unit_normalize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Replace ``vec_col`` with its unit-norm version (zero vectors
    pass through unchanged). The metric-correctness prerequisite for
    running an L2-ranked index stage (IVF coarse quantizer, PQ ADC)
    under a cosine metric: on unit vectors ||a-b||^2 = 2 - 2*cos(a,b),
    so L2 order IS cosine order; unnormalized, the two orders diverge
    with the corpus's norm spread. Note the r7 clustered-probe recall
    cliff was NOT this mismatch — measured, normalization alone left
    recall at 0.28-0.72; the cliff was quantization error on raw
    vectors, fixed by :func:`ivf_residuals` encoding (SCALING.md r7).
    Pure Catalyst (aggregate + transform), map-only."""
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return df.withColumn(
        vec_col,
        F.when(
            norm > 0.0,
            F.transform(F.col(vec_col), lambda x: (x / norm).cast("float")),
        ).otherwise(F.col(vec_col)),
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (driver-side,
    tiny: n_planes x dim floats, broadcast into the plan as literals)."""
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_signature_col(vec_col: str, planes: list[list[float]]):
    """Sign-bit signature of a vector column against fixed hyperplanes
    — an integer bucket id, computed fully JVM-side."""
    bits = []
    for i, p in enumerate(planes):
        pc = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot_product(F.col(vec_col), pc) >= 0, 1 << i).otherwise(0))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("long")


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: restrict the exact cosine scan to rows whose
    LSH bucket is within ``multiprobe_hamming`` of the query's bucket.
    With B buckets this reads ~(probed/B) of the data; at scale the
    table would be written partitioned by bucket so probing is
    partition pruning, not a filter."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qsig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) >= 0:
            qsig |= 1 << i
    probes = {qsig}
    if multiprobe_hamming >= 1:
        for i in range(n_planes):
            probes.add(qsig ^ (1 << i))
    if multiprobe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qsig ^ (1 << i) ^ (1 << j))
    sig = lsh_signature_col(vec_col, planes)
    candidates = df.where(sig.isin(*[F.lit(p) for p in probes]))
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """All-pairs cosine >= threshold, LSH-blocked: join only within
    identical sign-signature buckets (high-cosine pairs almost surely
    collide on all planes), then verify exactly. Returns
    (id_a, id_b, cosine)."""
    planes = _hyperplanes_for(df, vec_col, n_planes, seed)
    sig = lsh_signature_col(vec_col, planes)
    with_sig = df.select(F.col(id_col), F.col(vec_col), sig.alias("_sig"))
    a, b = with_sig.alias("a"), with_sig.alias("b")
    cos = cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(
            b,
            (F.col("a._sig") == F.col("b._sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def cosine_pairs_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """EXACT all-pairs cosine >= threshold — the verification/oracle
    stage behind :func:`cosine_near_dup_pairs`. O(n^2) by definition:
    run it on a bounded subset (or per-LSH-bucket); the small side is
    broadcast so the pair generation is shuffle-free."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    cos = cosine_similarity(F.col("_va"), F.col("_vb"))
    out = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        # threshold on the RAW double (bit-identical in any engine
        # running the same double-precision formula); round only for
        # display so boundary values can't flip under rounding modes
        .where(F.col("cosine") >= threshold)
    )
    if round_to is not None:
        out = out.select("id_a", "id_b", F.round("cosine", round_to).alias("cosine"))
    return out


def _hyperplanes_for(df: DataFrame, vec_col: str, n_planes: int, seed: int):
    dim = len(df.select(vec_col).first()[0])
    return _hyperplanes(dim, n_planes, seed)


def _codebook_sample(
    df: DataFrame, id_col: str, vec_col: str, sample_n: int, sample: str
):
    """Deterministic training sample, collected to the driver.

    ``"head"`` (legacy): lowest ``sample_n`` ids — reproducible but
    BIASED to whatever id order correlates with (insert time, source).
    ``"hash"``: lowest ``sample_n`` values of ``xxhash64(id)`` — a
    uniform pseudo-random slice of the WHOLE corpus computed
    executor-side (TakeOrdered keeps only k rows per partition; no
    full shuffle, no rand() nondeterminism), so corpus diversity
    reaches the codebook no matter how ids cluster."""
    import numpy as np

    if sample == "hash":
        src = df.orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
    elif sample == "head":
        src = df.orderBy(id_col)
    else:
        raise ValueError(f"unknown sample mode {sample!r}")
    rows = src.limit(sample_n).select(vec_col).collect()
    return np.asarray([list(r[0]) for r in rows], dtype=np.float64)


def _lloyd_refine_distributed(
    df: DataFrame, cents, vec_col: str, iters: int
):
    """Distributed Lloyd refinement of a (tiny) centroid array over
    the FULL frame: per iteration, one Arrow-batched mapInPandas pass
    emits per-partition partial state — (cluster, count, vector sum),
    at most n_lists rows per partition — and the driver folds the
    partials into new means. Exactly the Bloom/CMS build shape
    (driver memory ∝ n_lists x dim x partitions, never ∝ rows): this
    is the piece that lets the codebook see 100 TB instead of a
    512-row sample."""
    import numpy as np
    import pandas as pd

    k, dim = cents.shape
    out_schema = f"c int, n long, s array<double>"
    for _ in range(iters):
        c_b = cents.copy()

        def _partials(batches):
            cnt = np.zeros(k, dtype=np.int64)
            ssum = np.zeros((k, dim), dtype=np.float64)
            for pdf in batches:
                x = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[pdf.columns[0]]]
                )
                if len(x) == 0:
                    continue
                d2 = (
                    (x * x).sum(1)[:, None]
                    - 2.0 * (x @ c_b.T)
                    + (c_b * c_b).sum(1)[None, :]
                )
                a = d2.argmin(axis=1)
                np.add.at(cnt, a, 1)
                np.add.at(ssum, a, x)
            live = np.nonzero(cnt)[0]
            # "s" must be an OBJECT series of python lists: with zero
            # live clusters pandas infers float64 for an empty column
            # and Arrow's NumPyConverter refuses ndarray->list<double>
            yield pd.DataFrame(
                {
                    "c": pd.Series(live, dtype="int32"),
                    "n": pd.Series(cnt[live], dtype="int64"),
                    "s": pd.Series(
                        [ssum[i].tolist() for i in live], dtype="object"
                    ),
                }
            )

        parts = df.select(vec_col).mapInPandas(_partials, out_schema).collect()
        cnt = np.zeros(k, dtype=np.int64)
        ssum = np.zeros((k, dim), dtype=np.float64)
        for r in parts:
            cnt[r["c"]] += r["n"]
            ssum[r["c"]] += np.asarray(r["s"], dtype=np.float64)
        nz = cnt > 0
        cents = cents.copy()
        cents[nz] = ssum[nz] / cnt[nz][:, None]
    return cents


def ivf_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    sample_n: int = 512,
    iters: int = 8,
    seed: int = 42,
    sample: str = "head",
    refine_iters: int = 0,
) -> list[list[float]]:
    """Train an IVF coarse quantizer: mini k-means on a deterministic
    sample. The centroid table is tiny (n_lists x dim) and lives on
    the driver / broadcast; at 100 TB you train once and reuse.

    Scale path (VERDICT r5 item 6): ``sample="hash"`` draws the seed
    sample uniformly from the whole corpus executor-side instead of
    the id-ordered head, and ``refine_iters>0`` runs that many
    distributed Lloyd passes over the FULL frame afterwards
    (:func:`_lloyd_refine_distributed` — per-partition partial sums,
    driver folds n_lists rows), so the fixed-size driver sample stops
    capping recall at real corpus diversity. Defaults preserve the
    legacy head-sample behavior (existing indexes/oracles are
    byte-stable)."""
    x = _codebook_sample(df, id_col, vec_col, sample_n, sample)
    rng = __import__("random").Random(seed)
    idx = sorted(rng.sample(range(len(x)), min(n_lists, len(x))))
    cents = x[idx].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(len(cents)):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    if refine_iters:
        cents = _lloyd_refine_distributed(df, cents, vec_col, refine_iters)
    return [[float(v) for v in c] for c in cents]


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "_list",
) -> DataFrame:
    """Assign each vector to its nearest centroid (inverted list id).
    Vectorized Pandas UDF (one matmul per Arrow batch). At scale the
    assigned table is written partitioned by list id so probing is
    partition pruning."""
    import numpy as np
    import pandas as pd

    cents = np.asarray(centroids, dtype=np.float64)

    # no type hints: `from __future__ import annotations` stringifies
    # them and pyspark can't resolve locally-imported pd.Series
    def _nearest_fn(vecs):
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(x) == 0:
            return pd.Series([], dtype="int32")
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ cents.T) + (cents * cents).sum(1)[None, :]
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    _nearest = F.pandas_udf(_nearest_fn, "int")

    return df.withColumn(out_col, _nearest(F.col(vec_col)))


def ivf_residuals(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    list_col: str = "_list",
    out_col: str = "_res",
) -> DataFrame:
    """Append the per-vector IVF residual (vector - its list's
    centroid) — the encoding target of the full IVFADC recipe (Jégou
    et al. 2011 §IV): PQ codes trained on residuals spend their bits
    on the WITHIN-list displacement that actually distinguishes near
    neighbors, instead of re-describing the coarse centroid every
    code repeats. On clustered corpora this is the difference between
    a recall cliff and working ADC (SCALING.md r7 probe: 0.33 -> see
    table). Pure Catalyst: the tiny centroid table becomes a literal
    array-of-arrays indexed by list id, and the subtraction is one
    zip_with — no Python, map-only."""
    cents_lit = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )
    cent = F.element_at(cents_lit, F.col(list_col) + 1)
    return df.withColumn(
        out_col,
        F.zip_with(F.col(vec_col), cent, lambda x, c: (x - c).cast("float")),
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "_list",
    round_to: int | None = None,
) -> DataFrame:
    """IVF probe: rank centroids by distance to the query driver-side,
    restrict the exact cosine scan to the ``nprobe`` nearest inverted
    lists. With lists as partition keys this reads nprobe/n_lists of
    the data. ``round_to`` ranks by the ROUNDED cosine (id tiebreak)
    so an oracle ordering by ``ROUND(c, n), id`` picks the identical
    boundary set."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    order = (((cents - q[None, :]) ** 2).sum(axis=1)).argsort()[:nprobe]
    probes = [int(i) for i in order]
    candidates = df.where(F.col(list_col).isin(probes))
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col, round_to)


def ivf_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "_list",
    qid_col: str = "q_id",
    qvec_col: str = "q_embedding",
    round_to: int | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """BATCH ANN: IVF top-k for a whole DataFrame of query vectors in
    ONE job — the production retrieval shape (dedup sweeps, eval sets,
    recommendation batches arrive as millions of queries, and a
    driver-side loop over :func:`ivf_topk` would launch one job per
    query). Output: (q_id, vec_id, cosine), top-k per query, ties by
    id.

    Scale shape:

    1. each QUERY is assigned its ``nprobe`` nearest lists by one
       vectorized Arrow kernel over the broadcast centroid table
       (same matmul as :func:`ivf_assign`, argpartition per batch);
    2. queries explode to (list, query) and equi-join the data on the
       list id — with the data stored PARTITIONED BY list
       (ivf_pq_write_index) this is partition pruning, and each data
       row meets only the queries probing its list (corpus x
       nprobe/n_lists pairs, never corpus x queries);
    3. cosine is JVM-side (``zip_with`` dot product on the joined
       row); per-query top-k is a ranked window -> WindowGroupLimit
       pushes the limit into the shuffle (no global sort).

    ``round_to`` ranks by the rounded cosine with id tiebreak, the
    deterministic-gate convention shared with the single-query ops.

    ``broadcast_queries`` (default True): the list id has only
    n_lists distinct values, so letting the planner shuffle BOTH
    sides on it would be a pathological 16-partition exchange; the
    canonical retrieval batch (queries << corpus) broadcasts the
    exploded query side instead — the data side never moves. Set
    False only when the query set is itself corpus-scale (then
    pre-partition both sides by list id, or go through
    semantic-dedup-style clustering instead)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    cents = np.asarray(centroids, dtype=np.float64)
    npb = min(nprobe, len(cents))

    def _probes_fn(vecs):
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(x) == 0:
            return pd.Series([], dtype="object")
        d2 = (
            (x * x).sum(1)[:, None]
            - 2.0 * (x @ cents.T)
            + (cents * cents).sum(1)[None, :]
        )
        idx = np.argpartition(d2, npb - 1, axis=1)[:, :npb]
        return pd.Series([row.astype("int32").tolist() for row in idx], dtype="object")

    _probes = F.pandas_udf(_probes_fn, "array<int>")

    q_lists = queries.select(
        F.col(qid_col),
        F.col(qvec_col),
        F.explode(_probes(F.col(qvec_col))).alias(list_col),
    )
    if broadcast_queries:
        q_lists = F.broadcast(q_lists)
    joined = df.join(q_lists, on=list_col)
    sim = cosine_similarity(F.col(vec_col), F.col(qvec_col))
    if round_to is not None:
        sim = F.round(sim, round_to)
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        joined.select(F.col(qid_col), F.col(id_col), sim.alias("cosine"))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def filtered_topk(
    df: DataFrame,
    query_vec: list[float],
    predicate,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Exact PRE-FILTER vector search: push the predicate into the
    scan, rank only the survivors. ``predicate`` is a Column or SQL
    string; as a plain comparison on a stored column it reaches the
    parquet reader (PushedFilters), so the scan cost is the filter's
    selectivity, not the corpus — the right plan whenever the filter
    keeps few enough rows that exact ranking over them is cheap.
    The ranking itself is TakeOrderedAndProject (per-partition
    partial top-k, k-row driver merge, no sort shuffle)."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    return brute_force_topk(df.where(pred), query_vec, k, id_col, vec_col, round_to)


def ivf_filter_histogram(
    assigned: DataFrame,
    filter_col: str,
    list_col: str = "_list",
) -> dict:
    """Index-build-time metadata for filtered ANN: per-(inverted list,
    filter value) row counts, ONE aggregate job over the assigned
    corpus. Meant for low-cardinality filter columns (label / source /
    lang — the attributes real retrieval stacks filter on); the result
    is n_lists x n_values rows on the driver, independent of corpus
    size. Query-time strategy selection (:func:`ivf_filtered_topk`)
    then needs ZERO data jobs to decide: match totals and per-list
    availability are lookups."""
    rows = (
        assigned.groupBy(list_col, filter_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    hist: dict = {}
    for r in rows:
        hist.setdefault(r[filter_col], {})[int(r[list_col])] = int(r["_n"])
    return hist


def ivf_filtered_topk(
    assigned: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    filter_col: str,
    filter_value,
    k: int = 10,
    histogram: dict | None = None,
    brute_threshold: int = 128,
    min_candidates: int | None = None,
    max_nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "_list",
    round_to: int | None = None,
):
    """Filtered ANN with metadata-driven strategy selection — the
    missing piece between :func:`filtered_topk` (always exact, always
    scans every match) and :func:`ivf_topk` (prunes lists but is blind
    to the predicate, so a selective filter starves the probed lists
    of matches and recall collapses).

    Strategy, decided entirely from the build-time histogram
    (:func:`ivf_filter_histogram` — no data job):

    - ``total_matches <= brute_threshold`` → **prefilter**: exact
      scan of the matching rows (:func:`filtered_topk`). A selective
      filter makes exact search cheaper than any probe plan.
    - otherwise → **probe**: rank lists by centroid distance to the
      query and take lists IN ORDER until the histogram says at least
      ``min_candidates`` (default ``8*k``) matching rows live in the
      probe set — predicate-aware nprobe escalation, so a filter that
      concentrates in few lists probes few lists, and one that spreads
      thin escalates automatically instead of returning k' < k rows.
      The single data job scans ``list IN probes AND filter`` (list
      partition pruning + pushed filter) and exact-ranks.

    Returns ``(topk_df, info)`` where ``info`` records the decision
    (``strategy``, ``probes``, ``total_matches``,
    ``candidates_available``) — deterministic given the corpus, so
    gates can assert it."""
    pred = F.col(filter_col) == F.lit(filter_value)
    hist = (
        histogram
        if histogram is not None
        else ivf_filter_histogram(assigned, filter_col, list_col)
    )
    per_list = hist.get(filter_value, {})
    total = sum(per_list.values())
    if total <= brute_threshold:
        out = filtered_topk(assigned, query_vec, pred, k, id_col, vec_col, round_to)
        info = {
            "strategy": "prefilter",
            "probes": [],
            "total_matches": total,
            "candidates_available": total,
        }
        return out, info

    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    order = (((cents - q[None, :]) ** 2).sum(axis=1)).argsort()
    cap = len(cents) if max_nprobe is None else min(max_nprobe, len(cents))
    need = 8 * k if min_candidates is None else min_candidates
    probes: list[int] = []
    avail = 0
    for li in order[:cap]:
        probes.append(int(li))
        avail += per_list.get(int(li), 0)
        if avail >= need:
            break
    out = brute_force_topk(
        assigned.where(F.col(list_col).isin(probes) & pred),
        query_vec,
        k,
        id_col,
        vec_col,
        round_to,
    )
    info = {
        "strategy": "probe",
        "probes": probes,
        "total_matches": total,
        "candidates_available": avail,
    }
    return out, info


def hybrid_topk_rrf(
    a: DataFrame,
    a_score: str,
    b: DataFrame,
    b_score: str,
    id_col: str = "doc_id",
    k: int = 10,
    k_rrf: int = 60,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    two ranked retrieval lists — the standard hybrid-search
    composition (BM25 lexical + embedding ANN) that beats either
    signal alone without any score calibration: each list contributes
    ``1 / (k_rrf + rank)`` for the documents it ranked, ranks taken
    per-list by (score desc, id) so fusion is deterministic given the
    input scores.

    Scale shape: inputs are TOP-K FRAMES (each bounded by its own k —
    the retrieval operators upstream already did the corpus-sized
    work), so the unpartitioned rank windows and the full-outer join
    here run on k-row data; nothing in this operator scales with the
    corpus. Returns (id, rrf) ordered desc, id-tiebroken."""
    from pyspark.sql import Window

    ra = a.select(
        F.col(id_col),
        F.row_number()
        .over(Window.orderBy(F.desc(a_score), F.asc(id_col)))
        .alias("_ra"),
    )
    rb = b.select(
        F.col(id_col),
        F.row_number()
        .over(Window.orderBy(F.desc(b_score), F.asc(id_col)))
        .alias("_rb"),
    )
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(k_rrf) + F.col(r)), F.lit(0.0)
    )
    return (
        ra.join(rb, on=id_col, how="full_outer")
        .select(
            F.col(id_col),
            F.round(contrib("_ra") + contrib("_rb"), round_to).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )


def hybrid_search_from_indexes(
    spark,
    bm25_index_dir: str,
    ann_index_dir: str,
    query_terms: list[str],
    query_vec: list[float],
    k: int = 10,
    k_lex: int = 20,
    k_ann: int = 20,
    nprobe: int = 4,
    n_candidates: int = 100,
    k_rrf: int = 60,
    id_col: str = "doc_id",
    round_to: int = 6,
    bm25_round_to: int = 4,
    ann_round_to: int | None = 3,
    k1: float = 1.2,
    b: float = 0.75,
    as_of_bm25: dict | None = None,
    as_of_ann: dict | None = None,
) -> DataFrame:
    """The production hybrid-retrieval entry point: one call runs the
    lexical leg off the durable BM25 index
    (:func:`~.textsearch.bm25_topk_from_index` — term-pruned posting
    read, live df, mutation-exact counters), the semantic leg off the
    durable IVF-PQ index (:func:`ivf_pq_topk_from_index` —
    partition-pruned probes over the tombstone-filtered live view),
    and fuses them with reciprocal-rank fusion
    (:func:`hybrid_topk_rrf`). Both legs read indexes that track
    deletes/updates/appends, so the fused answer reflects the current
    corpus without any scan — the corpus-sized work happened at index
    build/maintenance time. Gated end-to-end under mutation by
    ``ds_hybrid_index_mutated_rrf``. Returns (id_col, rrf), k rows.

    ``as_of_bm25`` / ``as_of_ann`` replay BOTH legs at historical
    markers (r14 time travel — :func:`~.textsearch.index_asof_marker`
    and :func:`ann_index_asof_marker`): capture the pair after the
    same corpus mutation (e.g. one ``apply_corpus_changes`` /
    ``sync_indexes_from_table`` call, which mutates the indexes
    together) and the fused ranking is consistent AS OF that corpus
    state — hybrid retrieval over a snapshot, while the live indexes
    keep absorbing mutations. Passing only one marker is allowed but
    fuses two different corpus states; gated
    ``ds_hybrid_index_asof_rrf`` uses the consistent pair."""
    from . import textsearch as _ts

    bm = _ts.bm25_topk_from_index(
        spark, bm25_index_dir, query_terms, k=k_lex, k1=k1, b=b,
        round_to=bm25_round_to, as_of=as_of_bm25,
    )
    bm_id = [c for c in bm.columns if c != "bm25"][0]
    if bm_id != id_col:
        bm = bm.withColumnRenamed(bm_id, id_col)
    meta = _open_ann_meta(ann_index_dir)
    ann = ivf_pq_topk_from_index(
        spark, ann_index_dir, query_vec, k=k_ann, nprobe=nprobe,
        n_candidates=n_candidates, round_to=ann_round_to,
        as_of=as_of_ann,
    )
    if meta["id_col"] != id_col:
        ann = ann.withColumnRenamed(meta["id_col"], id_col)
    return hybrid_topk_rrf(
        bm, "bm25", ann, "cosine", id_col=id_col, k=k, k_rrf=k_rrf,
        round_to=round_to,
    )


def multi_vector_split(
    df: DataFrame,
    vec_col: str = "embedding",
    n_tokens: int = 4,
    out_col: str = "token_vecs",
) -> DataFrame:
    """Slice a flat dim-D vector into ``n_tokens`` contiguous
    sub-vectors (array<array<double>>) — deterministic multi-vector
    plumbing for corpora stored single-vector. Real late-interaction
    corpora store per-token vectors natively; this adapter exists so
    the MaxSim operators are exercisable (and gated) on any embedding
    column. Pure Catalyst (slice inside transform), map-only."""
    return df.withColumn(
        out_col,
        F.expr(
            f"transform(sequence(0, {n_tokens - 1}), t -> "
            f"transform(slice({vec_col}, t * (size({vec_col}) div {n_tokens}) + 1,"
            f" size({vec_col}) div {n_tokens}), x -> cast(x as double)))"
        ),
    )


def maxsim_score_col(mv_col: str, query_tokens: list[list[float]]):
    """ColBERT MaxSim as ONE Catalyst expression: for each query
    token, the max dot product against the document's token vectors;
    summed. The query is driver-side (tokens are few), so the outer
    sum unrolls into Python — every term is a JVM-side
    ``array_max(transform(dot))``, no Python in the row path, no
    shuffle: scoring a 100 TB corpus is a map-only projection."""
    total = F.lit(0.0)
    for qt in query_tokens:
        qlit = F.array(*[F.lit(float(x)) for x in qt])
        best = F.array_max(
            F.transform(
                F.col(mv_col),
                lambda dt: F.aggregate(
                    F.zip_with(dt, qlit, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
        )
        total = total + best
    return total


def maxsim_topk(
    df: DataFrame,
    query_tokens: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    mv_col: str = "token_vecs",
    round_to: int | None = None,
) -> DataFrame:
    """Exact late-interaction top-k: rank the corpus by MaxSim against
    a driver-side query token set. Compiles to a map-only projection +
    TakeOrderedAndProject (per-partition partial top-k, k-row driver
    merge) — the same no-global-sort shape as :func:`brute_force_topk`.
    Ties broken by id; ``round_to`` for engine-stable gating."""
    score = maxsim_score_col(mv_col, query_tokens)
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        df.select(F.col(id_col), score.alias("maxsim"))
        .orderBy(F.desc("maxsim"), F.asc(id_col))
        .limit(k)
    )


def scalar_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """Per-vector scalar quantization: each float compresses to an
    int code in ``[0, levels-1]`` over the vector's own [min, max]
    span — 4x smaller embedding storage (int8 vs float32) before ANN,
    reconstructable to within half a step. Codes use FLOOR bucketing
    (engine-unambiguous, unlike round-half ties):

        step  = (max - min) / levels
        code  = min(levels-1, floor((x - min) / step));  0 if max==min
        x'    = min + (code + 0.5) * step   (|x - x'| <= step/2)

    Pure Catalyst (transform/aggregate) — no UDF, embarrassingly
    parallel, no shuffle. Returns (id, qmin, qstep, codes)."""
    v = F.col(vec_col)
    vmin = F.array_min(v)
    vmax = F.array_max(v)
    span = vmax.cast("double") - vmin.cast("double")
    step = span / F.lit(float(levels))
    codes = F.transform(
        v,
        lambda x: F.when(span == 0.0, F.lit(0)).otherwise(
            F.least(
                F.lit(levels - 1),
                F.floor((x.cast("double") - vmin.cast("double")) / step).cast("int"),
            )
        ),
    )
    return df.select(
        F.col(id_col),
        vmin.cast("double").alias("qmin"),
        step.alias("qstep"),
        codes.alias("codes"),
    )


def dequantize_error(
    quantized: DataFrame,
    original: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Max absolute reconstruction error per vector (x' = qmin +
    (code + 0.5) * qstep) — by construction <= qstep / 2."""
    joined = quantized.join(original.select(id_col, vec_col), on=id_col)
    recon = F.transform(
        F.col("codes"),
        lambda c: F.col("qmin") + (c.cast("double") + 0.5) * F.col("qstep"),
    )
    err = F.array_max(
        F.zip_with(
            F.col(vec_col), recon, lambda x, r: F.abs(x.cast("double") - r)
        )
    )
    return joined.select(F.col(id_col), err.alias("max_abs_err"), F.col("qstep"))


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For every left row, its k nearest right rows by cosine (exact).
    Broadcast the smaller side; per-left top-k via window rank. At
    100 TB this is the verify stage behind LSH blocking — never run it
    unblocked on two huge sides."""
    from pyspark.sql import Window

    r = F.broadcast(right.select(F.col(right_id).alias("_rid_r"), F.col(vec_col).alias("_v_r")))
    cos = cosine_similarity(F.col(vec_col), F.col("_v_r"))
    scored = left.select(left_id, vec_col).crossJoin(r).select(
        F.col(left_id), F.col("_rid_r").alias(f"nn_{right_id}"), cos.alias("cosine")
    )
    w = Window.partitionBy(left_id).orderBy(F.desc("cosine"), F.asc(f"nn_{right_id}"))
    return scored.withColumn("_rnk", F.row_number().over(w)).where(F.col("_rnk") <= k).drop("_rnk")


# ---------------------------------------------------------------------------
# Product quantization (the IVF+PQ billion-scale recipe)
# ---------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    nbits: int = 4,
    sample_n: int = 512,
    iters: int = 8,
    seed: int = 42,
    sample: str = "head",
    refine_iters: int = 0,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split each vector into
    ``m`` contiguous sub-blocks and run the same deterministic
    mini k-means as :func:`ivf_centroids` per block (2^nbits
    centroids each). Codebooks are tiny (m x 2^nbits x dim/m) and
    broadcast; at 100 TB you train once on a sample. A d-dim float32
    vector compresses to m codes — with m=4, nbits=4 that is 2 bytes
    per vector, a 128x reduction at d=64.

    ``sample``/``refine_iters``: same scale path as
    :func:`ivf_centroids` — uniform executor-side hash sample plus
    distributed Lloyd refinement per sub-block (the refinement frame
    is the sliced sub-vector, so each block's pass moves only dim/m
    doubles per row). Defaults preserve legacy behavior."""
    import numpy as np

    x = _codebook_sample(df, id_col, vec_col, sample_n, sample)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    ksz = 1 << nbits
    rng = __import__("random").Random(seed)
    books = []
    for b in range(m):
        xb = x[:, b * sub : (b + 1) * sub]
        idx = sorted(rng.sample(range(len(xb)), min(ksz, len(xb))))
        cents = xb[idx].copy()
        for _ in range(iters):
            d2 = ((xb[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(len(cents)):
                members = xb[assign == j]
                if len(members):
                    cents[j] = members.mean(axis=0)
        if refine_iters:
            sub_frame = df.select(
                F.slice(F.col(vec_col), b * sub + 1, sub).alias("_sub")
            )
            cents = _lloyd_refine_distributed(
                sub_frame, cents, "_sub", refine_iters
            )
        books.append([[float(v) for v in c] for c in cents])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "_pq",
) -> DataFrame:
    """Encode every vector to its m nearest-centroid codes (array<int>).
    Vectorized Pandas UDF — one small matmul per block per Arrow
    batch. The encoded table is what you persist at scale; raw
    vectors are only needed by an exact-refine stage."""
    import numpy as np
    import pandas as pd

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]

    def _enc_fn(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = np.empty((len(x), len(books)), dtype=np.int32)
        for b, cents in enumerate(books):
            xb = x[:, b * sub : (b + 1) * sub]
            d2 = (
                (xb * xb).sum(1)[:, None]
                - 2.0 * (xb @ cents.T)
                + (cents * cents).sum(1)[None, :]
            )
            codes[:, b] = d2.argmin(axis=1)
        return pd.Series([c.tolist() for c in codes])

    _enc = F.pandas_udf(_enc_fn, "array<int>")
    return df.withColumn(out_col, _enc(F.col(vec_col)))


def pq_adc_candidates(
    df: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    n_candidates: int = 100,
    id_col: str = "vec_id",
    code_col: str = "_pq",
) -> DataFrame:
    """Asymmetric-distance (ADC) scan: the query builds one lookup
    table per block driver-side (||q_b - centroid||^2 for every
    centroid), and each encoded vector's approximate squared L2
    distance is m table lookups + a sum — a vectorized numpy take
    over the code column, never touching raw vectors. Returns the
    ``n_candidates`` lowest-distance ids (deterministic: ADC distance
    with id tiebreak)."""
    import numpy as np
    import pandas as pd

    q = np.asarray(query_vec, dtype=np.float64)
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]
    lut = np.stack(
        [
            ((q[b * sub : (b + 1) * sub][None, :] - cents) ** 2).sum(axis=1)
            for b, cents in enumerate(books)
        ]
    )  # (m, 2^nbits)

    def _adc_fn(codes):
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        c = np.asarray([np.asarray(v, dtype=np.int64) for v in codes])
        rows = np.arange(lut.shape[0])[None, :]
        return pd.Series(lut[rows, c].sum(axis=1))

    _adc = F.pandas_udf(_adc_fn, "double")
    return (
        df.withColumn("_adc", _adc(F.col(code_col)))
        .orderBy(F.asc("_adc"), F.asc(id_col))
        .limit(n_candidates)
    )


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    n_candidates: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "_pq",
    round_to: int | None = None,
) -> DataFrame:
    """Two-phase PQ search: ADC scan over the compressed codes picks
    ``n_candidates``, then the exact cosine re-ranks ONLY those — the
    standard refine step that restores exact ordering among whatever
    the compressed scan recalled. At scale the first phase reads 2-8
    bytes per vector instead of 4d, and composes with IVF partition
    pruning (encode per inverted list)."""
    cands = pq_adc_candidates(
        df, query_vec, codebooks, n_candidates, id_col, code_col
    ).select(id_col)
    subset = df.join(F.broadcast(cands), on=id_col, how="left_semi")
    return brute_force_topk(subset, query_vec, k, id_col, vec_col, round_to)


def ivf_pq_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    n_candidates: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "_list",
    code_col: str = "_pq",
    round_to: int | None = None,
    residual: bool = False,
) -> DataFrame:
    """The composed billion-scale recipe (IVF+PQ, Jégou et al. 2011):
    the coarse quantizer prunes to the ``nprobe`` nearest inverted
    lists (partition pruning — reads nprobe/n_lists of the data), the
    ADC scan over those lists' compressed codes picks
    ``n_candidates`` (2-8 bytes per vector touched), and the exact
    cosine re-ranks only the recalled candidates. Input is a table
    prepared once with :func:`ivf_assign` + :func:`pq_encode` —
    at scale, written partitioned by ``list_col`` with raw vectors
    alongside codes so the refine stage stays partition-local.

    ``residual=True`` is the full IVFADC variant: codes were trained
    and encoded over :func:`ivf_residuals` displacements, and the ADC
    lookup table is rebuilt per probed list from the query's OWN
    residual against that list's centroid (still nprobe tiny
    driver-side tables; the nprobe per-list scans fuse into one lazy
    union job). Distances stay comparable across lists — each
    approximates the same ||q - x||^2 — so one global
    ``n_candidates`` cut applies. Use for clustered corpora, where
    raw-vector PQ burns its bits re-describing the coarse centroid
    (the r7 mixture-of-Gaussians recall cliff, SCALING.md)."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    order = (((cents - q[None, :]) ** 2).sum(axis=1)).argsort()[:nprobe]
    probes = [int(i) for i in order]
    lists = df.where(F.col(list_col).isin(probes))
    if residual:
        from functools import reduce

        per = [
            pq_adc_candidates(
                df.where(F.col(list_col) == l),
                (q - cents[l]).tolist(),
                codebooks,
                n_candidates,
                id_col,
                code_col,
            ).select(id_col, "_adc")
            for l in probes
        ]
        cands = (
            reduce(lambda a, b: a.unionByName(b), per)
            .orderBy(F.asc("_adc"), F.asc(id_col))
            .limit(n_candidates)
            .select(id_col)
        )
    else:
        cands = pq_adc_candidates(
            lists, query_vec, codebooks, n_candidates, id_col, code_col
        ).select(id_col)
    subset = lists.join(F.broadcast(cands), on=id_col, how="left_semi")
    return brute_force_topk(subset, query_vec, k, id_col, vec_col, round_to)


def ivf_pq_write_index(
    df: DataFrame,
    index_dir: str,
    n_lists: int = 16,
    m: int = 4,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
    filter_cols: list[str] | None = None,
    range_cols: list[str] | None = None,
) -> None:
    """Persist a durable ANN index: train the coarse quantizer and PQ
    codebooks (once, on the deterministic sample), assign + encode
    every vector, and write the table PARTITIONED BY inverted list —
    so a probe is a partition-pruned read of nprobe/n_lists of the
    files, the same storage trick as the secondary index. Raw vectors
    ride along inside each partition so the exact-refine stage stays
    partition-local. Codebooks/centroids land in a JSON sidecar
    (underscore-prefixed: invisible to the Parquet reader).

    ``residual=True`` trains/encodes PQ over :func:`ivf_residuals`
    displacements (full IVFADC) — the clustered-corpus default per
    the r7 recall study (SCALING.md); the flag is recorded in the
    sidecar so probes and appends transparently do the right thing.

    ``filter_cols`` names low-cardinality attribute columns of ``df``
    (label / lang / source) to support FILTERED search on the durable
    index: the columns already ride into the partitioned parquet with
    every row; this additionally records their per-(list, value)
    histograms in the sidecar (:func:`ivf_filter_histogram` shape) so
    :func:`ivf_pq_filtered_topk_from_index` selects its strategy from
    metadata alone. Appends keep the histograms current.

    ``range_cols`` names numeric/timestamp columns (created_at /
    score / size) to support RANGE-filtered search: per-list exact
    min/max plus equi-width bucket counts land in the sidecar
    (:func:`ivf_range_stats`), so
    :func:`ivf_pq_range_filtered_topk_from_index` prunes lists whose
    [min, max] provably misses the query range and sizes its probe
    escalation from the buckets — again zero data jobs to plan."""
    import json as _json
    import os as _os

    cents = ivf_centroids(df, n_lists=n_lists, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(df, cents, vec_col=vec_col)
    if residual:
        src = ivf_residuals(assigned, cents, vec_col=vec_col)
        books = pq_train(src, vec_col="_res", id_col=id_col, m=m, nbits=nbits)
        prepared = pq_encode(src, books, vec_col="_res").drop("_res")
    else:
        books = pq_train(df, vec_col=vec_col, id_col=id_col, m=m, nbits=nbits)
        prepared = pq_encode(assigned, books, vec_col=vec_col)
    # _gen is the write generation (the text indexes' _batch): it
    # bounds tombstones so delete-then-append of the SAME id works —
    # the tombstone kills generations <= its _upto, the re-indexed
    # row rides a later generation and stays live (round 14; before
    # this, same-id updates required a compaction first)
    prepared = prepared.withColumn("_gen", F.lit(0))
    prepared.write.mode("overwrite").partitionBy("_list").parquet(index_dir)
    # Sidecar stats aggregate over the FRESHLY WRITTEN index, not the
    # `assigned` plan (r14 optimization): `assigned` re-runs the
    # ArrowEvalPython centroid-assign kernel over the whole corpus per
    # consumer — health + one pass per filter column + two per range
    # column re-encoded the corpus 2+k+2r times. The written parquet
    # carries every needed column (_list, vectors, attributes), so
    # these are plain columnar aggregates now — no Python kernel,
    # rows identical by construction.
    written = df.sparkSession.read.parquet(index_dir)
    # Birth-time health stats for the drift trigger
    # (ivf_pq_index_staleness): per-list balance and mean assignment
    # error of the data the quantizer was actually trained for. One
    # n_lists-row agg over the freshly written index.
    build_stats = _ivf_health(
        ivf_residuals(written, cents, vec_col=vec_col)
    )
    fhist = {}
    for c in filter_cols or []:
        fhist[c] = _hist_triples(ivf_filter_histogram(written, c))
    rstats = {}
    for c in range_cols or []:
        rstats[c] = ivf_range_stats(written, c)
    meta = {"centroids": cents, "codebooks": books, "id_col": id_col,
            "vec_col": vec_col, "residual": residual,
            "n_lists": n_lists, "m": m, "nbits": nbits,
            "n_batches": 1,
            "build_stats": build_stats, "filter_hist": fhist,
            "range_stats": rstats,
            "hist_rows": build_stats["rows"]}
    _refresh_ann_markers(index_dir, meta)
    tmp = _os.path.join(index_dir, "_ann_meta.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    _os.replace(tmp, _os.path.join(index_dir, "_ann_meta.json"))


def ivf_range_stats(
    assigned: DataFrame,
    range_col: str,
    list_col: str = "_list",
    n_buckets: int = 16,
) -> dict:
    """Index-build-time metadata for RANGE-filtered ANN over a
    numeric/timestamp column: per-inverted-list EXACT min/max +
    equi-width bucket counts over the global [lo, hi]. Two aggregate
    jobs at build (global extent, then one (list, bucket) group-by);
    the result is n_lists x n_buckets rows on the driver, independent
    of corpus size. Timestamps are folded through CAST(double) (epoch
    seconds) so the sidecar stays JSON.

    The per-list min/max are the PROVABLE part (a list whose extent
    misses the query range cannot hold a match — pruning on them is
    exact); the buckets are the ESTIMATE part (probe-escalation
    sizing only). Bucket edges FREEZE at build: appends clamp
    out-of-extent values into the edge buckets, keeping the fold
    additive while min/max stay exact under the min/max merge."""
    c = F.col(range_col).cast("double")
    g = assigned.where(c.isNotNull()).agg(
        F.min(c).alias("lo"), F.max(c).alias("hi")
    ).first()
    if g["lo"] is None:
        return {"lo": 0.0, "hi": 0.0, "n_buckets": n_buckets, "lists": {}}
    base = {"lo": float(g["lo"]), "hi": float(g["hi"]), "n_buckets": n_buckets}
    return _range_stats_delta(assigned, range_col, base, list_col)


def _merge_range_stats(base: dict, delta: dict) -> dict:
    """Fold an append batch's range stats into the sidecar's: counts
    and buckets add, per-list min/max take the merge — exactness of
    the pruning bound survives any append sequence. ``delta`` must be
    computed against the SAME frozen [lo, hi] bucket edges (the
    append path rebuilds it with ivf_range_stats_delta)."""
    out = {
        "lo": base["lo"], "hi": base["hi"],
        "n_buckets": base["n_buckets"],
        "lists": {k: dict(v, buckets=dict(v["buckets"]))
                  for k, v in base["lists"].items()},
    }
    for li, d in delta["lists"].items():
        t = out["lists"].setdefault(
            li, {"n": 0, "min": float("inf"), "max": float("-inf"), "buckets": {}}
        )
        t["n"] += d["n"]
        t["min"] = min(t["min"], d["min"])
        t["max"] = max(t["max"], d["max"])
        for bk, n in d["buckets"].items():
            t["buckets"][bk] = t["buckets"].get(bk, 0) + n
    return out


def _range_stats_delta(
    assigned: DataFrame, range_col: str, base: dict, list_col: str = "_list"
) -> dict:
    """Range stats of an APPEND batch against the sidecar's FROZEN
    bucket edges (one group-by over the batch)."""
    lo, hi, nb = base["lo"], base["hi"], base["n_buckets"]
    width = (hi - lo) / nb or 1.0
    c = F.col(range_col).cast("double")
    src = assigned.where(c.isNotNull())
    b = F.least(
        F.lit(nb - 1), F.greatest(F.lit(0), F.floor((c - lo) / width).cast("int"))
    )
    rows = (
        src.groupBy(F.col(list_col).alias("_li"), b.alias("_b"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(c).alias("_mn"),
            F.max(c).alias("_mx"),
        )
        .collect()
    )
    lists: dict = {}
    for r in rows:
        d = lists.setdefault(
            str(int(r["_li"])),
            {"n": 0, "min": float("inf"), "max": float("-inf"), "buckets": {}},
        )
        d["n"] += int(r["_n"])
        d["min"] = min(d["min"], float(r["_mn"]))
        d["max"] = max(d["max"], float(r["_mx"]))
        d["buckets"][str(int(r["_b"]))] = (
            d["buckets"].get(str(int(r["_b"])), 0) + int(r["_n"])
        )
    return {"lo": lo, "hi": hi, "n_buckets": nb, "lists": lists}


def _range_to_double(v) -> float:
    """Query-range endpoint -> the sidecar's double domain (matches
    CAST(col AS double): datetimes fold to epoch seconds of the same
    INSTANT the scan predicate will use).

    The folding must agree with how ``F.lit(v)`` converts the SAME
    endpoint for the pushed BETWEEN predicate, or sidecar pruning and
    the actual scan disagree and extent pruning silently drops lists
    that contain matches (ADVICE r12). PySpark's TimestampType
    literal conversion interprets a NAIVE datetime in the DRIVER'S
    LOCAL timezone (``time.mktime``) and a tz-aware one exactly —
    which is precisely ``datetime.timestamp()`` in both cases, so
    delegate to it instead of assuming UTC for naive values."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v.timestamp()
    return float(v)


def _range_estimate(stats: dict, lo_d: float, hi_d: float) -> dict:
    """Per-list match-count estimates for [lo_d, hi_d] from the
    bucket histogram, with the exact min/max overlap test deciding
    which lists are POSSIBLE at all. Returns {list_int: est}."""
    width = (stats["hi"] - stats["lo"]) / stats["n_buckets"] or 1.0
    out: dict = {}
    for li, d in stats["lists"].items():
        if d["n"] == 0 or d["max"] < lo_d or d["min"] > hi_d:
            continue  # provably no matches
        est = 0.0
        for bk, n in d["buckets"].items():
            b = int(bk)
            b_lo = stats["lo"] + b * width
            b_hi = b_lo + width
            # edge buckets absorb clamped appends: widen to the
            # list's exact extent so the estimate stays a cover
            if b == 0:
                b_lo = min(b_lo, d["min"])
            if b == stats["n_buckets"] - 1:
                b_hi = max(b_hi, d["max"])
            ov = min(hi_d, b_hi) - max(lo_d, b_lo)
            if ov <= 0:
                continue
            est += n * min(1.0, ov / (b_hi - b_lo or 1.0))
        out[int(li)] = est
    return out


def _hist_triples(hist: dict) -> list:
    """{value: {list: n}} -> JSON-safe [[value, list, n], ...]."""
    return [[v, li, n] for v, d in hist.items() for li, n in d.items()]


def _hist_from_triples(triples: list) -> dict:
    out: dict = {}
    for v, li, n in triples:
        out.setdefault(v, {})[int(li)] = int(n)
    return out


def _ann_recover(index_dir: str) -> bool:
    """Heal a crash inside :func:`ivf_pq_maintain_index`'s directory
    swap (rename index_dir -> _old_{t}; rename _rebuild_{t} ->
    index_dir; rmtree _old_{t}): a crash between the two renames
    leaves NOTHING at index_dir, with the previous index intact under
    the _old_ sibling and the complete rebuild under the _rebuild_
    sibling. Promote the completed rebuild if one exists (its sidecar
    is written last, atomically — presence means complete), else
    restore the old index; then sweep superseded siblings. No-op (and
    zero-cost) while index_dir exists. Returns True when a recovery
    happened."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    base = index_dir.rstrip("/")
    if _os.path.isdir(base):
        return False
    candidates = sorted(_glob.glob(base + "_rebuild_*")) + sorted(
        _glob.glob(base + "_old_*")
    )
    for c in candidates:
        if _os.path.isfile(_os.path.join(c, "_ann_meta.json")):
            try:
                _os.rename(c, base)
            except OSError:
                if not _os.path.isdir(base):
                    raise
            break
    else:
        return False
    for leftover in _glob.glob(base + "_rebuild_*") + _glob.glob(
        base + "_old_*"
    ):
        _shutil.rmtree(leftover, ignore_errors=True)
    return True


def _open_ann_meta(index_dir: str) -> dict:
    """Load an index sidecar, healing an interrupted maintenance swap
    first when the index directory is missing (see _ann_recover)."""
    import json as _json
    import os as _os

    p = _os.path.join(index_dir, "_ann_meta.json")
    try:
        with open(p) as f:
            return _json.load(f)
    except FileNotFoundError:
        if _ann_recover(index_dir):
            with open(p) as f:
                return _json.load(f)
        raise


def _ann_reserve(index_dir: str, meta: dict) -> None:
    """CAS-claim the ANN index for one mutation BEFORE its first data
    write — the lineage manifest discipline, shared with the text
    indexes (see operators/_idxmeta.py). Two concurrent maintainers
    (a stream upsert racing a compaction, two appenders) no longer
    last-meta-win silently: the loser aborts with
    ``IndexConcurrentWriteError`` with nothing published."""
    from ._idxmeta import reserve_meta

    reserve_meta(index_dir, meta, meta_name="_ann_meta.json")


def _ann_abandon(index_dir: str, meta: dict) -> None:
    from ._idxmeta import abandon_meta

    abandon_meta(index_dir, meta, meta_name="_ann_meta.json")


def _ann_publish(index_dir: str, meta: dict, heal: bool = False) -> None:
    """Publish the ANN sidecar via compare-and-swap (lease must still
    be ours; cleared in the same atomic rename). ``heal=True`` for
    the repair paths, which own torn states by definition."""
    from ._idxmeta import publish_meta

    publish_meta(index_dir, meta, meta_name="_ann_meta.json", heal=heal)


_GEN_INF = 2**62  # pre-r14 tombstones had no _upto: they kill ALL
# generations (the old id-equality semantics), which this sentinel
# reproduces exactly


def _refresh_ann_markers(index_dir: str, meta: dict) -> None:
    """Record footer row counts of the data partitions and tombstone
    table — the text indexes' consistency-marker discipline
    (textsearch._refresh_markers): called at the end of every
    mutation so :func:`ivf_pq_index_repair` can detect a crash
    between any parquet write and the sidecar rewrite from metadata
    alone."""
    import os as _os

    from .textsearch import _parquet_rows

    meta["data_rows"] = _ann_footer_rows(index_dir)
    meta["tomb_rows"] = _parquet_rows(_os.path.join(index_dir, "_tombstones"))


def _ann_tombstones(spark, index_dir: str):
    """The ANN index's tombstone table ``(id, _upto)`` — a row kills
    the id's generations ``_gen <= _upto`` — or None when the index
    has no deletes. Lives at ``<index_dir>/_tombstones`` (the
    underscore prefix keeps it invisible to
    ``spark.read.parquet(index_dir)``). Read with schema merge so a
    dir holding pre-r14 rows (no ``_upto`` column) stays readable;
    their null ``_upto`` folds to kill-all, the old semantics."""
    import os as _os

    path = _os.path.join(index_dir, "_tombstones")
    if not _os.path.isdir(path):
        return None
    tomb = spark.read.option("mergeSchema", "true").parquet(path)
    if "_upto" not in tomb.columns:
        tomb = tomb.withColumn("_upto", F.lit(_GEN_INF))
    return tomb.withColumn(
        "_upto", F.coalesce(F.col("_upto"), F.lit(_GEN_INF))
    )


def _ann_live(spark, index_dir: str, meta: dict) -> DataFrame:
    """The index's LIVE rows: the partitioned parquet anti-joined
    against the tombstone table (small by the compaction contract, so
    it broadcasts) on id equality BOUNDED by write generation
    (``_gen <= _upto``) — so a delete-then-append of the same id
    keeps the re-indexed row live while every earlier generation
    stays dead (the trigram/BM25 reconciliation, round 14). Every
    query operator reads through this, so a deleted vector can never
    be scored, ranked, or fused — whatever branch (prefilter / probe
    / ADC / exact refine) runs downstream. Partition pruning
    survives: ``_list`` filters apply to the scan side below the
    anti-join."""
    idx = spark.read.parquet(index_dir)
    if "_gen" not in idx.columns:  # pre-r14 index layout
        idx = idx.withColumn("_gen", F.lit(0))
    tomb = _ann_tombstones(spark, index_dir)
    if tomb is None:
        return idx
    idc = meta["id_col"]
    dead_id = [c for c in tomb.columns if c not in ("_upto", "_slot")][0]
    return idx.join(
        F.broadcast(tomb.select(F.col(dead_id).alias("_dead_id"), "_upto")),
        on=(F.col(idc) == F.col("_dead_id"))
        & (F.col("_gen") <= F.col("_upto")),
        how="left_anti",
    )


def ann_index_asof_marker(index_dir: str) -> dict:
    """Capture the ANN index's position on its mutation timeline —
    the handle :func:`ivf_pq_topk_from_index` ``as_of=`` replays
    (textsearch.index_asof_marker for the vector index; reference
    parity: select_version, reference lstore/query.py:125). Every
    mutation consumes one slot: appends take the ``_gen`` they stamp,
    deletes (r14) take a slot recorded as ``_slot`` on their
    tombstones. ``epoch`` counts compactions — markers from before
    the last compaction address swept history and raise
    :class:`~.textsearch.IndexHistoryTruncatedError` when replayed.
    Metadata-plane only."""
    meta = _open_ann_meta(index_dir)
    n = int(meta.get("n_batches", 1))
    return {"epoch": int(meta.get("epoch", 0)), "batch": n - 1}


def _ann_asof(spark, index_dir: str, meta: dict, as_of: dict) -> DataFrame:
    """The index rows AS OF a marker: generations written after the
    marker's slot are filtered out, and only tombstones whose
    mutation slot is <= the marker apply — a later delete cannot
    reach back, a doc dead at the marker stays dead. Legacy
    tombstones (pre-``_slot``) predate the feature and therefore any
    marker: they always apply. Partition pruning survives exactly as
    in :func:`_ann_live` (the ``_gen``/anti-join sit above the
    ``_list`` scan filter)."""
    from .textsearch import _validate_asof

    upto = _validate_asof(
        {"epoch": meta.get("epoch", 0), "n_batches": meta.get("n_batches", 1)},
        as_of,
    )
    idx = spark.read.parquet(index_dir)
    if "_gen" not in idx.columns:  # pre-r14 index layout
        idx = idx.withColumn("_gen", F.lit(0))
    idx = idx.where(F.col("_gen") <= F.lit(upto))
    tomb = _ann_tombstones(spark, index_dir)
    if tomb is None:
        return idx
    if "_slot" in tomb.columns:
        # null _slot = legacy kill-all row: applied to every marker
        tomb = tomb.where(
            F.coalesce(F.col("_slot"), F.lit(-1)) <= F.lit(upto)
        )
    idc = meta["id_col"]
    dead_id = [c for c in tomb.columns if c not in ("_upto", "_slot")][0]
    return idx.join(
        F.broadcast(tomb.select(F.col(dead_id).alias("_dead_id"), "_upto")),
        on=(F.col(idc) == F.col("_dead_id"))
        & (F.col("_gen") <= F.col("_upto")),
        how="left_anti",
    )


def ivf_pq_delete_from_index(ids: DataFrame, index_dir: str) -> int:
    """Delete vectors from the durable ANN index WITHOUT rewriting
    list partitions: append the matched LIVE ids to the tombstone
    table — the trigram/BM25 discipline (textsearch.py) applied to
    the vector index, completing delete support across all three
    durable retrieval indexes. Every query path reads through
    :func:`_ann_live`, so correctness is immediate; the physical
    bytes leave at :func:`ivf_pq_compact_index` once the dead
    fraction crosses its threshold.

    Counters move by the matched live count (unknown / repeated
    deletes are a counted no-op). The tombstone FILE is the
    correctness truth — a crash between the tombstone append and the
    ``n_dead`` meta rewrite only delays the compaction trigger, it
    cannot resurrect a deleted row. The filter/range sidecars keep
    the dead rows' counts until compaction: they are upper-bound
    COVERS, so histogram-driven pruning stays provable and estimates
    only over-provision probes (recall-safe, never correctness).

    Tombstones are GENERATION-BOUNDED (round 14, the trigram/BM25
    discipline): a row kills the id's generations ``_gen <= _upto``
    only, so :func:`ivf_pq_update_index`'s delete-then-append leaves
    exactly the re-indexed generation live — same-id updates no
    longer require a compaction first. A direct same-id re-append
    WITHOUT a prior delete still double-indexes (the Parquet-append
    contract: dedup upstream or route through update). Returns the
    number of vectors actually deleted."""
    import os as _os

    spark = ids.sparkSession
    meta = _open_ann_meta(index_dir)
    _ann_reserve(index_dir, meta)
    idc = meta["id_col"]
    live = _ann_live(spark, index_dir, meta).select(idc)
    matched = (
        live.join(
            F.broadcast(ids.select(F.col(ids.columns[0]).alias(idc))), on=idc
        )
        .distinct()
        .localCheckpoint(eager=True)  # the write below appends into
        # the _tombstones dir this frame's lineage reads
    )
    n = matched.count()
    if n == 0:
        _ann_abandon(index_dir, meta)
        return 0
    # the delete consumes its own mutation SLOT (r14, the BM25
    # discipline): _upto still kills every landed generation, _slot
    # records WHEN — so an as-of marker orders deletes against
    # appends exactly, and n_batches advances so the next marker
    # differs from the pre-delete one
    slot = int(meta.get("n_batches", 1))
    matched.select(
        F.col(idc),
        F.lit(slot - 1).alias("_upto"),
        F.lit(slot).alias("_slot"),
    ).coalesce(1).write.mode("append").parquet(
        _os.path.join(index_dir, "_tombstones")
    )
    meta["n_batches"] = slot + 1
    meta["n_dead"] = int(meta.get("n_dead", 0)) + n
    _refresh_ann_markers(index_dir, meta)
    _ann_publish(index_dir, meta)
    return n


def ivf_pq_update_index(
    df: DataFrame,
    index_dir: str,
) -> int:
    """Re-index CHANGED vectors in the durable ANN index: tombstone
    their prior generations (so the stale embeddings stop being
    scored) and append the new vectors as a fresh generation under
    the FROZEN centroids/codebooks — O(changed rows), never a corpus
    re-encode. The upsert primitive behind
    :func:`ivf_pq_apply_stream_batch`; ids new to the index simply
    insert (the delete half is a counted no-op). Returns the number
    of vectors whose prior generation was tombstoned."""
    n = ivf_pq_delete_from_index(
        df.select(_open_ann_meta(index_dir)["id_col"]), index_dir
    )
    ivf_pq_append_index(df, index_dir)
    return n


def ivf_pq_index_dead_fraction(spark, index_dir: str) -> dict:
    """Tombstone pressure: dead vs total rows, both metadata-plane
    (tombstone footers / index footers — no vector bytes)."""
    total = _ann_footer_rows(index_dir)
    tomb = _ann_tombstones(spark, index_dir)
    dead = tomb.count() if tomb is not None else 0
    return {
        "rows": total,
        "n_dead": int(dead),
        "dead_fraction": (dead / total) if total else 0.0,
    }


def ivf_pq_compact_index(
    spark,
    index_dir: str,
    tombstone_fraction: float = 0.2,
    force: bool = False,
) -> dict:
    """Sweep tombstoned vectors once their fraction crosses the
    threshold: rewrite the LIVE rows into a fresh list-partitioned
    layout under the SAME frozen centroids/codebooks (compaction is
    physical removal, never a retrain — drift is the separate
    :func:`ivf_pq_maintain_index` trigger), re-derive the
    filter/range sidecars from the survivors (their dead counts drop
    out, so strategy estimates are honest again), refresh
    ``hist_rows`` to the new footer count, and swap directories with
    the rename-rename-rmtree dance :func:`_ann_recover` already
    heals. Below threshold this is a zero-data-job metadata check —
    the maintain-cadence shape shared with the text indexes."""
    import json as _json
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    _ann_recover(index_dir)
    rep = ivf_pq_index_dead_fraction(spark, index_dir)
    if not force and rep["dead_fraction"] < tombstone_fraction:
        return {**rep, "compacted": False}
    meta = _open_ann_meta(index_dir)
    _ann_reserve(index_dir, meta)  # racing upsert/delete aborts cleanly
    live = _ann_live(spark, index_dir, meta)
    token = _uuid.uuid4().hex[:8]
    fresh = f"{index_dir.rstrip('/')}_rebuild_{token}"
    _os.makedirs(fresh, exist_ok=True)
    live.withColumn("_gen", F.lit(0)).write.mode("overwrite").partitionBy(
        "_list"
    ).parquet(fresh)
    new_meta = dict(meta)
    new_meta["n_batches"] = 1  # generations reset with the tombstones
    # history is physically gone: bump the epoch so pre-compaction
    # as-of markers raise instead of re-aiming at the collapsed gen 0
    new_meta["epoch"] = int(new_meta.get("epoch", 0)) + 1
    # the swap IS the publish: carry the reserved commit_seq forward
    # (so a stale snapshot can't CAS past the rebuild) and clear the
    # lease in the same directory rename
    new_meta.pop("_pending", None)
    new_meta["commit_seq"] = int(new_meta.get("commit_seq", 0)) + 1
    new_meta["n_dead"] = 0
    idx2 = spark.read.parquet(fresh)
    for c in list(new_meta.get("filter_hist") or {}):
        new_meta["filter_hist"][c] = _hist_triples(ivf_filter_histogram(idx2, c))
    for c in list(new_meta.get("range_stats") or {}):
        new_meta["range_stats"][c] = ivf_range_stats(idx2, c)
    if new_meta.get("filter_hist") or new_meta.get("range_stats"):
        new_meta["hist_rows"] = _ann_footer_rows(fresh)
    _refresh_ann_markers(fresh, new_meta)
    with open(_os.path.join(fresh, "_ann_meta.json"), "w") as f:
        _json.dump(new_meta, f)
    old = f"{index_dir.rstrip('/')}_old_{token}"
    _os.rename(index_dir, old)
    _os.rename(fresh, index_dir)
    _shutil.rmtree(old, ignore_errors=True)
    return {**rep, "compacted": True}


def _ann_footer_rows(index_dir: str) -> int:
    """Exact index row count from parquet FILE FOOTERS (no Spark job,
    no vector bytes — the LIST + footer pass any engine pays to plan
    a scan over the index). Walks the partition tree explicitly: the
    partition dirs are ``_list=N``, which pyarrow's default dataset
    discovery would IGNORE as underscore-prefixed (it returned 0 for
    every index — caught by the r13 delete tests); sidecars and the
    ``_tombstones`` subtree are skipped."""
    import os as _os

    import pyarrow.parquet as _pq

    total = 0
    for root, dirs, files in _os.walk(index_dir):
        dirs[:] = [
            d
            for d in dirs
            if d.startswith("_list=") or not d.startswith(("_", "."))
        ]
        for fn in files:
            if fn.endswith(".parquet"):
                total += _pq.read_metadata(_os.path.join(root, fn)).num_rows
    return int(total)


def _verified_meta(spark, index_dir: str, meta: dict) -> dict:
    """Return a sidecar whose ``hist_rows`` marker MATCHES the index
    footers, healing a torn append first if it doesn't
    (:func:`ivf_filter_histogram_repair`). The range/composite
    filtered operators prune list partitions from sidecar
    extents/counts even on their PREFILTER (exact-claiming) branch,
    so unlike the categorical operator — whose prefilter scans every
    list — they may NOT trust a sidecar that lags the data: appended
    rows outside a list's stale extent would be silently missed while
    info still reports 'prefilter' (ADVICE r12). The check itself is
    metadata-plane; the repair aggregate runs only when the marker
    actually lies (a crash window, not a steady state)."""
    if not meta.get("filter_hist") and not meta.get("range_stats"):
        return meta
    if int(meta.get("hist_rows", -1)) == _ann_footer_rows(index_dir):
        return meta
    ivf_filter_histogram_repair(spark, index_dir)
    return _open_ann_meta(index_dir)


def ivf_pq_append_index(
    df: DataFrame,
    index_dir: str,
) -> int:
    """Grow a persisted ANN index INCREMENTALLY: assign + PQ-encode
    only the NEW vectors under the index's FROZEN centroids/codebooks
    and append them into the same list-partitioned layout — work is
    O(new rows), never a corpus re-encode (at 100 TB the corpus grows
    daily; rebuilding the index per batch is the naive path this
    replaces). Returns the number of appended vectors.

    The append is exactly as query-able as a rebuild: probes
    partition-prune identically (appended files land in their list's
    partition dir) and ADC/exact-refine read the same schema. Frozen
    codebooks mean quantization quality for new data drifts with the
    data distribution — re-train + rebuild on a schedule (the FAISS
    operational recipe); the recall gates in the registry hold because
    assignment/encoding are deterministic functions of the sidecar.

    New ids are NOT checked against existing ids (same as any Parquet
    append); dedup upstream if re-ingest is possible.

    Filter-histogram consistency: the data-parquet append and the
    sidecar histogram fold are two writes, not one atomic commit. A
    crash BETWEEN them leaves the sidecar undercounting the appended
    rows. For the CATEGORICAL operator that is a recall-only hazard
    (its prefilter branch scans every list with the predicate pushed,
    so it stays exact either way); the RANGE/COMPOSITE operators
    prune list partitions from sidecar extents even on their
    exact-claiming prefilter branch, so they verify the marker
    against the index footers per query and heal first
    (:func:`_verified_meta` — ADVICE r12). The sidecar carries a
    ``hist_rows`` marker updated in the same atomic rename as the
    histograms, so the torn state is DETECTABLE by comparing it with
    the index's footer row count — :func:`ivf_filter_histogram_repair`
    does exactly that and re-derives the histograms from the stored
    filter columns when they disagree. A replayed whole-batch append
    duplicates data and histogram counts TOGETHER (marker still
    matches) — that is the upstream-dedup caveat above, not a torn
    sidecar."""
    meta = _open_ann_meta(index_dir)
    _ann_reserve(index_dir, meta)
    vec_col = meta["vec_col"]
    assigned = ivf_assign(df, meta["centroids"], vec_col=vec_col)
    if meta.get("residual"):
        src = ivf_residuals(assigned, meta["centroids"], vec_col=vec_col)
        prepared = pq_encode(src, meta["codebooks"], vec_col="_res").drop("_res")
    else:
        prepared = pq_encode(assigned, meta["codebooks"], vec_col=vec_col)
    gen = int(meta.get("n_batches", 1))  # pre-r14 sidecars: base is 0
    # Assign + PQ-encode ONCE (r14 optimization): count, the
    # partitioned write, and every sidecar aggregate below re-read the
    # persisted O(batch) encoded frame instead of re-running the two
    # ArrowEvalPython kernels (centroid assign, code encode) per
    # consumer — the old tree ran them 2x plus once per filter/range
    # column. `prepared` retains assigned's columns, so the histogram
    # and range-stat deltas aggregate over it identically.
    prepared = prepared.withColumn("_gen", F.lit(gen)).persist()
    try:
        n = prepared.count()
        prepared.write.mode("append").partitionBy("_list").parquet(index_dir)
        meta["n_batches"] = gen + 1
        if meta.get("filter_hist"):
            # histograms are additive over disjoint batches: fold the
            # APPENDED rows' counts (O(batch) aggregates) into the sidecar
            for c, triples in meta["filter_hist"].items():
                hist = _hist_from_triples(triples)
                for v, d in ivf_filter_histogram(prepared, c).items():
                    slot = hist.setdefault(v, {})
                    for li, cnt in d.items():
                        slot[li] = slot.get(li, 0) + cnt
                meta["filter_hist"][c] = _hist_triples(hist)
        if meta.get("range_stats"):
            # min/max merge + frozen-edge bucket adds: exact pruning
            # bounds and additive estimates under any append sequence
            for c, base in meta["range_stats"].items():
                meta["range_stats"][c] = _merge_range_stats(
                    base, _range_stats_delta(prepared, c, base)
                )
    finally:
        prepared.unpersist()
    if meta.get("filter_hist") or meta.get("range_stats"):
        meta["hist_rows"] = int(meta.get("hist_rows", 0)) + n
    _refresh_ann_markers(index_dir, meta)
    _ann_publish(index_dir, meta)
    return n


def ivf_filter_histogram_repair(spark, index_dir: str) -> dict:
    """Detect and heal a torn filter sidecar (a crash between
    :func:`ivf_pq_append_index`'s data append and its meta rewrite).
    Check is metadata-plane: ``count()`` over the index parquet is
    answered from file footers (no vector bytes read) and compared
    against the sidecar's ``hist_rows`` marker. On mismatch the
    per-(list, value) histograms AND the range stats (same crash
    window tears both) are re-aggregated from the columns STORED in
    the index partitions (one bounded aggregate per column — the
    rebuild-of-last-resort, run only when the cheap marker says the
    sidecar lies) and the sidecar is atomically rewritten. Returns
    ``{"checked": rows, "hist_rows": marker, "repaired": bool}``."""
    meta = _open_ann_meta(index_dir)
    if not meta.get("filter_hist") and not meta.get("range_stats"):
        return {"checked": 0, "hist_rows": 0, "repaired": False}
    actual = spark.read.parquet(index_dir).count()
    marker = int(meta.get("hist_rows", -1))
    if marker == actual:
        return {"checked": actual, "hist_rows": marker, "repaired": False}
    idx = spark.read.parquet(index_dir)
    for c in list(meta.get("filter_hist") or {}):
        meta["filter_hist"][c] = _hist_triples(ivf_filter_histogram(idx, c))
    for c in list(meta.get("range_stats") or {}):
        meta["range_stats"][c] = ivf_range_stats(idx, c)
    meta["hist_rows"] = int(actual)
    _ann_publish(index_dir, meta, heal=True)
    return {"checked": actual, "hist_rows": marker, "repaired": True}


def ivf_pq_index_repair(spark, index_dir: str) -> dict:
    """Detect and heal a torn ANN sidecar — the trigram/BM25 repair
    discipline (textsearch.trigram_index_repair) for the vector
    index, and the convergence backstop behind
    :func:`ivf_pq_apply_stream_batch`'s dirty replays.

    Detection is metadata-plane: every mutation records the footer
    row counts of the data partitions and the tombstone table in the
    sidecar (:func:`_refresh_ann_markers`); mismatch means a crash
    landed parquet without its counters. Repair re-derives what the
    sidecar claims from storage: the filter/range histograms through
    :func:`ivf_filter_histogram_repair` (its own ``hist_rows`` marker
    gates the expensive re-aggregate), ``n_batches`` from
    ``max(_gen) + 1`` over the data — the critical one: a replayed
    upsert tombstones at ``n_batches - 1``, so the counter must clear
    EVERY landed generation including a crashed attempt's orphans —
    and ``n_dead`` from the tombstones' distinct ids. Idempotent; on
    the tools/maintain.py cadence."""
    import os as _os

    from .textsearch import _parquet_rows

    _ann_recover(index_dir)
    meta = _open_ann_meta(index_dir)
    actual = {
        "data_rows": _ann_footer_rows(index_dir),
        "tomb_rows": _parquet_rows(_os.path.join(index_dir, "_tombstones")),
    }
    recorded = {k: int(meta.get(k, -1)) for k in actual}
    if recorded == actual:
        return {"repaired": False, **actual}
    ivf_filter_histogram_repair(spark, index_dir)
    meta = _open_ann_meta(index_dir)
    idx = spark.read.parquet(index_dir)
    if "_gen" in idx.columns:
        mx = idx.agg(F.max("_gen")).first()[0]
    else:  # pre-r14 layout: single generation
        mx = 0
    meta["n_batches"] = int(mx) + 1 if mx is not None else 1
    tomb = _ann_tombstones(spark, index_dir)
    if tomb is not None:
        dead_id = [c for c in tomb.columns if c not in ("_upto", "_slot")][0]
        meta["n_dead"] = int(tomb.select(dead_id).distinct().count())
        # deletes consume mutation slots (r14): a re-derived
        # n_batches must clear every CONSUMED slot, not just every
        # landed data generation, or as-of ordering corrupts and the
        # next delete reuses a taken slot
        if "_slot" in tomb.columns:
            mx_t = tomb.agg(F.max("_slot")).first()[0]
            if mx_t is not None:
                meta["n_batches"] = max(meta["n_batches"], int(mx_t) + 1)
    else:
        meta["n_dead"] = 0
    _refresh_ann_markers(index_dir, meta)
    _ann_publish(index_dir, meta, heal=True)
    return {"repaired": True, **{k: meta[k] for k in actual}}


def ivf_pq_apply_stream_batch(
    index_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    stream_id: str = "default",
) -> bool:
    """Micro-batch UPSERT into the durable ANN index with replay
    convergence — the vector twin of
    ``textsearch.bm25_index_apply_stream_batch`` (VERDICT r13
    What's-missing #1: BM25/trigram had the exactly-once stream
    discipline, ANN had the parts but not the composition). Shares
    the reserve-marker -> update-semantics apply -> complete-marker
    protocol (``textsearch._index_apply_stream_batch``) against the
    ``_ann_meta.json`` sidecar, with :func:`ivf_pq_index_repair`
    run on dirty replays so counters match whatever parquet landed —
    however many attempts crashed, exactly one live generation of
    each batch id survives (the generation-bounded tombstones make
    re-applies idempotent).

    The index must already exist (:func:`ivf_pq_write_index` trains
    the quantizers on a seed corpus; a stream cannot — frozen
    codebooks are the FAISS operational recipe, with drift handled
    by :func:`ivf_pq_maintain_index` on its own cadence). Batch rows
    must carry the sidecar's id and vector columns. Returns True iff
    THIS call applied the batch."""
    import os as _os

    from .textsearch import _index_apply_stream_batch

    if not _os.path.isfile(_os.path.join(index_dir, "_ann_meta.json")):
        if not _ann_recover(index_dir):
            raise FileNotFoundError(
                f"no ANN index at {index_dir!r}: build one with "
                "ivf_pq_write_index over a seed corpus first (a stream "
                "cannot train the quantizers)"
            )
    spark = batch_df.sparkSession
    return _index_apply_stream_batch(
        index_dir,
        batch_id,
        stream_id,
        update_fn=lambda: ivf_pq_update_index(batch_df, index_dir),
        repair_fn=lambda: ivf_pq_index_repair(spark, index_dir),
        meta_name="_ann_meta.json",
    )


def _ivf_health(res_df: DataFrame, list_col: str = "_list") -> dict:
    """List-balance + assignment-error stats from a frame carrying
    ``_res`` (vector minus its ASSIGNED list's centroid) — ONE
    n_lists-row aggregate, pure Catalyst (the residual norm is an
    F.aggregate fold, no Python). skew = max list size / mean list
    size; assign_err = mean squared residual norm."""
    err = F.aggregate(
        "_res", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    rows = (
        res_df.groupBy(F.col(list_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(err).alias("e"))
        .collect()
    )
    sizes = [r["n"] for r in rows]
    total = sum(sizes)
    return {
        "rows": int(total),
        "n_lists_used": len(sizes),
        "skew": float(max(sizes) / (total / len(sizes))) if sizes else 0.0,
        "assign_err": float(sum(r["e"] for r in rows) / total) if total else 0.0,
    }


def ivf_pq_recall_probe(
    spark,
    index_dir: str,
    k: int = 10,
    nprobe: int = 4,
    n_queries: int = 8,
    n_candidates: int = 200,
) -> float:
    """Measured recall@k of a persisted index against ITSELF: sample
    ``n_queries`` of the index's own vectors (hash-spread, so appended
    regions are represented proportionally), take exact cosine top-k
    over the index's rows as truth, and compare the index's answer.
    This is the trigger of last resort for drift the cheap statistics
    can't see — r10 proved residual-norm/skew triggers stay silent
    under distribution-PRESERVING changes, and the same blindness
    applies when drift concentrates on centroid boundaries (neighbor
    sets split across more lists than nprobe reads, recall drops,
    mean residual barely moves). Cost: n_queries exact scans of the
    index — a sampled, scheduled health check, not a per-query path;
    at 100 TB run it on an index sample or a fixed witness set."""
    meta = _open_ann_meta(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    idx = _ann_live(spark, index_dir, meta).select(id_col, vec_col)
    picks = (
        idx.orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit("probe")))
        .limit(n_queries)
        .collect()
    )
    if not picks:
        return 1.0
    total = 0.0
    for r in picks:
        q = [float(x) for x in r[vec_col]]
        truth = {
            t[id_col]
            for t in brute_force_topk(
                idx, q, k=k, id_col=id_col, vec_col=vec_col
            ).collect()
        }
        got = {
            t[id_col]
            for t in ivf_pq_topk_from_index(
                spark, index_dir, q, k=k, nprobe=nprobe,
                n_candidates=n_candidates,
            ).collect()
        }
        total += len(truth & got) / max(len(truth), 1)
    return total / len(picks)


def ivf_pq_index_staleness(
    spark,
    index_dir: str,
    skew_factor: float = 3.0,
    err_factor: float = 2.0,
    recall_probe: int = 0,
    recall_floor: float = 0.5,
    recall_k: int = 10,
    recall_nprobe: int = 4,
) -> dict:
    """Drift trigger for a persisted ANN index (the FAISS operational
    recipe made checkable; analogous to indexing.index_staleness for
    secondary indexes): appends encode under FROZEN centroids and
    codebooks, so as the data distribution drifts the inverted lists
    skew (hot lists absorb the new mass) and the mean assignment
    error grows — both directly predict recall decay. Compares the
    index's CURRENT per-list balance and assignment error against the
    birth-time stats in the sidecar and flags ``stale`` when either
    degrades past its factor. One n_lists-row aggregate over the
    index — never touches the source corpus.

    ``recall_probe > 0`` adds the measured second trigger (r10 catch:
    statistics triggers are blind to drift that hurts recall without
    moving mean residual or list balance): sample that many index
    vectors as queries via :func:`ivf_pq_recall_probe` and flag stale
    when recall@recall_k at recall_nprobe falls below
    ``recall_floor``. Opt-in because it costs recall_probe exact index
    scans (vs the statistics' single aggregate)."""
    meta = _open_ann_meta(index_dir)
    idx = _ann_live(spark, index_dir, meta)  # dead rows carry no health signal
    cur = _ivf_health(
        ivf_residuals(idx, meta["centroids"], vec_col=meta["vec_col"])
    )
    build = meta.get("build_stats") or {}
    b_skew = max(build.get("skew", 1.0), 1.0)
    b_err = build.get("assign_err", 0.0)
    skew_ratio = cur["skew"] / b_skew
    err_ratio = (cur["assign_err"] / b_err) if b_err else 1.0
    out = {
        **cur,
        "build_skew": b_skew,
        "build_assign_err": b_err,
        "skew_ratio": skew_ratio,
        "err_ratio": err_ratio,
        "stale": bool(skew_ratio > skew_factor or err_ratio > err_factor),
    }
    if recall_probe > 0:
        rec = ivf_pq_recall_probe(
            spark, index_dir, k=recall_k, nprobe=recall_nprobe,
            n_queries=recall_probe,
        )
        out["recall"] = rec
        out["stale"] = bool(out["stale"] or rec < recall_floor)
    return out


def ivf_pq_maintain_index(
    spark,
    index_dir: str,
    skew_factor: float = 3.0,
    err_factor: float = 2.0,
    recall_probe: int = 0,
    recall_floor: float = 0.5,
    recall_k: int = 10,
    recall_nprobe: int = 4,
    **train_opts,
) -> dict:
    """Retrain-and-rebuild a drifted ANN index in place: when
    :func:`ivf_pq_index_staleness` flags it, re-read the index's own
    (id, vector) rows — raw vectors ride in every partition, so no
    source-corpus access is needed — retrain centroids + codebooks at
    the sidecar's parameters (``train_opts`` forwards e.g.
    ``residual=True``), write the rebuild beside the index, and swap
    directories (rename-rename-rmtree, the vacuum_tail dance). A crash
    BETWEEN the two renames leaves index_dir momentarily absent with
    both complete siblings on disk — every index entry point heals
    that on its next open via :func:`_ann_recover` (promote the
    completed rebuild, else restore the old index), so readers always
    resolve to a complete index, never a torn one; a concurrent read
    landing exactly inside the swap window may see path-not-found
    once and succeeds on retry. Work is one corpus re-encode — the
    operation the staleness gate exists to run RARELY. Returns the
    staleness report plus ``rebuilt``."""
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    _ann_recover(index_dir)
    rep = ivf_pq_index_staleness(
        spark, index_dir, skew_factor, err_factor,
        recall_probe=recall_probe, recall_floor=recall_floor,
        recall_k=recall_k, recall_nprobe=recall_nprobe,
    )
    if not rep["stale"]:
        return {**rep, "rebuilt": False}
    meta = _open_ann_meta(index_dir)
    _ann_reserve(index_dir, meta)  # racing upsert/delete aborts cleanly
    fcols = list(meta.get("filter_hist") or {})
    rcols = [c for c in (meta.get("range_stats") or {}) if c not in fcols]
    # LIVE rows only: a rebuild must never resurrect tombstoned
    # vectors (the fresh index needs no tombstones at all)
    vecs = _ann_live(spark, index_dir, meta).select(
        meta["id_col"], meta["vec_col"], *fcols, *rcols
    )
    token = _uuid.uuid4().hex[:8]
    fresh = f"{index_dir.rstrip('/')}_rebuild_{token}"
    kw = dict(
        n_lists=meta.get("n_lists", 16),
        m=meta.get("m", 4),
        nbits=meta.get("nbits", 4),
        id_col=meta["id_col"],
        vec_col=meta["vec_col"],
        residual=meta.get("residual", False),
        filter_cols=fcols,
        range_cols=list(meta.get("range_stats") or {}),
    )
    kw.update(train_opts)
    ivf_pq_write_index(vecs, fresh, **kw)
    # the swap IS the publish: stamp the rebuilt sidecar with the
    # reserved commit_seq so a stale snapshot can't CAS past it
    import json as _json

    fm_path = _os.path.join(fresh, "_ann_meta.json")
    with open(fm_path) as f:
        fm = _json.load(f)
    fm["commit_seq"] = int(meta.get("commit_seq", 0)) + 1
    with open(fm_path + ".tmp", "w") as f:
        _json.dump(fm, f)
    _os.replace(fm_path + ".tmp", fm_path)
    old = f"{index_dir.rstrip('/')}_old_{token}"
    _os.rename(index_dir, old)
    _os.rename(fresh, index_dir)
    _shutil.rmtree(old, ignore_errors=True)
    return {**rep, "rebuilt": True}


def ivf_pq_topk_from_index(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    n_candidates: int = 100,
    round_to: int | None = None,
    as_of: dict | None = None,
) -> DataFrame:
    """Query a persisted ANN index: rank centroids driver-side, read
    ONLY the nprobe nearest list partitions (`_list IN (...)` becomes
    a partition filter — files of unprobed lists are never opened),
    ADC-scan their codes, exact-refine the recalled candidates.

    ``as_of`` (a marker from :func:`ann_index_asof_marker`) replays
    the search against the corpus state AT that marker —
    select_version for the vector index: later appends are
    generation-filtered, later deletes/updates slot-filtered
    (:func:`_ann_asof`). Probe planning stays driver math over the
    FROZEN centroids (data-independent, so as-of needs no historical
    sidecar), the raw vectors ride in the index rows, and the
    exact-refine reads only as-of-live candidates. Markers from
    before the last compaction raise IndexHistoryTruncatedError."""
    import numpy as np

    meta = _open_ann_meta(index_dir)
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    order = (((cents - q[None, :]) ** 2).sum(axis=1)).argsort()[:nprobe]
    probes = [int(i) for i in order]
    idx = (
        _ann_asof(spark, index_dir, meta, as_of)
        if as_of is not None
        else _ann_live(spark, index_dir, meta)
    )
    lists = idx.where(F.col("_list").isin(probes))
    if meta.get("residual"):
        # per-list query-residual ADC tables; each single-list filter
        # still partition-prunes, and the union is one lazy job
        from functools import reduce

        per = [
            pq_adc_candidates(
                idx.where(F.col("_list") == l),
                (q - cents[l]).tolist(),
                meta["codebooks"],
                n_candidates,
                meta["id_col"],
            ).select(meta["id_col"], "_adc")
            for l in probes
        ]
        cands = (
            reduce(lambda x, y: x.unionByName(y), per)
            .orderBy(F.asc("_adc"), F.asc(meta["id_col"]))
            .limit(n_candidates)
            .select(meta["id_col"])
        )
    else:
        cands = pq_adc_candidates(
            lists, query_vec, meta["codebooks"], n_candidates, meta["id_col"]
        ).select(meta["id_col"])
    subset = lists.join(F.broadcast(cands), on=meta["id_col"], how="left_semi")
    return brute_force_topk(
        subset, query_vec, k, meta["id_col"], meta["vec_col"], round_to
    )


def ivf_pq_topk_batch_from_index(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    qid_col: str = "q_id",
    qvec_col: str = "q_embedding",
    round_to: int | None = None,
    max_queries: int = 10_000,
    as_of: dict | None = None,
) -> DataFrame:
    """Top-k for a BATCH of queries against the persisted ANN index
    in ONE Spark job — Q sequential :func:`ivf_pq_topk_from_index`
    calls pay Q job launches and re-open the same list partitions up
    to Q times; this reads each probed partition ONCE, shared by
    every query probing it.

    ``queries`` carries (q_id, q_embedding) and is a QUERY BATCH —
    driver-bounded by nature (an API request batch, an evaluation
    set), enforced by ``max_queries``; for corpus-against-corpus
    semantics use :func:`knn_join` (LSH-blocked) instead. Probe
    planning is pure driver math (centroid distances per query, no
    data job); the single data job is a partition-pruned read of the
    UNION of all queries' probe lists, an equi-join against the
    broadcast (query, list) probe table — a data row is scored only
    for queries probing ITS list — and a per-query top-k window.
    Scoring is exact cosine over probed rows (no ADC shortlist: with
    shared partition reads amortized across the batch, the code-scan
    saving no longer pays for its recall loss), so with
    ``nprobe = n_lists`` the batch answer is EXACT per query — the
    oracle-gate configuration. Deleted vectors are invisible
    (:func:`_ann_live`). Output: (q_id, vec_id, cosine), ties by id."""
    import numpy as np

    from pyspark.sql import Window

    meta = _open_ann_meta(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    cap = min(nprobe, len(cents))
    qrows = queries.select(qid_col, qvec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"query batch exceeds max_queries={max_queries}; use knn_join"
            " for corpus-scale query sides"
        )
    probe_rows = []
    for r in qrows:
        q = np.asarray(r[qvec_col], dtype=np.float64)
        order = (((cents - q[None, :]) ** 2).sum(axis=1)).argsort()[:cap]
        for li in order:
            probe_rows.append((r[qid_col], [float(x) for x in r[qvec_col]], int(li)))
    # schemas DERIVED, never hardcoded (ADVICE r13): q_id keeps the
    # caller's type, the id column keeps the index's — a string-id
    # index or string query ids batch exactly like the single-query
    # operators they claim parity with
    from pyspark.sql import types as T

    qid_type = queries.schema[qid_col].dataType
    if not probe_rows:
        id_type = spark.read.parquet(index_dir).schema[id_col].dataType
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(qid_col, qid_type),
                    T.StructField(id_col, id_type),
                    T.StructField("cosine", T.DoubleType()),
                ]
            ),
        )
    q_lists = spark.createDataFrame(
        probe_rows,
        T.StructType(
            [
                T.StructField(qid_col, qid_type),
                T.StructField(qvec_col, T.ArrayType(T.DoubleType())),
                T.StructField("_qlist", T.IntegerType()),
            ]
        ),
    )
    union_lists = sorted({li for _q, _v, li in probe_rows})
    idx = (
        _ann_asof(spark, index_dir, meta, as_of)
        if as_of is not None
        else _ann_live(spark, index_dir, meta)
    ).where(
        F.col("_list").isin(union_lists)  # partition pruning for the batch
    )
    joined = idx.join(
        F.broadcast(q_lists), on=F.col("_list") == F.col("_qlist")
    )
    sim = cosine_similarity(F.col(vec_col), F.col(qvec_col))
    if round_to is not None:
        sim = F.round(sim, round_to)
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        joined.select(F.col(qid_col), F.col(id_col), sim.alias("cosine"))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def ivf_filtered_topk_batch(
    assigned: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    filter_col: str,
    k: int = 10,
    histogram: dict | None = None,
    min_candidates: int | None = None,
    max_nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "_list",
    qid_col: str = "q_id",
    qvec_col: str = "q_embedding",
    qval_col: str = "q_filter",
    round_to: int | None = None,
) -> DataFrame:
    """BATCH filtered ANN: top-k per query UNDER EACH QUERY'S OWN
    filter value in ONE job — the production retrieval shape
    (:func:`ivf_topk_batch`) extended with the predicate awareness of
    :func:`ivf_filtered_topk`. ``queries`` carries (q_id, q_embedding,
    q_filter); a data row meets only queries probing its list AND
    matching its filter value.

    Per-query probe sets are histogram-driven exactly like the
    single-query operator — each query escalates through its nearest
    lists until the build-time histogram covers ``min_candidates``
    (default ``8*k``) rows of ITS filter value — but all the
    escalation happens driver/Arrow-side on metadata; the single data
    job is the exploded (list, query) equi-join with the filter-value
    equality folded into the join keys, so predicate-starved lists
    are never scanned and the join never sees cross-value pairs.
    Output: (q_id, vec_id, cosine), exact over each query's probe
    set, ties by id."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    hist = (
        histogram
        if histogram is not None
        else ivf_filter_histogram(assigned, filter_col, list_col)
    )
    cents = np.asarray(centroids, dtype=np.float64)
    need = 8 * k if min_candidates is None else min_candidates
    cap = len(cents) if max_nprobe is None else min(max_nprobe, len(cents))

    def _probes_fn(it):
        for pdf in it:
            rows = []
            for qid, vec, val in zip(
                pdf[qid_col], pdf[qvec_col], pdf[qval_col]
            ):
                q = np.asarray(vec, dtype=np.float64)
                order = (((cents - q[None, :]) ** 2).sum(axis=1)).argsort()
                per_list = hist.get(val, {})
                probes, avail = [], 0
                for li in order[:cap]:
                    probes.append(int(li))
                    avail += per_list.get(int(li), 0)
                    if avail >= need:
                        break
                for li in probes:
                    rows.append((qid, vec, val, li))
            yield pd.DataFrame(
                rows, columns=[qid_col, qvec_col, qval_col, list_col]
            )

    q_schema = (
        f"{qid_col} long, {qvec_col} array<float>, "
        f"{qval_col} {queries.schema[qval_col].dataType.simpleString()}, "
        f"{list_col} int"
    )
    q_lists = F.broadcast(
        queries.select(qid_col, qvec_col, qval_col).mapInPandas(
            _probes_fn, q_schema
        )
    )
    joined = assigned.join(
        q_lists,
        (assigned[list_col] == q_lists[list_col])
        & (assigned[filter_col] == q_lists[qval_col]),
    )
    sim = cosine_similarity(F.col(vec_col), F.col(qvec_col))
    if round_to is not None:
        sim = F.round(sim, round_to)
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        joined.select(F.col(qid_col), F.col(id_col), sim.alias("cosine"))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def ivf_pq_filtered_topk_from_index(
    spark,
    index_dir: str,
    query_vec: list[float],
    filter_col: str,
    filter_value,
    k: int = 10,
    brute_threshold: int = 128,
    min_candidates: int | None = None,
    max_nprobe: int | None = None,
    round_to: int | None = None,
):
    """Filtered search on the DURABLE index — the production shape of
    :func:`ivf_filtered_topk`. Strategy comes from the sidecar's
    per-(list, value) histogram (recorded at build, kept current by
    appends): zero data jobs to decide.

    - **prefilter** (``total <= brute_threshold``): one pushed-down
      equality scan of the index parquet (the filter column rides in
      every partition) + exact ranking of the matches — raw vectors
      are partition-local, so no second read.
    - **probe**: lists in centroid order until the histogram covers
      ``min_candidates`` (default ``8*k``) matching rows; the read is
      `_list IN probes` (PARTITION pruning — unprobed lists' files
      never open) + the pushed equality; exact cosine over the
      filtered probed rows. The filtered subset inside the probes is
      histogram-bounded, so exact refine replaces the ADC stage — the
      candidate set is already small by construction.

    Returns ``(topk_df, info)`` like the in-memory operator."""
    import numpy as np

    meta = _open_ann_meta(index_dir)
    triples = (meta.get("filter_hist") or {}).get(filter_col)
    if triples is None:
        raise ValueError(
            f"index has no filter histogram for {filter_col!r} — "
            f"rebuild with filter_cols=[{filter_col!r}]"
        )
    hist = _hist_from_triples(triples)
    per_list = hist.get(filter_value, {})
    total = sum(per_list.values())
    idx = _ann_live(spark, index_dir, meta)
    pred = F.col(filter_col) == F.lit(filter_value)
    if total <= brute_threshold:
        out = brute_force_topk(
            idx.where(pred), query_vec, k, meta["id_col"], meta["vec_col"],
            round_to,
        )
        return out, {
            "strategy": "prefilter",
            "probes": [],
            "total_matches": total,
            "candidates_available": total,
        }
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    order = (((cents - q[None, :]) ** 2).sum(axis=1)).argsort()
    cap = len(cents) if max_nprobe is None else min(max_nprobe, len(cents))
    need = 8 * k if min_candidates is None else min_candidates
    probes: list[int] = []
    avail = 0
    for li in order[:cap]:
        probes.append(int(li))
        avail += per_list.get(int(li), 0)
        if avail >= need:
            break
    out = brute_force_topk(
        idx.where(F.col("_list").isin(probes) & pred),
        query_vec, k, meta["id_col"], meta["vec_col"], round_to,
    )
    return out, {
        "strategy": "probe",
        "probes": probes,
        "total_matches": total,
        "candidates_available": avail,
    }


def ivf_pq_range_filtered_topk_from_index(
    spark,
    index_dir: str,
    query_vec: list[float],
    filter_col: str,
    lo,
    hi,
    k: int = 10,
    brute_threshold: int = 128,
    min_candidates: int | None = None,
    max_nprobe: int | None = None,
    round_to: int | None = None,
):
    """RANGE-filtered search on the durable index: ``filter_col
    BETWEEN lo AND hi`` (inclusive) + top-k — the timestamp/score
    predicate shape the categorical histogram can't serve. Strategy
    comes from the sidecar's per-list range stats
    (:func:`ivf_range_stats`): zero data jobs to plan.

    - Lists whose EXACT [min, max] extent misses [lo, hi] are pruned
      outright — provable, the same partition-file never opens.
    - **prefilter** (bucket-estimated matches <= brute_threshold):
      one scan of the surviving lists with the BETWEEN pushed down +
      exact ranking — EXACT regardless of estimate error, because
      pruning used only the exact extents.
    - **probe**: surviving lists in centroid order until the bucket
      estimates cover ``min_candidates`` (default ``8*k``); exact
      cosine over the probed, filtered rows. Estimates steer recall
      here, never correctness of the scores returned; worst case the
      probe set is sized from a coarse estimate — exactly the honest
      fallback contract of the categorical operator.

    ``lo``/``hi`` accept numbers or datetimes (folded to epoch
    seconds, matching the sidecar's CAST(double) domain — naive
    datetimes interpreted in the driver's local timezone, exactly as
    the pushed ``F.lit`` predicate will be). Raises when the index
    was built without ``range_cols=[filter_col]``.

    Because this operator prunes partitions from the sidecar even on
    its exact-claiming prefilter branch, the sidecar's ``hist_rows``
    marker is verified against the index footers first and a torn
    append healed (:func:`_verified_meta`) — so 'prefilter' really
    means exact, whatever crashed before this query."""
    import numpy as np

    meta = _verified_meta(spark, index_dir, _open_ann_meta(index_dir))
    stats = (meta.get("range_stats") or {}).get(filter_col)
    if stats is None:
        raise ValueError(
            f"index has no range stats for {filter_col!r} — "
            f"rebuild with range_cols=[{filter_col!r}]"
        )
    lo_d, hi_d = _range_to_double(lo), _range_to_double(hi)
    est = _range_estimate(stats, lo_d, hi_d)
    n_lists = len(meta["centroids"])
    pred = F.col(filter_col).between(F.lit(lo), F.lit(hi))
    idx = _ann_live(spark, index_dir, meta)
    info_base = {
        "lists_possible": sorted(est),
        "lists_pruned": n_lists - len(est),
        "est_matches": round(sum(est.values()), 1),
    }
    if not est:
        return idx.where(F.lit(False)).select(
            meta["id_col"], F.lit(0.0).alias("cosine")
        ), {**info_base, "strategy": "prefilter", "probes": []}
    if sum(est.values()) <= brute_threshold:
        out = brute_force_topk(
            idx.where(F.col("_list").isin(list(est)) & pred),
            query_vec, k, meta["id_col"], meta["vec_col"], round_to,
        )
        return out, {**info_base, "strategy": "prefilter", "probes": []}
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    order = (((cents - q[None, :]) ** 2).sum(axis=1)).argsort()
    cap = n_lists if max_nprobe is None else min(max_nprobe, n_lists)
    need = 8 * k if min_candidates is None else min_candidates
    probes: list[int] = []
    avail = 0.0
    for li in order[:cap]:
        li = int(li)
        if li not in est:
            continue  # provably empty for this range: skip, don't count
        probes.append(li)
        avail += est[li]
        if avail >= need:
            break
    out = brute_force_topk(
        idx.where(F.col("_list").isin(probes) & pred),
        query_vec, k, meta["id_col"], meta["vec_col"], round_to,
    )
    return out, {
        **info_base,
        "strategy": "probe",
        "probes": probes,
        "candidates_available": round(avail, 1),
    }


def ivf_pq_composite_filtered_topk_from_index(
    spark,
    index_dir: str,
    query_vec: list[float],
    eq_col: str,
    eq_value,
    range_col: str,
    lo,
    hi,
    k: int = 10,
    brute_threshold: int = 128,
    min_candidates: int | None = None,
    max_nprobe: int | None = None,
    round_to: int | None = None,
):
    """COMPOSITE filtered search: ``eq_col = v AND range_col BETWEEN
    lo AND hi`` + top-k — the full retrieval-stack predicate shape
    ('nearest WHERE lang = en AND created_at in [t0, t1]'), planned
    by INTERSECTING both sidecars with zero data jobs:

    - a list is possible only if its (list, value) histogram count is
      nonzero AND its exact [min, max] extent overlaps the range —
      either sidecar alone can rule a list out, so composite pruning
      is at least as strong as each filter's own;
    - per-list match estimates take min(categorical count, range
      bucket estimate) — each is an upper bound on the conjunction,
      so the min is the tighter admissible bound;
    - strategy follows the shared contract: **prefilter** under
      ``brute_threshold`` scans possible lists with BOTH predicates
      pushed (exact: pruning used only exact evidence), else
      **probe** escalates through possible lists in centroid order.

    Needs the index built with BOTH ``filter_cols=[eq_col]`` and
    ``range_cols=[range_col]``. Like the range operator, the sidecar
    marker is verified against the index footers (and a torn append
    healed) before its prunings are trusted — both sidecars here gate
    the exact-claiming prefilter branch."""
    import numpy as np

    meta = _verified_meta(spark, index_dir, _open_ann_meta(index_dir))
    triples = (meta.get("filter_hist") or {}).get(eq_col)
    if triples is None:
        raise ValueError(
            f"index has no filter histogram for {eq_col!r} — "
            f"rebuild with filter_cols=[{eq_col!r}]"
        )
    stats = (meta.get("range_stats") or {}).get(range_col)
    if stats is None:
        raise ValueError(
            f"index has no range stats for {range_col!r} — "
            f"rebuild with range_cols=[{range_col!r}]"
        )
    per_value = _hist_from_triples(triples).get(eq_value, {})
    lo_d, hi_d = _range_to_double(lo), _range_to_double(hi)
    r_est = _range_estimate(stats, lo_d, hi_d)
    est = {
        li: min(float(per_value[li]), r_est[li])
        for li in per_value
        if li in r_est and per_value[li] > 0
    }
    n_lists = len(meta["centroids"])
    pred = (F.col(eq_col) == F.lit(eq_value)) & F.col(range_col).between(
        F.lit(lo), F.lit(hi)
    )
    idx = _ann_live(spark, index_dir, meta)
    info_base = {
        "lists_possible": sorted(est),
        "lists_pruned": n_lists - len(est),
        "est_matches": round(sum(est.values()), 1),
    }
    if not est:
        return idx.where(F.lit(False)).select(
            meta["id_col"], F.lit(0.0).alias("cosine")
        ), {**info_base, "strategy": "prefilter", "probes": []}
    if sum(est.values()) <= brute_threshold:
        out = brute_force_topk(
            idx.where(F.col("_list").isin(list(est)) & pred),
            query_vec, k, meta["id_col"], meta["vec_col"], round_to,
        )
        return out, {**info_base, "strategy": "prefilter", "probes": []}
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    order = (((cents - q[None, :]) ** 2).sum(axis=1)).argsort()
    cap = n_lists if max_nprobe is None else min(max_nprobe, n_lists)
    need = 8 * k if min_candidates is None else min_candidates
    probes: list[int] = []
    avail = 0.0
    for li in order[:cap]:
        li = int(li)
        if li not in est:
            continue
        probes.append(li)
        avail += est[li]
        if avail >= need:
            break
    out = brute_force_topk(
        idx.where(F.col("_list").isin(probes) & pred),
        query_vec, k, meta["id_col"], meta["vec_col"], round_to,
    )
    return out, {
        **info_base,
        "strategy": "probe",
        "probes": probes,
        "candidates_available": round(avail, 1),
    }


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    round_to: int | None = None,
    block_target: int = 4096,
    kernel: str = "numpy",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space with
    the IVF coarse quantizer, then drop every vector that has a
    LOWER-ID near-neighbor (cosine >= threshold) inside its own
    cluster — semantic near-duplicate pruning without an all-pairs
    scan. Returns (id, cluster, n_close_prior, keep).

    Deterministic by construction: k-means is the seeded
    deterministic-sample trainer (ivf_centroids), assignment is a
    vectorized matmul, and the survivor of a near-dup group is always
    its smallest id (the paper keeps one exemplar per group; lowest-id
    is the engine-stable choice of exemplar).

    Scale shape: the quadratic stage is confined WITHIN clusters, and
    — r7 fix — each cluster's pair work is SALTED into bounded block
    pairs. Joining the self-join on the bare cluster id puts a whole
    cluster's |c|^2/2 pairs on ONE task; at 200k vectors the sf10
    gate measured two straggler tasks grinding ~2 cores for >30 min
    while 22 sat idle. Now every row gets a deterministic block id
    (xxhash64 % B_c, B_c = ceil(|c| / block_target) from a one-agg
    size pass, broadcast-joined on), the left side replicates to all
    (own_block, partner) keys and the right to all (partner,
    own_block) keys, and the join runs on (cluster, block_a, block_b)
    — B_c^2 tasks of <= block_target^2 pairs each. The enumerated
    pair set is IDENTICAL (each unordered pair meets under exactly
    one block key in each direction; the id< filter keeps one), so
    answers are oracle-stable; total work is unchanged; the straggler
    is gone (measured 38 min -> ~1 min at the sf10 gate). n_lists
    still grows with the corpus (the paper runs 50k clusters at
    billions of docs) — blocking handles the skew WITHIN whatever
    clustering the corpus gives. The threshold tests the RAW double
    cosine (bit-identical across engines); ``round_to`` applies only
    to displayed scores."""
    cents = ivf_centroids(df, id_col, vec_col, n_lists=n_lists)
    assigned = ivf_assign(df, cents, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("_list")
    )
    sizes = (
        assigned.groupBy("_list")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "_list",
            F.greatest(
                F.lit(1), F.ceil(F.col("_n") / F.lit(block_target))
            ).cast("int").alias("_B"),
        )
    )
    blocked = assigned.join(F.broadcast(sizes), on="_list").withColumn(
        "_blk", F.pmod(F.xxhash64(F.col(id_col)), F.col("_B")).cast("int")
    )
    partners = F.explode(F.sequence(F.lit(0), F.col("_B") - 1))
    a = blocked.select(
        F.col("_list"),
        F.col("_blk").alias("_bx"),
        partners.alias("_by"),
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
    )
    # b-side key columns carry distinct names: the two sides share a
    # lineage (same `blocked` frame), and both join and cogroup trip
    # Spark's ambiguous-self-join analysis on same-named keys
    b = blocked.select(
        F.col("_list").alias("_listb"),
        partners.alias("_bxb"),
        F.col("_blk").alias("_byb"),
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
    )
    if kernel == "expr":
        close_prior = (
            a.join(
                b,
                (F.col("_list") == F.col("_listb"))
                & (F.col("_bx") == F.col("_bxb"))
                & (F.col("_by") == F.col("_byb")),
            )
            .where(F.col("_ida") < F.col("_idb"))
            .where(cosine_similarity(F.col("_va"), F.col("_vb")) >= threshold)
            .groupBy(F.col("_idb").alias(id_col))
            .agg(F.count(F.lit(1)).alias("n_close_prior"))
        )
    else:
        # numpy block kernel: cogroup the two replicated sides on the
        # block key and run each block's pair test as ONE float64
        # matmul — no 10^9-row joined relation ever materializes, and
        # the per-pair cost is a BLAS multiply-add instead of an
        # interpreted array-aggregate expression (sf10 gate measured
        # the expr path at 31 min for 1.25G pairs; this kernel does
        # the identical enumeration in well under a minute). Same
        # float64 math as the expression cosine (dot / (|a| |b|));
        # the only divergence is summation order at the 1e-16 bit
        # level, meaningful solely for pairs EXACTLY at threshold —
        # measure-zero for continuous scores.
        import numpy as np
        import pandas as pd

        def _block_counts(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(left) == 0 or len(right) == 0:
                return pd.DataFrame({"_idb": [], "_n": []})
            A = np.asarray([np.asarray(v, dtype=np.float64) for v in left["_va"]])
            B = np.asarray([np.asarray(v, dtype=np.float64) for v in right["_vb"]])
            na = np.sqrt((A * A).sum(axis=1))
            nb = np.sqrt((B * B).sum(axis=1))
            sims = (A @ B.T) / (na[:, None] * nb[None, :])
            ids_a = left["_ida"].to_numpy()
            ids_b = right["_idb"].to_numpy()
            mask = (sims >= threshold) & (ids_a[:, None] < ids_b[None, :])
            counts = mask.sum(axis=0)
            keep = counts > 0
            return pd.DataFrame({"_idb": ids_b[keep], "_n": counts[keep]})

        close_prior = (
            a.groupBy("_list", "_bx", "_by")
            .cogroup(b.groupBy("_listb", "_bxb", "_byb"))
            .applyInPandas(
                lambda left, right: _block_counts(left, right),
                schema="_idb long, _n long",
            )
            .groupBy(F.col("_idb").alias(id_col))
            .agg(F.sum("_n").alias("n_close_prior"))
        )
    return assigned.join(close_prior, on=id_col, how="left").select(
        F.col(id_col),
        F.col("_list").alias("cluster"),
        F.coalesce("n_close_prior", F.lit(0)).alias("n_close_prior"),
        F.col("n_close_prior").isNull().alias("keep"),
    )


def hyperplane_bucket(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 4
) -> "F.Column":
    """Deterministic sign-signature bucket over an embedding column:
    bit j of the bucket is ``sign(v · h_j)`` where hyperplane
    component ``h_j[i] = ((int(md5(f"{j}_{i}")[:8], 16) % 2001) -
    1000) / 1000`` — pseudo-random but derived purely from md5, so
    ANY engine reproduces the exact same planes (the portability
    trick behind the oracle-gated ds_* workloads). Pure Catalyst
    (zip_with + aggregate fold, no UDF), map-only: the classic
    random-hyperplane LSH coarse clustering used as a cheap proxy for
    k-means cells at corpus scale."""
    import hashlib

    bucket = F.lit(0)
    for j in range(n_planes):
        plane = [
            (
                (int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:8], 16) % 2001)
                - 1000
            )
            / 1000.0
            for i in range(dim)
        ]
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(x) for x in plane]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket.cast("int")


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 4,
    per_bucket: int = 8,
) -> DataFrame:
    """Diversity-preserving subsampling: an equal quota of documents
    from every hyperplane-LSH bucket of embedding space (the
    cluster-balanced selection a pretraining mixture uses so dominant
    modes don't swamp the sample; the LSH buckets stand in for k-means
    cells — deterministic and engine-portable where k-means is not).
    Within a bucket the quota picks by md5(id) (pseudo-random,
    reproducible), id tiebreak. Plan shape: map-only bucket signature,
    ONE shuffle on (bucket) with WindowGroupLimit pushdown — ranking
    stops at the quota per partition, so cost is the shuffle, not a
    full per-bucket sort. Returns (bucket, id_col, rnk <= per_bucket).
    """
    from pyspark.sql import Window

    b = df.select(
        hyperplane_bucket(df, vec_col, dim, n_planes).alias("bucket"),
        F.col(id_col),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        b.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= per_bucket)
        .select("bucket", id_col, "rnk")
    )


def contrastive_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_anchors: int = 50,
    pos_min: float = 0.5,
    neg_max: float = 0.2,
    n_planes: int = 4,
    round_to: int = 3,
) -> DataFrame:
    """Contrastive training-pair mining over an embedding corpus: for
    a deterministic anchor sample (md5-ranked, engine-portable), the
    best POSITIVE (highest cosine >= pos_min) and the hardest
    NEGATIVE (highest cosine still <= neg_max — near the margin, the
    informative kind) among candidates sharing the anchor's
    hyperplane-LSH bucket. The bucket restriction is the scale story:
    candidate generation is anchors x own-bucket, never all-pairs, and
    the anchor sample bounds the join to n_anchors x bucket-size
    regardless of corpus size. Cosines rank after rounding (id
    tiebreak), so the mined set is engine-stable. Returns
    (anchor_id, pair_id, kind 'pos'|'neg', cosine)."""
    from pyspark.sql import Window

    b = df.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(df, vec_col, dim, n_planes).alias("_bkt"),
    )
    # Anchor sampling without a full-corpus global rank: the md5
    # hash-prefix prefilter keeps only the smallest ~30% of the hash
    # space (hex-string order == prefix-int order, so the global
    # md5-smallest n_anchors all survive it), then the rank runs over
    # that bounded set — the single-partition window never sees the
    # whole corpus.
    ph = F.md5(F.col(id_col).cast("string"))
    cap = int((1 << 32) * 0.3)
    anchors = (
        b.where(
            F.conv(F.substring(ph, 1, 8), 16, 10).cast("long") < F.lit(cap)
        )
        .withColumn(
            "_ar",
            F.row_number().over(Window.orderBy(ph, F.col(id_col))),
        )
        .where(F.col("_ar") <= n_anchors)
        .select(
            F.col(id_col).alias("anchor_id"),
            F.col(vec_col).alias("_av"),
            F.col("_bkt"),
        )
    )
    cand = anchors.join(
        b.select(
            F.col(id_col).alias("pair_id"),
            F.col(vec_col).alias("_bv"),
            F.col("_bkt"),
        ),
        on="_bkt",
    ).where(F.col("anchor_id") != F.col("pair_id"))
    dot = F.aggregate(
        F.zip_with(
            F.col("_av"), F.col("_bv"), lambda a, x: a.cast("double") * x
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def _nrm(c):
        return F.sqrt(
            F.aggregate(
                F.col(c),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x,
            )
        )

    scored = cand.select(
        "anchor_id",
        "pair_id",
        F.round(dot / (_nrm("_av") * _nrm("_bv")), round_to).alias("cosine"),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("pair_id")
    )
    pos = (
        scored.where(F.col("cosine") >= pos_min)
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("anchor_id", "pair_id", F.lit("pos").alias("kind"), "cosine")
    )
    neg = (
        scored.where(F.col("cosine") <= neg_max)
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("anchor_id", "pair_id", F.lit("neg").alias("kind"), "cosine")
    )
    return pos.unionByName(neg)
