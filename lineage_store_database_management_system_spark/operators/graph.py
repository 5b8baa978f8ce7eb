"""Duplicate-cluster graph operators (extension layer — the reference
has no multi-row operators at all, SURVEY §2.6; north-star
LLM-pipeline component).

Pairwise dedup (exact digests, MinHash/LSH, n-gram Jaccard — see
:mod:`.dedup`) emits EDGES; a production pipeline must then group the
edges into duplicate CLUSTERS and keep one representative per cluster.
That grouping is connected components over the similarity graph.

Scale shape (100 TB): min-label propagation — per round, one
|E|-sized shuffle (join edges with current labels, groupBy-min) plus
one |V|-sized merge. Duplicate-similarity graphs are unions of
near-cliques (every member of a dup cluster pairs with most others),
so the graph diameter is tiny and the loop converges in 2–4 rounds;
the round count is bounded by the diameter, not |V|. For adversarial
long-path graphs the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014) converges in O(log² n) rounds with the same per-round
join shape — the loop below is the same skeleton with a simpler
update rule. Each round localCheckpoints the label frame so the plan
does not grow with iterations (lineage truncation, not recomputation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the MINIMUM id reachable from it:
    ``(id, component)``. ``pairs`` is an undirected edge list (one row
    per edge, either orientation); ``nodes`` optionally supplies the
    full vertex set so isolated nodes (no edges) appear as singleton
    components — pass the corpus id column when deduplicating, else
    only endpoint ids are labeled.

    Deterministic: the component label is the min member id, so the
    output is independent of partitioning and iteration order.
    Raises if the graph has not converged after ``max_iter`` rounds
    (diameter > max_iter) rather than returning partial labels.
    """
    edges = (
        pairs.select(F.col(id_a).alias("_src"), F.col(id_b).alias("_dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("_src"), F.col(id_a).alias("_dst"))
        )
        .distinct()
    )
    endpoint_ids = edges.select(F.col("_src").alias("_id")).distinct()
    if nodes is not None:
        vertex_ids = (
            nodes.select(F.col(nodes.columns[0]).alias("_id"))
            .distinct()
            .unionByName(endpoint_ids)
            .distinct()
        )
    else:
        vertex_ids = endpoint_ids
    edges = edges.localCheckpoint(eager=True)

    labels = vertex_ids.select(
        F.col("_id"), F.col("_id").alias("_comp")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # min label among each node's neighbors, one |E| shuffle
        nbr_min = (
            edges.join(labels, edges["_src"] == labels["_id"])
            .groupBy(F.col("_dst").alias("_id"))
            .agg(F.min("_comp").alias("_nbr"))
        )
        new_labels = (
            labels.join(nbr_min, on="_id", how="left")
            .select(
                "_id",
                F.least(F.col("_comp"), F.coalesce("_nbr", "_comp")).alias("_comp"),
                (F.coalesce("_nbr", "_comp") < F.col("_comp")).alias("_chg"),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.where("_chg").limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            return labels.select(
                F.col("_id").alias("id"), F.col("_comp").alias("component")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter); raise max_iter or switch to "
        "the large-star/small-star formulation for long-path graphs"
    )


def dedup_by_clusters(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep ONE representative per duplicate cluster: the min-id
    member (deterministic). Rows absent from ``pairs`` are singleton
    clusters and always survive. This is the final stage of the
    standard corpus dedup pipeline: candidate pairs → components →
    keep cluster head."""
    comp = connected_components(pairs, id_a, id_b, nodes=df.select(id_col))
    heads = comp.where(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(heads, on=id_col, how="left_semi")


def hierarchy_resolve(
    edges: DataFrame,
    child_col: str,
    parent_col: str,
    nodes: DataFrame | None = None,
    max_iter: int = 40,
) -> DataFrame:
    """Resolve a parent-pointer FOREST to (id, root, depth) — the
    Spark answer to ``WITH RECURSIVE`` ancestor walks (org charts,
    BOM explosions, category trees), which Catalyst has no native
    operator for. ``edges`` holds one (child, parent) row per
    non-root node; ``nodes`` optionally supplies the full vertex set
    (ids absent from ``edges``' child side are roots: depth 0,
    root = self).

    Scale shape: POINTER JUMPING (path doubling) — each round joins
    the state with itself (``ptr -> ptr[ptr]``) and ADDS the jump
    distances, so after r rounds every pointer has traversed 2^r
    original edges: O(log depth) rounds of |V|-sized hash joins,
    versus the |depth| sequential passes a naive loop (or a
    recursive CTE's semi-naive evaluation) needs. A 1M-deep chain
    resolves in 20 rounds. Each round localCheckpoints (lineage
    truncation, same discipline as connected components).

    Deterministic; raises on cycles (they never converge) and on
    children with multiple parents (not a forest) rather than
    returning wrong depths."""
    e = (
        edges.select(
            F.col(child_col).alias("_id"), F.col(parent_col).alias("_ptr")
        )
        .where(F.col("_ptr").isNotNull())
        # multiset edge lists are valid forests: collapse repeated
        # identical (child, parent) rows BEFORE the multi-parent check
        # (so they don't trip it) and before the pointer-jumping joins
        # (so they don't multiply rows).
        .distinct()
    )
    dup = e.groupBy("_id").count().where("count > 1").limit(1)
    if dup.count() > 0:
        raise ValueError(
            "hierarchy_resolve: some child has multiple DISTINCT parents; "
            "input is not a forest"
        )
    vertex_ids = (
        e.select("_id")
        .unionByName(e.select(F.col("_ptr").alias("_id")))
        .distinct()
    )
    if nodes is not None:
        vertex_ids = (
            nodes.select(F.col(nodes.columns[0]).alias("_id"))
            .distinct()
            .unionByName(vertex_ids)
            .distinct()
        )
    # state: ptr = furthest-known ancestor, dist = edges traversed to it;
    # roots are their own ptr at dist 0 and are absorbing.
    state = (
        vertex_ids.join(e, on="_id", how="left")
        .select(
            "_id",
            F.coalesce("_ptr", F.col("_id")).alias("_ptr"),
            F.when(F.col("_ptr").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("_dist"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        hop = state.select(
            F.col("_id").alias("_pid"),
            F.col("_ptr").alias("_pptr"),
            F.col("_dist").alias("_pdist"),
        )
        new_state = (
            state.join(hop, state["_ptr"] == hop["_pid"], "inner")
            .select(
                "_id",
                F.col("_pptr").alias("_ptr"),
                (F.col("_dist") + F.col("_pdist")).alias("_dist"),
                (F.col("_pdist") > 0).alias("_chg"),
            )
        ).localCheckpoint(eager=True)
        moved = new_state.where("_chg").limit(1).count()
        state = new_state.drop("_chg")
        if moved == 0:
            return state.select(
                F.col("_id").alias("id"),
                F.col("_ptr").alias("root"),
                F.col("_dist").alias("depth"),
            )
    raise RuntimeError(
        f"hierarchy_resolve did not converge in {max_iter} rounds — the "
        "edge set contains a cycle, or depth exceeds 2^max_iter"
    )


def pagerank_integer(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    n_iter: int = 5,
    scale: int = 1_000_000,
    damping_pct: int = 85,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """PageRank in INTEGER mass units — the iterative-analytics
    workhorse, made bit-deterministic across engines and partition
    orders: each node starts with ``scale`` units; per iteration every
    node keeps ``scale*(100-damping)/100`` (floor) and receives
    ``floor(m_src * damping / (100 * outdeg(src)))`` along each
    in-edge. Integer sums are associative-commutative EXACTLY (no
    float reduction-order drift), so the result is a pure function of
    the graph — SQL-oracle-able and partitioning-independent, unlike
    float PageRank whose last-ulp depends on aggregation order.
    Dangling-node mass is dropped (the standard sink-loss variant);
    ranks are comparable, not normalized probabilities.

    Scale shape: per iteration one |E| hash join (mass onto edges,
    degree pre-joined once) + one |E| groupBy-sum + one |V| merge —
    the same shuffle skeleton as connected components; each round
    localCheckpoints so the plan stays flat. Fixed ``n_iter``, no
    convergence scan.

    Returns (id, rank_mass bigint)."""
    e = (
        edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
        .distinct()
    )
    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_d"))
    ed = e.join(deg, on="_src").localCheckpoint(eager=True)
    verts = (
        e.select(F.col("_src").alias("_k"))
        .unionByName(e.select(F.col("_dst").alias("_k")))
        .distinct()
    )
    if nodes is not None:
        verts = (
            nodes.select(F.col(nodes.columns[0]).alias("_k"))
            .distinct()
            .unionByName(verts)
            .distinct()
        )
    verts = verts.localCheckpoint(eager=True)
    base = scale * (100 - damping_pct) // 100
    m = verts.select("_k", F.lit(scale).cast("long").alias("_m"))
    for _ in range(n_iter):
        contrib = ed.join(m, ed["_src"] == m["_k"]).select(
            F.col("_dst"),
            F.expr(f"(_m * {damping_pct}) DIV (100 * _d)").alias("_c"),
        )
        inflow = contrib.groupBy("_dst").agg(F.sum("_c").alias("_in"))
        m = (
            verts.join(inflow, verts["_k"] == inflow["_dst"], "left")
            .select(
                "_k",
                (F.lit(base) + F.coalesce("_in", F.lit(0))).cast("long").alias("_m"),
            )
            .localCheckpoint(eager=True)
        )
    return m.select(F.col("_k").alias("id"), F.col("_m").alias("rank_mass"))


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    nodes: DataFrame | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — same contract as :func:`connected_components`
    (``(id, component)``, component = min reachable id) but
    converging in O(log n) rounds instead of O(diameter): the fix for
    long-path graphs the plain min-label propagation error message
    points at.

    Each round is two |E|-bounded shuffles keyed on node ids:

    - large-star: for every node u, connect every STRICTLY GREATER
      neighbor to u's minimum neighbor (incl. u) — hangs high nodes
      under local minima without ever orienting an edge upward.
    - small-star: for every node u, connect every neighbor <= u
      (and u) to the minimum — flattens the remaining chains.

    Both steps preserve connectivity exactly and only ever decrease
    (node, parent) pairs lexicographically, so the fixpoint is the
    min-id star per component; determinism for free. Edges
    localCheckpoint per round (lineage truncation, same discipline as
    the propagation variant)."""
    edges = (
        pairs.select(F.col(id_a).alias("_u"), F.col(id_b).alias("_v"))
        .where(F.col("_u") != F.col("_v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    vertex_ids = (
        edges.select(F.col("_u").alias("_id"))
        .unionByName(edges.select(F.col("_v").alias("_id")))
        .distinct()
    )
    if nodes is not None:
        vertex_ids = (
            nodes.select(F.col(nodes.columns[0]).alias("_id"))
            .distinct()
            .unionByName(vertex_ids)
            .distinct()
        )
    vertex_ids = vertex_ids.localCheckpoint(eager=True)

    def _sym(e: DataFrame) -> DataFrame:
        return e.unionByName(
            e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
        )

    def _star(e: DataFrame, large: bool) -> DataFrame:
        # neighborhood of u = neighbors (+ u itself); m = its minimum.
        # The self-pair must exist for EVERY endpoint (a node smaller
        # than all its neighbors must be its own minimum, else it
        # could drop out of the emitted edge set entirely).
        sym = _sym(e)
        nbr = sym.unionByName(
            sym.select("_u", F.col("_u").alias("_v")).distinct()
        )
        m = nbr.groupBy("_u").agg(F.min("_v").alias("_m"))
        j = nbr.join(m, on="_u")
        if large:
            out = j.where(F.col("_v") > F.col("_u"))
        else:
            out = j.where(F.col("_v") <= F.col("_u"))
        return (
            out.where(F.col("_v") != F.col("_m"))
            .select(F.col("_v").alias("_u"), F.col("_m").alias("_v"))
            .distinct()
        )

    for _ in range(max_iter):
        e2 = _star(edges, large=True)
        e3 = _star(e2, large=False).localCheckpoint(eager=True)
        # Convergence: the new state is stable when another large-star
        # leaves its edge set unchanged. Two cheaper-on-paper variants
        # were MEASURED against this (SCALING.md, sf0.1/sf1/sf10 pair
        # graphs up to 27M edges): successive-edge-set equality
        # detects one full round late (2x slower), and a single-
        # aggregate structural fixpoint test (child-single-parented &
        # never-a-parent) lands within noise at small scale but ~9%
        # slower at 27M edges — theory lost to the profiler, so the
        # original check stays.
        stable = (
            _star(e3, large=True).exceptAll(e3).limit(1).count() == 0
        )
        edges = e3
        if stable:
            roots = edges.select(
                F.col("_u").alias("_id"), F.col("_v").alias("_comp")
            )
            return (
                vertex_ids.join(roots, on="_id", how="left")
                .select(
                    F.col("_id").alias("id"),
                    F.coalesce(
                        F.least(F.col("_comp"), F.col("_id")), F.col("_id")
                    ).alias("component"),
                )
                .groupBy("id")
                .agg(F.min("component").alias("component"))
            )
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds"
    )


def triangle_counts(
    edges: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Per-vertex triangle participation counts over an undirected
    edge list: ``(vertex, n_triangles)`` for every vertex in at least
    one triangle. The missing third of the graph-analytics family
    here (components = reachability, PageRank = centrality, triangles
    = local clustering / community density — the standard signal for
    spam-farm and botnet-cluster detection over link or interaction
    graphs).

    Scale shape (100 TB): the naive three-way self-join enumerates
    every WEDGE (2-path) once per center vertex — sum(deg^2), which a
    single celebrity vertex turns quadratic. This is the
    degree-ORIENTED algorithm (Cohen, "Graph Twiddling in a MapReduce
    World", 2009): orient every edge from the (degree, id)-smaller
    endpoint to the larger, so each triangle is generated exactly
    once from its lowest-ranked corner and every vertex's
    out-neighborhood is bounded by O(sqrt(m)) — total wedge work
    O(m^1.5) REGARDLESS of skew, the proven optimal bound for
    join-based enumeration. Three shuffles (degree agg, wedge
    self-join on the low corner, closing-edge join), all on key
    columns; the (deg, id) rank rides the edge rows as a struct so
    orientation is decided edge-locally, no per-vertex lookup.

    Deterministic: output depends only on the edge SET (orientation
    and multiplicity are normalized away)."""
    e0 = (
        edges.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e0.select(F.col("a").alias("x"))
        .unionAll(e0.select(F.col("b").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    withd = (
        e0.join(deg.select(F.col("x").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("x").alias("b"), F.col("d").alias("db")), "b")
    )
    ra = F.struct(F.col("da").alias("d"), F.col("a").alias("i"))
    rb = F.struct(F.col("db").alias("d"), F.col("b").alias("i"))
    lo_first = ra < rb
    oriented = withd.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(lo_first, rb).otherwise(ra).alias("rdst"),
    )
    wedges = (
        oriented.alias("e1")
        .join(
            oriented.alias("e2"),
            (F.col("e1.src") == F.col("e2.src"))
            & (F.col("e1.rdst") < F.col("e2.rdst")),
        )
        .select(
            F.col("e1.src").alias("x"),
            F.col("e1.dst").alias("y"),
            F.col("e2.dst").alias("z"),
        )
    )
    closing = oriented.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tris = wedges.join(closing, ["y", "z"])
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
