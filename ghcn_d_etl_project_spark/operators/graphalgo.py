"""Graph analytics over edge DataFrames: triangle counting and a
deterministic fixed-point PageRank.

Complements ``operators/graph.py`` (connected components — the dedup
closure) with the two classic "shape of the graph" measures an
item-affinity or link-graph pipeline computes next: per-node triangle
participation (the clustering-coefficient numerator) and PageRank
centrality. Both are pure DataFrame joins + aggregations — no
GraphX/GraphFrames dependency, no driver-side graph.

Triangle counting uses the degree-orientation trick (node-iterator++;
public literature, e.g. Suri & Vassilvitskii's MapReduce formulation):
orient every undirected edge from its lower-degree endpoint to the
higher (ties by id), count directed wedges u->v, u->w closed by an
oriented edge (v,w). Every triangle is counted exactly once at its
lowest-degree vertex, and the wedge intermediate shrinks from
sum(deg^2) to sum(outdeg^2) with outdeg <= O(sqrt(m)) — the difference
between a hub exploding the shuffle and a bounded one at 100 TB scale.

PageRank here is FIXED-POINT integer arithmetic by design: ranks are
BIGINT micro-units (``scale`` = 1e12 per unit mass) and each iteration
is exact integer division + exact integer sums, so the result is
bit-identical regardless of partitioning, accumulation order, or
engine — a DuckDB oracle can replay the same recursion and hash-match.
(Float PageRank sums in nondeterministic order; its last-ulp wobble is
exactly what the repo's parity recipe avoids — see ``plans/_util.py``.)
Truncation error vs real-valued PageRank is < |V| ulps of 1e-12 per
iteration — irrelevant for ranking. Scale posture: the edge list with
degrees is the big table, partitioned once on ``src`` and persisted;
each iteration shuffles only (node, contribution) pairs — Σ cost
O(iters * |E| / cluster), the textbook join-agg PageRank loop.

Reference parity: no graph operators exist in the reference
(``/root/reference/src`` is scan/clean/aggregate only); this is
extension surface for the co-purchase/link-analysis family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.storagelevel import StorageLevel


def _undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected edge set: (u < v), distinct, no loops."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    )
    return (
        e.select(
            F.least("u", "v").alias("u"),
            F.greatest("u", "v").alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )


def triangle_counts(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Per-node triangle participation: ``(node, n_triangles)``.

    Degree-oriented wedge counting (module docstring): each triangle is
    found exactly once at its lowest-(degree, id) vertex, then credited
    to all three corners. Nodes in no triangle are absent (join the
    degree table if zeros are needed;
    :func:`clustering_coefficients` does exactly that).

    The canonical edge set and the oriented edge set are persist-marked
    (same persist-once-substrate pattern as MinHash shingles): the
    oriented table is scanned THREE times by the wedge-close self-join
    and ``und`` twice more for degrees — without the marks the caller's
    upstream edge derivation (often itself a join) re-executes five
    times inside one action.
    """
    und = _undirected(edges, src, dst).persist(StorageLevel.MEMORY_AND_DISK)
    return _triangle_counts_canonical(und)


def _triangle_counts_canonical(und: DataFrame) -> DataFrame:
    """Triangle counts over an ALREADY-canonical persisted edge set
    ``(u < v, distinct)`` — the shared core of :func:`triangle_counts`
    and :func:`clustering_coefficients` (which reuses its own ``und``
    for the degree table instead of re-canonicalizing)."""
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orient low -> high by (deg, id); both endpoints need their degree.
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    lower_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_u, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lower_u, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    # Wedge a->b, a->c with b < c, closed by an oriented edge between b
    # and c in EITHER orientation (the closing edge's direction depends
    # on its own endpoints' degrees, not the wedge apex's). Phrasing
    # "either orientation" as an OR of two equality pairs plans a real
    # CartesianProduct (Catalyst cannot hash-join a disjunction) —
    # |wedges| x |edges| pair tests, the one scale-killer r10's audit
    # found. Instead: project the oriented edges onto their CANONICAL
    # (least, greatest) key — exact because ``oriented`` holds each
    # undirected edge in exactly one orientation, so the projection is
    # a bijection — and close the (b < c)-ordered wedge with ONE
    # composite-key equi-join, which Catalyst hash-joins.
    closers = oriented.select(
        F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
    )
    tri = (
        e1.join(e2, (F.col("e1.a") == F.col("e2.a")) & (F.col("e1.b") < F.col("e2.b")))
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
        .join(
            closers,
            (F.col("y") == F.col("lo")) & (F.col("z") == F.col("hi")),
        )
        .select("x", "y", "z")
    )
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def clustering_coefficients(
    edges: DataFrame, src: str, dst: str, round_digits: int = 6
) -> DataFrame:
    """Local clustering coefficient per node:
    ``(node, deg, n_triangles, lcc)`` with
    ``lcc = 2*T(v) / (deg(v) * (deg(v)-1))`` and 0.0 for degree-<2
    nodes — the standard "how clique-like is this node's
    neighborhood" readout over :func:`triangle_counts`. EVERY node of
    the graph appears (zero triangles included), unlike the raw
    triangle query.

    Scale shape: one canonical edge substrate (persisted once here and
    reused for BOTH the degree aggregate and the triangle core —
    :func:`_triangle_counts_canonical` — so the caller's upstream edge
    derivation runs once), then a single equi-join of the two
    node-sized tables. The division is one double expression over
    exact BIGINTs, rounded — value-hashable cross-engine.
    """
    und = _undirected(edges, src, dst).persist(StorageLevel.MEMORY_AND_DISK)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    tri = _triangle_counts_canonical(und)
    d = F.col("deg").cast("double")
    n_tri = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "deg",
            n_tri.alias("n_triangles"),
            F.when(
                F.col("deg") >= 2,
                F.round(2.0 * n_tri.cast("double") / (d * (d - 1.0)), round_digits),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def adamic_adar_scores(
    edges: DataFrame,
    src: str,
    dst: str,
    min_common: int = 2,
    scale: int = 10**9,
) -> DataFrame:
    """Adamic-Adar link prediction over the undirected graph:
    non-adjacent node pairs scored by
    ``AA(x,y) = sum over common neighbors w of 1/ln(deg(w))`` —
    the classic "which edge forms next" heuristic (Adamic & Adar 2003).
    Output ``(node1, node2, common_neighbors, aa_fp, aa_score)`` with
    ``node1 < node2``, restricted to pairs with at least ``min_common``
    common neighbors (the useful prediction mass; also the output
    bound).

    Engine-parity recipe (the PageRank convention): each neighbor's
    irrational ``1/ln(deg)`` is quantized ONCE at the node-sized degree
    table — ``floor(scale / ln(deg))`` as BIGINT — so every pair's
    score is an exact integer sum regardless of accumulation order;
    ``aa_score`` is the double view. A common neighbor has deg >= 2 by
    construction (it touches both endpoints), so ln(deg) > 0 always.

    Scale shape: wedge enumeration through the common neighbor is the
    sum(deg^2) self-join on the hub column — the honest cost of exact
    AA (every common neighbor must be SEEN; no orientation trick
    applies because the wedge is credited to its endpoints, not its
    apex). Skew posture at 100 TB: cap hub degree upstream or switch
    to a sampled estimator; this operator states the exact semantics.
    Adjacent pairs are removed with an anti-join on the canonical edge
    set (never NOT EXISTS on the fact).
    """
    und = _undirected(edges, src, dst).persist(StorageLevel.MEMORY_AND_DISK)
    directed = und.unionAll(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = directed.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # quantized 1/ln(deg) lives on the node-sized table, computed once.
    # deg >= 2 filter BEFORE the division: a degree-1 node can never be
    # a wedge apex (it has one neighbor), but ANSI mode evaluates
    # scale/ln(1) on its row anyway — filter first, not try_divide.
    wdeg = deg.filter(F.col("deg") >= 2).select(
        F.col("u").alias("w"),
        F.floor(F.lit(float(scale)) / F.log(F.col("deg").cast("double")))
        .cast("long")
        .alias("inv_ln_fp"),
    )
    nbrs = directed.select(F.col("u").alias("w"), F.col("v").alias("x"))
    a, b = nbrs.alias("a"), nbrs.alias("b")
    wedges = a.join(
        b, (F.col("a.w") == F.col("b.w")) & (F.col("a.x") < F.col("b.x"))
    ).select(
        F.col("a.w").alias("w"),
        F.col("a.x").alias("node1"),
        F.col("b.x").alias("node2"),
    )
    scored = (
        wedges.join(wdeg, "w")
        .groupBy("node1", "node2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum("inv_ln_fp").cast("long").alias("aa_fp"),
        )
        .filter(F.col("common_neighbors") >= min_common)
    )
    non_adjacent = scored.join(
        und,
        (scored["node1"] == und["u"]) & (scored["node2"] == und["v"]),
        "left_anti",
    )
    return non_adjacent.select(
        "node1",
        "node2",
        "common_neighbors",
        "aa_fp",
        (F.col("aa_fp").cast("double") / F.lit(float(scale))).alias("aa_score"),
    )


def pagerank_fixed_point(
    edges: DataFrame,
    src: str,
    dst: str,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
) -> DataFrame:
    """Deterministic PageRank over the undirected graph of ``edges``.

    Returns ``(node, rank_fp, rank)`` — ``rank_fp`` the exact BIGINT
    fixed-point value (units of 1/``scale``), ``rank`` its double view.
    Recursion per node n (all integer ops, DIV = floor division):

        r0      = scale DIV N
        contrib = r DIV deg               (per directed edge src->dst)
        r'      = (scale*(den-num)) DIV (den*N)
                  + (num * sum(contrib)) DIV den

    Deterministic by construction (integer sums are associative), so an
    SQL engine replaying the same recursion matches bit-for-bit; see
    module docstring for why float PageRank can't be oracle-hashed.
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    # Persist the canonical edges: they feed the degree aggregation, the
    # adj build, AND the bounded n_nodes count below — without the mark
    # the caller's upstream edge derivation executes three times.
    und = _undirected(edges, src, dst).persist(StorageLevel.MEMORY_AND_DISK)
    directed = und.unionAll(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = directed.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # The loop-invariant big table: every directed edge with its source
    # degree, partitioned once on the join key and persisted so each
    # iteration's join reuses the layout instead of re-shuffling edges.
    adj = (
        directed.join(deg, "u")
        .repartition(F.col("u"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = deg.count()  # bounded: one count over the degree table
    base_fp = (scale * (damping_den - damping_num)) // (damping_den * n_nodes)

    ranks = deg.select(
        F.col("u").alias("node"), F.lit(int(scale // n_nodes)).alias("rank_fp")
    )
    for _ in range(iters):
        contribs = (
            adj.join(ranks, adj.u == ranks.node)
            .select(
                F.col("v").alias("node"),
                F.expr("rank_fp DIV deg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        ranks = contribs.select(
            "node",
            (
                F.lit(base_fp)
                + F.expr(f"(CAST({damping_num} AS BIGINT) * in_mass) DIV {damping_den}")
            ).alias("rank_fp"),
        )
    # adj stays persist-marked: the caller's single action scans it once
    # per iteration (3 stages of one job) and the cache collapses those
    # to one compute. Blocks are evicted LRU / on session close; callers
    # running many graphs can spark.catalog.clearCache() between them.
    return ranks.select(
        "node",
        F.col("rank_fp").cast("long").alias("rank_fp"),
        (F.col("rank_fp").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def bfs_hops(
    edges: DataFrame,
    src: str,
    dst: str,
    sources: DataFrame,
    max_hops: int = 4,
    release_into: list[DataFrame] | None = None,
) -> DataFrame:
    """Multi-source breadth-first hop distance over the UNDIRECTED
    graph, bounded at ``max_hops`` — the reachability/radius primitive
    (blast-radius analysis, recommendation spreading, lineage walks).

    Level-synchronous frontier expansion, the canonical distributed BFS:

      * each level is ONE equi-join of the current frontier against the
        doubled edge list plus a left-anti join against the visited set
        — shuffle volume per level is |frontier-adjacent edges|, never
        |all paths| (the recursive-CTE path enumeration the oracle
        states explodes combinatorially; UNION-dedup saves it only at
        oracle scale);
      * every level is ``localCheckpoint(eager=True)``: materialized
        once and its LINEAGE TRUNCATED, so each level's plan is a flat
        scan. Persist-only chaining kept the blocks cached but let the
        logical plan of level h contain every prior level (the visited
        set is a union over all levels, and the frontier is the
        previous level) — plan text grew ~3x per hop to 1.2 MB at 4
        hops, and Catalyst re-analyzed that whole tree on every
        per-level action (measured r14: 3.6s -> ~1.3s at sf0.1 for
        ``bfs_hops_parts`` from the truncation alone; the r9
        eager-release trap — 15.9s from RE-DERIVING superseded levels —
        stays fixed because checkpointed blocks never re-derive). Same
        discipline as ``kcore`` below. ``release_into`` still receives
        the frames for API compatibility; checkpoint blocks are freed
        by the ContextCleaner when the frames are collected;
      * termination: a ``limit(1).count()`` empty-probe per level — a
        bounded action over the already-materialized checkpoint; the
        loop also hard-stops at ``max_hops`` so worst-case driver
        iterations are fixed.

    ``sources`` is a one-column DataFrame of start nodes (computed IN
    PLAN — e.g. an aggregate — so no driver collect is required to
    seed). Unreachable nodes are absent. Output: ``(node, dist long)``
    with dist = minimum hop count (0 for the sources themselves).
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    und = _undirected(edges, src, dst)
    d = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()

    from functools import reduce

    levels = [
        sources.select(F.col(sources.columns[0]).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    ]
    for h in range(1, max_hops + 1):
        frontier = levels[-1]
        seen = reduce(
            lambda a, b: a.unionByName(b),
            (lv.select("node") for lv in levels),
        )
        nxt = (
            frontier.join(d, frontier["node"] == d["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(seen, "node", "left_anti")
            .withColumn("dist", F.lit(h).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        levels.append(nxt)
    if release_into is not None:
        release_into.extend([d, *levels])
    return reduce(lambda a, b: a.unionByName(b), levels).select("node", "dist")


def kcore(
    edges: DataFrame,
    src: str,
    dst: str,
    k: int,
    max_iters: int = 100,
) -> DataFrame:
    """The k-core of the undirected graph: the maximal subgraph in which
    every node has degree >= k — the standard cohesion filter (spam/
    bot-ring detection, dense-community seeding, graph sparsification).

    Iterative peeling to the fixpoint: drop nodes with degree < k,
    recompute degrees on the induced subgraph, repeat. Each round is
    one degree aggregate + two semi-joins of the edge list against the
    surviving-node set — all equi-joins on node ids; the driver sees
    only one survivor COUNT per round (the fixpoint test), never data.
    Rounds are data-dependent but bounded by ``max_iters`` (each round
    strictly shrinks the node set, so iterations <= initial node count;
    real graphs converge in a handful).

    Lineage discipline: a data-dependent iteration count means
    persist-only chaining GROWS the plan each round (round t's action
    re-derives every prior join — the classic iterative-lineage
    explosion; it OOMed this exact function at SF 0.01 before the fix).
    Each round's edge set is therefore ``localCheckpoint(eager=True)``:
    materialized to executor storage NOW and its lineage truncated, so
    every round starts from a flat scan. On a production cluster use a
    reliable checkpoint dir if executor loss matters; the round
    structure is identical.

    Deterministic by construction (set-valued fixpoint — no ordering
    anywhere). Output: ``(node, degree long)`` — final in-core degrees.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = _undirected(edges, src, dst).localCheckpoint(eager=True)
    prev_n = None
    for _ in range(max_iters):
        d = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        deg = d.groupBy(F.col("u").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("degree")
        )
        keep = deg.filter(F.col("degree") >= k).persist()
        n = keep.count()
        if n == 0 or (prev_n is not None and n == prev_n):
            e.unpersist()
            return keep
        prev_n = n
        # no broadcast hint: the survivor set can be graph-sized at
        # 100 TB — let AQE pick broadcast when a round's set shrinks
        e2 = (
            e.join(keep.select(F.col("node").alias("u")), "u")
            .join(keep.select(F.col("node").alias("v")), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)  # materialized: safe to drop e
        )
        e.unpersist()
        keep.unpersist()
        e = e2
    raise RuntimeError(f"k-core did not converge within {max_iters} rounds")
