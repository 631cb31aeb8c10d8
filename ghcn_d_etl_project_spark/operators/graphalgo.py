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
    degree table if zeros are needed).

    The canonical edge set and the oriented edge set are persist-marked
    (same persist-once-substrate pattern as MinHash shingles): the
    oriented table is scanned THREE times by the wedge-close self-join
    and ``und`` twice more for degrees — without the marks the caller's
    upstream edge derivation (often itself a join) re-executes five
    times inside one action.
    """
    und = _undirected(edges, src, dst).persist(StorageLevel.MEMORY_AND_DISK)
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
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    # Wedge a->b, a->c (b != c) closed by an oriented edge between b and
    # c in EITHER orientation (the closing edge's direction depends on
    # its own endpoints' degrees, not the wedge apex's).
    tri = (
        e1.join(e2, (F.col("e1.a") == F.col("e2.a")) & (F.col("e1.b") < F.col("e2.b")))
        .join(
            e3,
            (
                (F.col("e3.a") == F.col("e1.b")) & (F.col("e3.b") == F.col("e2.b"))
            )
            | (
                (F.col("e3.a") == F.col("e2.b")) & (F.col("e3.b") == F.col("e1.b"))
            ),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
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
