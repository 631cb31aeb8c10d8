"""IVF (inverted-file) approximate nearest-neighbor search.

The second approximate ANN family next to sign-LSH
(``operators/similarity.py``): a coarse k-means quantizer splits the
corpus into Voronoi cells, each vector is indexed under its nearest
centroid, and a query scores exact cosine ONLY against the members of
its ``n_probe`` nearest cells — the classic IVF-Flat construction
(Johnson et al., "Billion-scale similarity search with GPUs"; the
centroids-as-routing idea goes back to inverted file systems in
Jegou et al.'s product-quantization line).

Index + search are distributed DataFrame ops — no MLlib, no UDFs:

  * the coarse quantizer (k-means) trains driver-side on a BOUNDED
    hash-ordered sample (``train_rows`` x dim doubles, the same
    bounded-collect legitimacy as the k x dim centroid table) — see
    ``kmeans_fit``; the corpus itself is never collected.
  * cell assignment is one SHUFFLE-FREE distributed pass: per-row
    distances to all centroids via JVM higher-order functions over the
    array column (``_cell_ranking`` — the centroid table rides the plan
    as a literal), sorted and sliced per row. The sequential per-row
    fold is deterministic by construction — no distributed accumulation
    order to pin down. The broadcast-join + partial-agg form is
    retained (``_dist2``) for centroid counts too large to embed in
    the plan.
  * Scale: the quantizer trains on a bounded hash-ordered sample
    (``train_rows`` — a coarse quantizer needs ~10-100x k vectors, not
    the corpus), so Lloyd cost is O(train_rows x k) per round no matter
    the corpus size; only the one-pass cell ASSIGNMENT touches all N.
    Search is one equi-join on the cell id (candidates per query ~
    n_probe/k of the corpus) plus the exact re-rank. At 100 TB one
    raises k so cells stay executor-sized (k ~ sqrt(N) keeps candidate
    sets ~sqrt(N)).

Like the LSH variants, output is hash/centroid-defined — rows-only
checked by the driver, with recall-vs-exact pinned in pytest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.common import (
    double_literal,
    ensure_parallelism,
)
from ghcn_d_etl_project_spark.operators.similarity import _as_double, dot, norm


def _bounded_count(df: DataFrame, bound: int) -> int:
    """``min(count, bound + 1)`` via a bounded ``limit`` — the probe cost
    is O(bound) regardless of input size. Factored out so tests can pin
    that ``ivf_topk`` probes exactly once, against the persisted table."""
    return df.limit(bound + 1).count()


def _centroid_df(spark: SparkSession, cents: dict[int, list[float]]) -> DataFrame:
    rows = [(c, d, float(v)) for c, vec in cents.items() for d, v in enumerate(vec)]
    return spark.createDataFrame(rows, "cluster int, d int, c double")


def _dist2(vec_long: DataFrame, centroid_long: DataFrame) -> DataFrame:
    """Squared euclidean distance of every vector to every centroid, as a
    broadcast join on the dimension index + map-side partial aggregation.

    Retained as the LARGE-k assignment shape: ``_cell_ranking``'s
    plan-literal centroid table stops being sensible once k x dim
    climbs into the tens of MB (production IVF with k ~ sqrt(N)); this
    join form carries the centroids as data instead. DECIMAL sum =
    order-independent, so near-tie argmins can't flip between runs."""
    diff = F.col("x") - F.col("c")
    return (
        vec_long.join(F.broadcast(centroid_long), "d")
        .groupBy("id", "cluster")
        .agg(
            F.sum((diff * diff).cast("decimal(30,14)")).alias("dist2")
        )
    )


def _cell_ranking(cents: dict[int, list[float]], vec_col: str) -> Column:
    """Per-row distances to ALL centroids as a sorted array of
    (dist2, cluster) structs — a pure projection over the vector column
    (JVM higher-order functions), NO explode / join / shuffle.

    The previous shape (posexplode to N x dim rows -> broadcast join ->
    N x k partial agg) paid a whole shuffle stage for arithmetic that is
    per-row local; measured 2.4s -> 0.23s at sf0.1 for the assignment
    pass. The sequential per-row double fold is deterministic (fixed
    evaluation order — no distributed accumulation to reorder), and
    struct ordering breaks dist2 ties toward the lower cluster id,
    matching the old sort_array(collect_list(...)) semantics exactly."""
    k = len(cents)
    # r14: the centroid plan-literal is built as ONE parsed SQL string
    # (D-suffixed double literals round-trip exactly via shortest-repr)
    # instead of k x dim F.lit py4j calls — at k=16 x dim=64 those 1024
    # driver round trips were ~1.2s of pure DataFrame-construction time
    # per invocation, over half this query's non-execution cost.
    cent_lit = F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(double_literal(v) for v in cents[i]) + ")"
            for i in sorted(cents)
        )
        + ")"
    )
    dists = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.element_at(cent_lit, i + 1),
                    lambda x, c: (x - c) * (x - c),
                ),
                F.lit(0.0),
                lambda acc, y: acc + y,
            ).alias("dist2"),
            i.cast("int").alias("cluster"),
        ),
    )
    return F.array_sort(dists)


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    n_iter: int = 3,
    seed: int = 7,
    train_rows: int = 4096,
) -> dict[int, list[float]]:
    """Lloyd's k-means coarse quantizer, trained DRIVER-SIDE on a
    bounded deterministic sample; returns centroids as a dict
    (k x dim doubles).

    The training set is the first ``train_rows`` corpus vectors in
    ``xxhash64(id, seed)`` order (TakeOrderedAndProject — no full
    sort), collected to the driver: train_rows x dim doubles, bounded
    BY CONSTRUCTION regardless of corpus size — the same bounded-
    collect legitimacy as the centroid table itself. A coarse quantizer
    needs ~10-100x k training vectors, not the corpus (FAISS trains IVF
    quantizers on in-process samples for the same reason); the corpus
    is only ever touched by the distributed one-pass cell assignment in
    ``ivf_topk``. Init = the sample's first k vectors; empty cells keep
    their previous centroid; numpy argmin breaks distance ties toward
    the lower cluster id, and identical input yields an identical fit.

    (Round 4 change: the previous DISTRIBUTED Lloyd's paid per-round
    fixed costs — a broadcast, two shuffles, and a collect, ~3 s/round
    on local[32] — that dwarf the actual arithmetic at ANY corpus size,
    precisely because the training set is bounded. Cluster time belongs
    to the assignment pass, not the fit.)
    """
    import numpy as np

    sample = (
        df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id"), F.lit(seed)), F.col("id"))
        .limit(train_rows)
        .collect()
    )
    X = np.asarray([r.v for r in sample], dtype=np.float64)
    C = X[:k].copy()
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for c in range(min(k, C.shape[0])):
            members = X[a == c]
            if members.shape[0]:
                C[c] = members.mean(axis=0)
    return {i: [float(x) for x in C[i]] for i in range(C.shape[0])}


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int | None = 16,
    n_probe: int = 2,
    n_iter: int = 3,
    seed: int = 7,
    round_digits: int = 6,
    train_rows: int = 4096,
    broadcast_rows: int = 65536,
    release_into: list[DataFrame] | None = None,
    literal_budget: int = 262144,
) -> DataFrame:
    """Approximate cosine top-k per corpus vector via IVF cells.

    Each vector is indexed under its nearest centroid; each query probes
    its ``n_probe`` nearest cells and exactly re-ranks only those
    members (~``n_probe/n_centroids`` of the corpus). A (query,
    neighbor) pair appears at most once since a neighbor has exactly one
    home cell. Output: (qid, nid, cos_sim, rank) — same contract as
    ``cosine_topk`` / ``ann_lsh_topk`` so recall is directly
    measurable.

    The corpus-to-centroid assignment is a PURE PROJECTION
    (``_cell_ranking``: per-row distances to every centroid via JVM
    higher-order functions — no explode, no join, no shuffle), computed
    once and persisted together with the normalized vector; ``home``
    (element 0) and the probe list both read that one table. Earlier
    shapes paid a posexplode + broadcast join + N x k partial agg — a
    whole shuffle stage — for this per-row-local arithmetic; at
    plan-literal-prohibitive centroid counts (k x dim >
    ``literal_budget`` elements) the dispatch below switches to the
    ``_dist2`` broadcast-join form, which carries centroids as data.

    Join strategy for the scoring join: when the corpus provably fits a
    broadcast (ONE bounded ``_bounded_count`` probe — O(broadcast_rows)
    regardless of corpus size — run against the already-PERSISTED
    ``assigned`` table, so it warms the cache the member/probe branches
    reuse instead of re-scanning the raw source), the member table is
    broadcast, which matters because the cell id has only
    ``n_centroids`` distinct values — a shuffle join on 16 cells caps
    parallelism at 16 tasks and pays two exchanges + sorts (measured 8x
    slower at sf0.1). Above the probe bound the join shuffles on the
    cell id, which is the correct 100 TB shape: there production
    ``n_centroids`` ~ sqrt(N) supplies thousands of join keys, so the
    small-k parallelism collapse cannot occur.

    ``n_centroids=None`` auto-sizes the quantizer from the same single
    probe (run against the raw source in that case, since the count is
    needed before the fit): k ~ sqrt(min(N, broadcast_rows + 1)),
    floored at 4 then hard-capped at train_rows // 8 (the cap wins when
    they conflict) so the bounded training sample keeps >= 8 vectors per
    cell. The sqrt saturates at the probe bound by
    construction — callers at production scale should size
    ``n_centroids`` explicitly from their known corpus size. Either
    path, exactly ONE bounded count action runs per invocation
    (pinned by ``tests/test_ivf.py``).

    Cache lifetime: ONE intermediate is persisted (``assigned`` — id,
    normalized vector, norm, sorted probe cells) so the member/probe
    branches share one computation. Pass ``release_into`` (a list) to
    receive it and ``unpersist()`` once the result has materialized —
    the same caller-owned-lifetime contract as ``CorpusStages.release()``
    (``pipelines/corpus.py``); without it, repeated invocations in one
    session accumulate cached blocks until the store evicts under
    pressure."""
    probe_count: int | None = None
    if n_centroids is None:
        # sizing must precede the fit, so the one probe runs on the
        # source here and is REUSED for the broadcast decision below
        probe_count = _bounded_count(df, broadcast_rows)
        # floor-of-4 applies to the sqrt target only; train_rows // 8
        # stays a hard CAP so the >=8-vectors-per-cell invariant holds
        # even for tiny training samples (max-outside-min inverted it)
        n_centroids = min(
            max(4, int(probe_count**0.5)), max(1, train_rows // 8)
        )
    cents = kmeans_fit(
        df, id_col, vec_col, k=n_centroids, n_iter=n_iter, seed=seed,
        train_rows=train_rows,
    )

    base = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), _as_double(vec_col).alias("vec"))
        .withColumn("nrm", norm(F.col("vec")))
    )
    dim = len(next(iter(cents.values())))
    if len(cents) * dim <= literal_budget:
        assigned = base.withColumn(
            "cells", F.slice(_cell_ranking(cents, "vec"), 1, n_probe)
        )
    else:
        # centroid table too large to embed in the plan (production
        # k ~ sqrt(N)): carry it as data via the _dist2 broadcast-join +
        # partial-agg form instead
        cells_df = (
            _dist2(
                base.select("id", F.posexplode("vec").alias("d", "x")),
                _centroid_df(df.sparkSession, cents),
            )
            .groupBy("id")
            .agg(
                F.slice(
                    F.sort_array(F.collect_list(F.struct("dist2", "cluster"))),
                    1,
                    n_probe,
                ).alias("cells")
            )
        )
        assigned = base.join(cells_df, "id")
    assigned = assigned.persist()
    if release_into is not None:
        release_into.append(assigned)

    members = assigned.select(
        F.col("id").alias("nid"),
        F.col("vec").alias("nvec"),
        F.col("nrm").alias("nnorm"),
        F.col("cells")[0]["cluster"].alias("cluster"),
    )
    queries = assigned.select(
        F.col("id").alias("qid"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnorm"),
        F.explode("cells").alias("cell"),
    ).select("qid", "qvec", "qnorm", F.col("cell.cluster").alias("cluster"))
    if probe_count is None:
        # probe the PERSISTED assignment, not the raw source: the rows it
        # touches land in (and later come from) the cache the scoring
        # branches read, so no second scan of the input ever happens
        probe_count = _bounded_count(assigned, broadcast_rows)
    if probe_count <= broadcast_rows:
        members = F.broadcast(members)
    scored = (
        queries.join(members, "cluster")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(
                dot(F.col("qvec"), F.col("nvec"))
                / (F.col("qnorm") * F.col("nnorm")),
                round_digits,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )
