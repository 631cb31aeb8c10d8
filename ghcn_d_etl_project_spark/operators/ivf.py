"""IVF (inverted-file) approximate nearest-neighbor search.

The second approximate ANN family next to sign-LSH
(``operators/similarity.py``): a coarse k-means quantizer splits the
corpus into Voronoi cells, each vector is indexed under its nearest
centroid, and a query scores exact cosine ONLY against the members of
its ``n_probe`` nearest cells — the classic IVF-Flat construction
(Johnson et al., "Billion-scale similarity search with GPUs"; the
centroids-as-routing idea goes back to inverted file systems in
Jegou et al.'s product-quantization line).

Everything is distributed DataFrame ops — no MLlib, no UDFs:

  * k-means is Lloyd's iteration with the explode->broadcast-join->
    groupBy shape: distances are computed on ``(id, dim, x)`` rows
    joined against a broadcast ``(cluster, dim, c)`` table and summed
    per (id, cluster) with map-side partial aggregation, so the shuffle
    carries N x k rows, not N x k x dim. Centroid updates collect only
    k x dim doubles to the driver (the definition of a COARSE quantizer
    is that k x dim is tiny).
  * All floating accumulations (distances, centroid means) go through
    DECIMAL, making the fit bit-deterministic regardless of partition
    count or accumulation order — same recipe as the oracle-parity sums
    in ``plans/_util.py``.
  * Scale: each Lloyd round is two shuffles; search is one equi-join on
    the cell id (candidates per query ~ n_probe/k of the corpus) plus
    the exact re-rank. At 100 TB one raises k so cells stay
    executor-sized (k ~ sqrt(N) keeps candidate sets ~sqrt(N)).

Like the LSH variants, output is hash/centroid-defined — rows-only
checked by the driver, with recall-vs-exact pinned in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.common import ensure_parallelism
from ghcn_d_etl_project_spark.operators.similarity import _as_double, dot, norm


def _vec_long(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, d, x) exploded vector elements; d is the 0-based dimension."""
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(_as_double(vec_col)).alias("d", "x")
    )


def _centroid_df(spark: SparkSession, cents: dict[int, list[float]]) -> DataFrame:
    rows = [(c, d, float(v)) for c, vec in cents.items() for d, v in enumerate(vec)]
    return spark.createDataFrame(rows, "cluster int, d int, c double")


def _dist2(vec_long: DataFrame, centroid_long: DataFrame) -> DataFrame:
    """Squared euclidean distance of every vector to every centroid.

    Broadcast join on the dimension index keeps the big side unshuffled;
    the (id, cluster) groupBy partial-aggregates map-side. DECIMAL sum =
    order-independent, so near-tie argmins can't flip between runs."""
    diff = F.col("x") - F.col("c")
    return (
        vec_long.join(F.broadcast(centroid_long), "d")
        .groupBy("id", "cluster")
        .agg(
            F.sum((diff * diff).cast("decimal(30,14)")).alias("dist2")
        )
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    n_iter: int = 3,
    seed: int = 7,
) -> dict[int, list[float]]:
    """Lloyd's k-means over an embedding column, returning centroids as a
    driver-side dict (k x dim doubles — tiny by construction).

    Init picks k corpus vectors by hash order (``xxhash64(id, seed)`` +
    TakeOrderedAndProject — no full sort), so the fit is deterministic
    end-to-end. Empty cells keep their previous centroid."""
    spark = df.sparkSession
    base = df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    init = base.orderBy(F.xxhash64(F.col("id"), F.lit(seed)), F.col("id")).limit(k)
    cents = {i: [float(x) for x in r.v] for i, r in enumerate(init.collect())}

    vec_long = _vec_long(df, id_col, vec_col).persist()
    try:
        for _ in range(n_iter):
            cl = _centroid_df(spark, cents)
            assign = _dist2(vec_long, cl)
            w = Window.partitionBy("id").orderBy(
                F.col("dist2").asc(), F.col("cluster").asc()
            )
            home = (
                assign.withColumn("r", F.row_number().over(w))
                .filter(F.col("r") == 1)
                .select("id", "cluster")
            )
            upd = (
                home.join(vec_long, "id")
                .groupBy("cluster", "d")
                .agg(
                    F.avg(F.col("x").cast("decimal(28,14)"))
                    .cast("double")
                    .alias("c")
                )
                .collect()
            )
            dims_by_cluster: dict[int, dict[int, float]] = {}
            for r in upd:
                dims_by_cluster.setdefault(r.cluster, {})[r.d] = r.c
            for cid, dims in dims_by_cluster.items():
                cents[cid] = [dims[d] for d in range(len(dims))]
    finally:
        vec_long.unpersist()
    return cents


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    n_iter: int = 3,
    seed: int = 7,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate cosine top-k per corpus vector via IVF cells.

    Each vector is indexed under its nearest centroid; each query probes
    its ``n_probe`` nearest cells and exactly re-ranks only those
    members (~``n_probe/n_centroids`` of the corpus). A (query,
    neighbor) pair appears at most once since a neighbor has exactly one
    home cell. Output: (qid, nid, cos_sim, rank) — same contract as
    ``cosine_topk`` / ``ann_lsh_topk`` so recall is directly
    measurable."""
    spark = df.sparkSession
    cents = kmeans_fit(df, id_col, vec_col, k=n_centroids, n_iter=n_iter, seed=seed)

    base = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), _as_double(vec_col).alias("vec"))
        .withColumn("nrm", norm(F.col("vec")))
        .persist()
    )
    vec_long = base.select("id", F.posexplode("vec").alias("d", "x"))
    ranked = _dist2(vec_long, _centroid_df(spark, cents)).withColumn(
        "crank",
        F.row_number().over(
            Window.partitionBy("id").orderBy(
                F.col("dist2").asc(), F.col("cluster").asc()
            )
        ),
    )
    home = ranked.filter(F.col("crank") == 1).select("id", "cluster")
    probes = ranked.filter(F.col("crank") <= n_probe).select("id", "cluster")

    members = home.join(base, "id").select(
        F.col("id").alias("nid"),
        F.col("vec").alias("nvec"),
        F.col("nrm").alias("nnorm"),
        "cluster",
    )
    queries = probes.join(base, "id").select(
        F.col("id").alias("qid"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnorm"),
        "cluster",
    )
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
