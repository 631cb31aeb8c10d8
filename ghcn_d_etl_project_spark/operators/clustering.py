"""Distributed k-means (Lloyd) over embedding columns, engineered for
determinism: bit-identical assignments under any partitioning.

Why determinism needs designing: textbook float k-means is doubly
order-sensitive — random init, and centroid means accumulated in
partition order. This implementation pins both:

  * **init** — the k vectors with the smallest ids (a
    TakeOrderedAndProject, no randomness, no driver-side scan); callers
    wanting k-means++ semantics can pass ``init_ids`` explicitly;
  * **update** — per-cluster per-dimension means are computed in FIXED
    POINT: each component contributes ``floor(x * scale)`` as BIGINT,
    sums are exact and associative (the ``pagerank_fixed_point`` trick,
    ``operators/graphalgo.py``), and the new centroid component is the
    one double ``sum_fp / (scale * count)`` — so every iteration's
    centroids are a pure function of the SET of assigned rows, not of
    accumulation order.

Scale design (100 TB posture):

  * assignment is shuffle-free: centroids (k x d doubles, a few KB)
    ride a broadcast into ``mapInPandas``; one BLAS GEMM per Arrow
    batch computes all k distances for the batch
    (``|x|^2 - 2 x.c + |c|^2``), argmin with lowest-index tie-break;
  * the per-iteration update is ONE groupBy producing k rows of d+1
    exact integers — map-side partial aggregation collapses every
    partition to <= k rows before the shuffle, so the shuffle volume
    is k x d x partitions regardless of row count;
  * the scoreable projection is persisted once and re-scanned per
    iteration (iters is small and fixed); nothing driver-side ever
    holds more than k x (d+1) numbers.

Empty clusters keep their previous centroid (the standard Lloyd
convention that never loses a cell).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.common import double_literal

__all__ = [
    "kmeans_lloyd",
    "label_centroids",
    "nearest_centroid",
    "embedding_split_drift",
    "semdedup",
]


def _as_double(col: str):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 4,
    scale: int = 1_000_000,
    init_ids: list | None = None,
    round_digits: int = 6,
    release_into: list[DataFrame] | None = None,
    max_collect_rows: int = 65536,
) -> DataFrame:
    """Lloyd's k-means: returns one row per input vector with its final
    cluster and (rounded) squared distance to the final centroid.

    Deterministic by construction — see the module docstring. Rows with
    NULL id or NULL vector are excluded by contract.

    The scoreable projection is persisted for the iteration re-scans;
    pass ``release_into`` (a list) to receive the persisted DataFrame
    and ``unpersist()`` it once the returned frame has been consumed.

    ``max_collect_rows`` bounds the per-iteration driver collect: when
    the worst case (k rows per input partition of numpy partial sums)
    exceeds it, a k-row JVM ``groupBy("cluster")`` pre-reduce is
    inserted so the collect is O(k x d) regardless of partition count
    (VERDICT r14 #2); below the bound the partials are collected
    directly (identical int64 arithmetic, none of the extra stage
    overhead). Output: ``(id_col, cluster long, dist2 double)``.
    """
    import numpy as np
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")

    base = (
        df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("__id"), _as_double(vec_col).alias("__v"))
        .persist()
    )

    if init_ids is not None:
        seed_rows = base.filter(F.col("__id").isin(list(init_ids))).collect()
        seed_rows.sort(key=lambda r: init_ids.index(r["__id"]))
    else:
        seed_rows = base.orderBy("__id").limit(k).collect()
    if len(seed_rows) < k:
        base.unpersist()
        raise ValueError(
            f"need at least k={k} distinct seedable rows, got {len(seed_rows)}"
        )
    C = np.asarray([r["__v"] for r in seed_rows], dtype=np.float64)
    dim = C.shape[1]

    sc = df.sparkSession.sparkContext

    def assign(centroids: np.ndarray) -> DataFrame:
        b = sc.broadcast(centroids)
        id_type = base.schema["__id"].dataType.simpleString()

        def run(batches):
            M = b.value
            cn = (M * M).sum(axis=1)  # |c|^2 per cluster
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
                )
                # |x|^2 - 2 x.c + |c|^2, one GEMM for the batch
                d2 = (
                    (X * X).sum(axis=1)[:, None]
                    - 2.0 * (X @ M.T)
                    + cn[None, :]
                )
                cl = d2.argmin(axis=1)  # numpy argmin = lowest index tie
                yield pd.DataFrame(
                    {
                        "__id": pdf["__id"],
                        "cluster": cl.astype("int64"),
                        "dist2": d2[np.arange(len(cl)), cl],
                    }
                )

        return base.mapInPandas(
            run,
            schema=f"__id {id_type}, cluster long, dist2 double",
        )

    def update_sums(centroids: np.ndarray) -> DataFrame:
        """Per-Arrow-batch cluster assignment + FIXED-POINT partial sums
        computed in numpy, emitting <= k rows per batch — (cluster,
        count, per-dimension int64 sum array) — instead of shipping
        every (id, vec, cluster) row back through Arrow for a
        (dim+1)-expression JVM aggregate. Exactness: each component
        contributes ``floor(x * scale)`` as int64 — the identical IEEE
        double multiply + floor the JVM expression computed — and int64
        sums are associative, so the per-cluster totals (and hence every
        iteration's centroids) are bit-identical to the wide-aggregate
        formulation this replaces.

        Finite-components contract (ADVICE r14): the int64 cast of a
        non-finite ``floor(x * scale)`` is where numpy (INT64_MIN) and
        a non-ANSI JVM cast (0 for NaN, clamp for +/-inf) diverge —
        embeddings entering k-means must carry finite components, the
        same precondition every cosine operator here already imposes
        via its zero-norm/NULL filters."""
        b = sc.broadcast(centroids)
        n_cent = centroids.shape[0]

        def run(batches):
            M = b.value
            cn = (M * M).sum(axis=1)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
                )
                d2 = (
                    (X * X).sum(axis=1)[:, None]
                    - 2.0 * (X @ M.T)
                    + cn[None, :]
                )
                cl = d2.argmin(axis=1)
                S = np.floor(X * float(scale)).astype(np.int64)
                counts = np.bincount(cl, minlength=n_cent)
                present = np.flatnonzero(counts)
                acc = np.zeros((n_cent, S.shape[1]), dtype=np.int64)
                for c in present:
                    acc[c] = S[cl == c].sum(axis=0, dtype=np.int64)
                yield pd.DataFrame(
                    {
                        "cluster": present.astype("int64"),
                        "n": counts[present].astype("int64"),
                        "s": [acc[c].tolist() for c in present],
                    }
                )

        return base.select("__v").mapInPandas(
            run, "cluster long, n long, s array<long>"
        )

    # The per-iteration reduce is TWO-LEVEL WHEN IT NEEDS TO BE (r15,
    # VERDICT r14 #2): the numpy partial sums are <= k rows per Arrow
    # batch, i.e. up to k x partitions rows of d+2 numbers at the
    # driver — trivial at local[32] (k=8 x 32 rows), gigabytes per
    # iteration at a 100 TB layout's 10^5-10^6 partitions. When the
    # worst-case partial-row count exceeds ``max_collect_rows``, one
    # small JVM groupBy("cluster") pre-reduces: map-side partial
    # aggregation collapses every partition to <= k rows before ONE
    # k-row exchange, so the collect is O(k x d) regardless of
    # partition count. Below the bound the direct collect stays — the
    # pre-reduce costs ~3 extra (AQE) stages per run, measured +0.5s on
    # a 1.0s query at sf0.1, pure overhead when the driver traffic is
    # kilobytes. Both paths are bit-identical: the d element sums are
    # one parsed SQL string (the r14 construction rule), and the JVM's
    # BIGINT sum wraps exactly like np.int64 addition, so int64
    # associativity makes every iteration's centroids a pure function
    # of the assigned-row SET either way.
    n_parts = base.rdd.getNumPartitions()  # == update_sums' task count
    pre_reduce = k * n_parts > max_collect_rows
    sum_arr = F.expr(
        "array(" + ", ".join(f"sum(s[{i}])" for i in range(dim)) + ")"
    )
    for _ in range(iters):
        sums_fp = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        partials = update_sums(C)
        if pre_reduce:
            partials = partials.groupBy("cluster").agg(
                F.sum("n").alias("n"), sum_arr.alias("s")
            )
        for r in partials.collect():
            c = int(r["cluster"])
            counts[c] += int(r["n"])
            sums_fp[c] += np.asarray(r["s"], dtype=np.int64)
        newC = C.copy()
        nz = counts > 0
        newC[nz] = sums_fp[nz].astype(np.float64) / (
            float(scale) * counts[nz, None]
        )
        C = newC

    if release_into is not None:
        release_into.append(base)
    final = assign(C)
    return final.select(
        F.col("__id").alias(id_col),
        "cluster",
        F.round("dist2", round_digits).alias("dist2"),
    )


def label_centroids(
    df: DataFrame,
    label_col: str,
    vec_col: str,
    dim: int | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-label exact centroid of an embedding column, long format —
    the class-prototype primitive (nearest-centroid classification,
    contrastive anchor mining, cluster drift monitoring).

    Fixed-point recipe: each component contributes
    ``floor(v[i] * scale)`` as BIGINT, per-(label, dim) sums are exact
    and associative, the mean is the single double
    ``sum / (scale * n)`` — bit-identical under any partitioning or
    engine, which is what lets a FLOAT-embedding aggregate carry a full
    value-hash oracle.

    Scale design: ONE groupBy(label) with d+1 aggregate expressions
    (map-side partial combine collapses each partition to one row per
    label BEFORE the shuffle — the explode-then-group alternative
    shuffles n x d rows); the wide row then unpivots to (label, dim, n,
    centroid) via one stack over |labels| rows. NULL labels/vectors are
    excluded by contract.
    """
    base = df.filter(
        F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(label_col).alias("label"), _as_double(vec_col).alias("__v")
    )
    if dim is None:
        # infer from the null-FILTERED base (kmeans_lloyd convention):
        # an unfiltered first row can carry a NULL vector, where F.size
        # returns NULL and int() raised an opaque TypeError
        first = base.select(F.size("__v").alias("d")).limit(1).collect()
        dim = 0 if not first or first[0]["d"] is None else int(first[0]["d"])
    if dim < 1:
        raise ValueError(f"could not infer a positive vector dim (got {dim})")
    wide = base.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(
                F.floor(F.col("__v")[i] * F.lit(float(scale))).cast("long")
            ).alias(f"__s{i}")
            for i in range(dim)
        ],
    )
    parts = ", ".join(f"{i}L, `__s{i}`" for i in range(dim))
    return wide.select(
        "label",
        "n",
        F.expr(f"stack({dim}, {parts}) as (dim, s)"),
    ).select(
        "label",
        F.col("dim").cast("long").alias("dim"),
        "n",
        (
            F.col("s").cast("double")
            / (F.lit(float(scale)) * F.col("n").cast("double"))
        ).alias("centroid"),
    )


def nearest_centroid(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    dim: int | None = None,
) -> DataFrame:
    """Assign every vector to its nearest class centroid — the
    nearest-centroid classifier / cluster-purity readout that closes
    the loop on :func:`label_centroids` (train prototypes, then score
    assignment quality or classify new vectors).

    ``centroids`` is the LONG-format (label, dim, centroid) frame
    :func:`label_centroids` emits; labels must be integer-castable
    (the deterministic tie-break orders on them). The k x d table is
    collected (the same bounded-probe posture as k-means seeds) and
    embedded as PLAN LITERALS, so assignment is a shuffle-free
    UDF-free projection: per label one ``zip_with`` + fold over the
    vector — k folds per row, `mapInPandas`-free, whole-stage codegen.

    Parity recipe (what makes an argmin value-hashable): each
    per-dimension squared difference is quantized to DECIMAL(28,12)
    BEFORE the fold sum, so the distance is exact and associative on
    any engine; the argmin is an ``array_max`` over
    (-dist2, -label) structs — smallest distance, then smallest label
    on ties, never a float comparison of two differently-accumulated
    sums. Output: input rows + ``pred_label`` (long) + ``dist2``
    (double, the exact decimal cast). NULL ids/vectors are excluded.
    """
    rows = centroids.select(
        F.col("label").cast("long").alias("l"),
        F.col("dim").cast("int").alias("d"),
        F.col("centroid").cast("double").alias("c"),
    ).collect()
    if not rows:
        raise ValueError("centroids frame is empty")
    by_label: dict[int, dict[int, float]] = {}
    for r in rows:
        by_label.setdefault(int(r["l"]), {})[int(r["d"])] = float(r["c"])
    if dim is None:
        dim = 1 + max(max(d.keys()) for d in by_label.values())
    for lbl, comp in by_label.items():
        if set(comp.keys()) != set(range(dim)):
            raise ValueError(
                f"centroid for label {lbl} is missing dimensions "
                f"(expected 0..{dim - 1})"
            )

    v = _as_double(vec_col)
    dec = "decimal(28,12)"

    def dist2(comp: dict[int, float]) -> Column:
        # one parsed SQL string per centroid instead of dim F.lit py4j
        # round trips (r14; exact D-suffixed shortest-repr doubles) —
        # k x dim literal calls dominated this operator's construction
        lits = F.expr(
            "array(" + ", ".join(double_literal(comp[i]) for i in range(dim)) + ")"
        )
        sq = F.zip_with(v, lits, lambda a, b: (a - b) * (a - b))
        return F.aggregate(
            sq,
            F.lit(0).cast(dec),
            lambda acc, x: (acc + x.cast(dec)).cast(dec),
        )

    cands = [
        F.struct(
            (-dist2(comp)).alias("negd"),
            F.lit(-lbl).alias("negl"),
            F.lit(lbl).cast("long").alias("label"),
        )
        for lbl, comp in sorted(by_label.items())
    ]
    best = F.array_max(F.array(*cands))
    return df.filter(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        "*",
        best["label"].alias("pred_label"),
        (-best["negd"]).cast("double").alias("dist2"),
    )


def embedding_split_drift(
    df: DataFrame,
    split_col,
    vec_col: str,
    dim: int,
    scale: int = 1000,
    round_digits: int = 6,
) -> DataFrame:
    """Distribution-drift readout between TWO embedding populations
    (``split_col`` boolean Column: True = the incoming batch, False =
    the reference corpus) — the embedding-space half of the
    incremental-ingestion gate family: a crawl batch whose centroid
    has rotated away from the corpus, or whose vectors changed scale
    (a new encoder version, a normalization bug), should fail loudly
    BEFORE it contaminates dedup thresholds and ANN indexes tuned on
    the old geometry.

    Exact-arithmetic recipe (the :func:`label_centroids` convention,
    coarsened): components quantize to ``floor(v * scale)`` BIGINT;
    per-split per-dim sums and the per-split sum of squared quantized
    components are exact associative integer aggregates in ONE
    groupBy(split) pass (map-side combined — the shuffle carries 2
    rows of d+2 longs regardless of corpus size). The cross-split
    cosine then comes from exact integer dot products of the two sum
    vectors (cos(sum) == cos(centroid); the scale cancels), with the
    final double division/sqrt/round the only inexact steps — IEEE-
    identical on any engine, hence fully value-hash checkable.
    ``scale`` defaults to 1e3, keeping every intermediate (sums
    ~n*scale, dots ~d*(n*scale)^2) exactly representable in both
    BIGINT and DOUBLE at petabyte row counts; the induced ~1e-3
    relative quantization is immaterial for a drift METRIC (this is a
    monitor, not a precision instrument — document deltas, don't
    reuse as similarity).

    Output: ONE row — ``n_ref, n_new BIGINT; centroid_cos,
    mean_sqnorm_ref, mean_sqnorm_new DOUBLE`` (mean squared norm in
    ORIGINAL units: ssq / (scale^2 * n)).
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    q = [
        F.floor(_as_double(vec_col)[i] * F.lit(float(scale))).cast("long")
        for i in range(dim)
    ]
    wide = (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            split_col.alias("__new"),
            *[q[i].alias(f"__q{i}") for i in range(dim)],
        )
        .groupBy("__new")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            *[F.sum(F.col(f"__q{i}")).alias(f"__s{i}") for i in range(dim)],
            F.sum(
                sum(
                    (F.col(f"__q{i}") * F.col(f"__q{i}") for i in range(1, dim)),
                    F.col("__q0") * F.col("__q0"),
                )
            ).alias("__ssq"),
        )
    )
    r = wide.filter(~F.col("__new")).select(
        F.col("__n").alias("__nr"),
        *[F.col(f"__s{i}").alias(f"__r{i}") for i in range(dim)],
        F.col("__ssq").alias("__ssqr"),
    )
    w = wide.filter(F.col("__new")).select(
        F.col("__n").alias("__nn"),
        *[F.col(f"__s{i}").alias(f"__w{i}") for i in range(dim)],
        F.col("__ssq").alias("__ssqn"),
    )
    dot = sum(
        (F.col(f"__r{i}") * F.col(f"__w{i}") for i in range(1, dim)),
        F.col("__r0") * F.col("__w0"),
    )
    rr = sum(
        (F.col(f"__r{i}") * F.col(f"__r{i}") for i in range(1, dim)),
        F.col("__r0") * F.col("__r0"),
    )
    ww = sum(
        (F.col(f"__w{i}") * F.col(f"__w{i}") for i in range(1, dim)),
        F.col("__w0") * F.col("__w0"),
    )
    sc2 = float(scale) * float(scale)
    return r.crossJoin(F.broadcast(w)).select(
        F.col("__nr").alias("n_ref"),
        F.col("__nn").alias("n_new"),
        F.round(
            dot.cast("double")
            / F.sqrt(rr.cast("double") * ww.cast("double")),
            round_digits,
        ).alias("centroid_cos"),
        F.round(
            F.col("__ssqr").cast("double") / (F.lit(sc2) * F.col("__nr")),
            round_digits,
        ).alias("mean_sqnorm_ref"),
        F.round(
            F.col("__ssqn").cast("double") / (F.lit(sc2) * F.col("__nn")),
            round_digits,
        ).alias("mean_sqnorm_new"),
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int | str = 16,
    iters: int = 4,
    threshold: float = 0.95,
    init_ids: list | None = None,
    round_digits: int = 6,
    release_into: list[DataFrame] | None = None,
    target_cluster_size: int = 512,
    max_pair_budget: int | None = 50_000_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the
    embedding space with k-means, then find semantic duplicates ONLY
    within each cluster (pairwise cosine >= ``threshold``) and keep one
    representative per duplicate relation — the paper's rule: keep the
    member with the LOWEST cosine similarity to its centroid (here: the
    GREATER ``dist2``; exact ties keep the smaller id).

    Why cluster first: all-pairs cosine is quadratic in the corpus;
    clustering bounds the pair term to sum-of-cluster-sizes² — pick
    ``k`` proportional to N so expected cluster size stays fixed (the
    paper runs k=50,000 on LAION) and the within-cluster self-join is
    a plain shuffle equi-join on the cluster key, linear-ish overall.
    Assignment itself is the deterministic fixed-point
    :func:`kmeans_lloyd` (shuffle-free scoring, k x d update rows).

    Zero-norm and NULL vectors are excluded by contract (cosine
    undefined — the similarity operators' shared rule). Output, one
    row per scoreable input: ``(id_col, cluster, dist2, n_dup_neighbors,
    keep)``; ``keep=false`` iff some same-cluster neighbor with
    cosine >= threshold sits farther from (or tied with, at a smaller
    id) the centroid. Deterministic end to end; iterative float
    numerics make it rows-only vs SQL oracles — semantics pinned in
    ``tests/test_clustering.py``.

    Pass ``release_into`` to receive the persisted frames (kmeans'
    scoreable projection + the scored assignment) for caller-owned
    ``unpersist()``.

    **Enforced scale contract** (the k ∝ N rule, in code rather than
    prose): ``k="auto"`` sets ``k = ceil(N / target_cluster_size)``
    from a count of the scoreable rows, so callers who scale the corpus
    100x get 100x the clusters — constant expected cluster size,
    constant per-cluster pair work. And regardless of how ``k`` was
    chosen, the realized within-cluster pair budget
    ``sum(size * (size - 1) / 2)`` is measured from the assignment
    (a k-row aggregate over the already-persisted frame) BEFORE the
    self-join is launched; if it exceeds ``max_pair_budget`` the
    operator refuses loudly with the measured number, the worst
    cluster, and the fix — the same refusal posture as the GEMM
    ``broadcast_bytes`` byte budget in ``operators/similarity.py``
    (never silently launch a quadratic job). ``max_pair_budget=None``
    disables the check.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if isinstance(k, str) and k != "auto":
        raise ValueError(f'k must be an int or "auto", got {k!r}')
    if target_cluster_size < 1:
        raise ValueError(
            f"target_cluster_size must be >= 1, got {target_cluster_size}"
        )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    base = (
        df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("__id"), _as_double(vec_col).alias("__v"))
        .withColumn("__norm", F.sqrt(dot(F.col("__v"), F.col("__v"))))
        .filter(F.col("__norm") > 0)
    )
    if k == "auto":
        base = base.persist()
        if release_into is not None:
            release_into.append(base)
        n_scoreable = base.count()
        k = max(1, -(-n_scoreable // target_cluster_size))  # ceil div
    assign = kmeans_lloyd(
        base,
        "__id",
        "__v",
        k=k,
        iters=iters,
        init_ids=init_ids,
        round_digits=round_digits,
        release_into=release_into,
    ).withColumnRenamed("__id", "id")
    scored = (
        assign.join(base, assign["id"] == base["__id"])
        .select("id", "cluster", "dist2", "__v", "__norm")
        .persist()
    )
    if release_into is not None:
        release_into.append(scored)
    if max_pair_budget is not None:
        # k-row aggregate over the persisted assignment: the EXACT pair
        # count the self-join below would produce candidates for.
        sizes = (
            scored.groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("long").alias("sz"))
            .agg(
                F.sum(F.col("sz") * (F.col("sz") - 1) / 2)
                .cast("long")
                .alias("pairs"),
                F.max("sz").alias("max_sz"),
                F.sum("sz").alias("n"),
            )
            .collect()[0]
        )
        if (sizes["pairs"] or 0) > max_pair_budget:
            raise ValueError(
                "semdedup refused: within-cluster pair budget "
                f"{sizes['pairs']:,} exceeds max_pair_budget="
                f"{max_pair_budget:,} (N={sizes['n']:,} rows in k={k} "
                f"clusters, largest cluster {sizes['max_sz']:,}). The "
                "within-cluster self-join is quadratic in cluster size "
                "— scale k with the corpus: pass k='auto' (k = N / "
                f"target_cluster_size, currently {target_cluster_size})"
                ", raise k, or raise max_pair_budget if the quadratic "
                "job is intended."
            )
    a, b = scored.alias("a"), scored.alias("b")
    cos = dot(F.col("a.__v"), F.col("b.__v")) / (
        F.col("a.__norm") * F.col("b.__norm")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(cos >= threshold)
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.dist2").alias("d1"),
            F.col("b.dist2").alias("d2"),
        )
        .persist()
    )
    if release_into is not None:
        release_into.append(pairs)
    # the member closer to the centroid loses; exact tie keeps min id
    removed = pairs.select(
        F.when(
            (F.col("d1") < F.col("d2"))
            | ((F.col("d1") == F.col("d2")) & (F.col("id1") > F.col("id2"))),
            F.col("id1"),
        )
        .otherwise(F.col("id2"))
        .alias("rid")
    ).distinct()
    neigh = (
        pairs.select(F.col("id1").alias("nid"))
        .unionAll(pairs.select(F.col("id2").alias("nid")))
        .groupBy("nid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_neighbors"))
    )
    return (
        scored.join(neigh, scored["id"] == neigh["nid"], "left")
        .join(removed, scored["id"] == removed["rid"], "left")
        .select(
            F.col("id").alias(id_col),
            F.col("cluster"),
            F.col("dist2"),
            F.coalesce(
                F.col("n_dup_neighbors"), F.lit(0).cast("long")
            ).alias("n_dup_neighbors"),
            F.col("rid").isNull().alias("keep"),
        )
    )
