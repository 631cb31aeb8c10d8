"""Distributed PCA over an embedding column: exact second moments in
fixed point, driver-side eigendecomposition of the tiny d x d
covariance, shuffle-free projection.

Why not Spark MLlib's RowMatrix/PCA: float co-moment accumulation is
partition-order-dependent, so two runs of the same job can emit
different last-bit components — unverifiable downstream. Here every
row contributes ``floor(x_i * x_j * scale)`` as BIGINT (exact,
associative; the fixed-point trick shared with
``operators/graphalgo.py:pagerank_fixed_point`` and
``operators/clustering.py``), so the Gram matrix, the means, and hence
the covariance are a pure function of the row SET. The
eigendecomposition runs on the driver over the d x d matrix (d is the
embedding width — 64ish — never the row count) with a deterministic
sign convention per component.

Scale design:

  * the moment pass is ``mapInPandas``: each Arrow batch emits ONE
    partial — n, the d floored component sums, and the flattened d*d
    floored product sums — as (slot, value) pairs; a groupBy(slot).sum
    folds partials with map-side combine, so the shuffle carries
    (d*d + d + 1) x partitions longs regardless of row count;
  * chunked einsum inside the batch bounds the outer-product
    intermediate (`chunk x d x d`) to a few MB;
  * the projection is the ``random_projection`` pattern: the component
    matrix rides the plan as a literal, per-row JVM fold, no UDF, no
    shuffle;
  * overflow bound: |floor(x_i x_j * scale)| <= scale * max|x|^2, so
    BIGINT sums are safe up to ~9e18 / (scale * max|x|^2) rows —
    ~9e12 rows at scale=1e6 and unit-ish embeddings; raise ``scale``
    only with that budget in mind.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.common import double_literal

__all__ = ["pca_fit", "pca_project"]


def _as_double(col: str):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def pca_fit(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    scale: int = 1_000_000,
    chunk: int = 1024,
):
    """Fit: returns ``(components, eigenvalues, mean, n)`` — components
    is an (out_dim x d) numpy array of unit eigenvectors of the sample
    covariance, eigenvalue-descending, each signed so its
    largest-magnitude coefficient is positive (the deterministic sign
    convention; eigenvectors are otherwise sign-ambiguous).
    """
    import numpy as np
    import pandas as pd

    base = df.filter(F.col(vec_col).isNotNull()).select(
        _as_double(vec_col).alias("__v")
    )
    first = base.limit(1).collect()
    if not first:
        raise ValueError("cannot fit PCA on an empty input")
    d = len(first[0]["__v"])
    if not 1 <= out_dim <= d:
        raise ValueError(f"out_dim must be in [1, {d}], got {out_dim}")

    fscale = float(scale)

    def partials(batches):
        n = 0
        s = np.zeros(d, dtype=np.int64)
        G = np.zeros((d, d), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
            )
            n += len(X)
            s += np.floor(X * fscale).astype(np.int64).sum(axis=0)
            for i in range(0, len(X), chunk):
                B = X[i : i + chunk]
                P = np.einsum("ri,rj->rij", B, B) * fscale
                G += np.floor(P).astype(np.int64).sum(axis=0)
        slots = np.arange(1 + d + d * d, dtype=np.int64)
        vals = np.concatenate(([n], s, G.reshape(-1)))
        yield pd.DataFrame({"slot": slots, "val": vals})

    summed = (
        base.mapInPandas(partials, schema="slot long, val long")
        .groupBy("slot")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    flat = np.zeros(1 + d + d * d, dtype=np.float64)
    for r in summed:
        flat[int(r["slot"])] = float(r["val"])
    n = flat[0]
    if n < 2:
        raise ValueError(f"need >= 2 rows to fit PCA, got {int(n)}")
    mean = flat[1 : 1 + d] / (fscale * n)
    G = flat[1 + d :].reshape(d, d) / fscale
    cov = G / (n - 1) - np.outer(mean, mean) * (n / (n - 1))
    cov = (cov + cov.T) / 2.0  # enforce exact symmetry for eigh
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:out_dim]
    comps = evecs[:, order].T
    evals = evals[order]
    for i in range(len(comps)):
        j = np.argmax(np.abs(comps[i]))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return comps, evals, mean, int(n)


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int,
    scale: int = 1_000_000,
    round_digits: int | None = 6,
) -> DataFrame:
    """Fit-and-project: each vector is centered on the fitted mean and
    projected onto the top ``out_dim`` principal components. The
    component matrix and mean ride the plan as LITERALS (the
    ``random_projection`` pattern) — the projection itself is a
    shuffle-free, UDF-free per-row fold.

    Output: ``(id, vec array<double> of out_dim)``.
    """
    comps, _evals, mean, _n = pca_fit(df, vec_col, out_dim, scale=scale)
    # plan literals as ONE parsed SQL string each (r14, the
    # ivf._cell_ranking fix): D-suffixed doubles round-trip exactly via
    # shortest-repr, and (out_dim + 1) x dim F.lit py4j round trips were
    # ~1s of pure construction time per invocation
    mean_lit = F.expr(
        "array(" + ", ".join(double_literal(m) for m in mean) + ")"
    )
    centered = F.zip_with(
        _as_double(vec_col), mean_lit, lambda x, m: x - m
    )
    mat = F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(double_literal(v) for v in row) + ")"
            for row in comps
        )
        + ")"
    )
    proj = F.transform(
        F.sequence(F.lit(1), F.lit(int(comps.shape[0]))),
        lambda j: F.aggregate(
            F.zip_with(centered, F.element_at(mat, j), lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    if round_digits is not None:
        proj = F.transform(proj, lambda x: F.round(x, round_digits))
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), proj.alias("vec")
    )
