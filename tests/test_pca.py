"""Fixed-point distributed PCA (operators/pca.py): numpy parity of the
exact-moment covariance, variance ordering, deterministic signs,
partitioning invariance, projection correctness, validation."""

from __future__ import annotations

import random

import numpy as np
import pytest

from ghcn_d_etl_project_spark.operators.pca import pca_fit, pca_project


def _data(rng, n=120, d=5):
    """Anisotropic cloud: variance concentrated on a planted direction."""
    u = np.asarray([1.0, 2.0, 0.5, -1.0, 0.25])
    u = u / np.linalg.norm(u)
    rows = []
    for i in range(n):
        x = np.asarray([rng.gauss(0, 0.1) for _ in range(d)])
        x = x + rng.gauss(0, 3.0) * u + np.asarray([1.0, -2.0, 0.0, 0.5, 3.0])
        rows.append((i, [float(v) for v in x]))
    return rows, u


def _numpy_fixed_point_cov(rows, scale=1_000_000):
    X = np.asarray([r[1] for r in rows], dtype=np.float64)
    n = len(X)
    s = np.floor(X * scale).astype(np.int64).sum(axis=0).astype(np.float64)
    G = (
        np.floor(np.einsum("ri,rj->rij", X, X) * scale)
        .astype(np.int64)
        .sum(axis=0)
        .astype(np.float64)
    )
    mean = s / (scale * n)
    Gf = G / scale
    cov = Gf / (n - 1) - np.outer(mean, mean) * (n / (n - 1))
    return (cov + cov.T) / 2.0, mean


def test_pca_fit_matches_numpy_reference(spark):
    rng = random.Random(7)
    rows, _ = _data(rng)
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    comps, evals, mean, n = pca_fit(df, "vec", out_dim=3)
    cov, ref_mean = _numpy_fixed_point_cov(rows)
    ref_evals, ref_evecs = np.linalg.eigh(cov)
    order = np.argsort(ref_evals)[::-1][:3]
    assert n == len(rows)
    np.testing.assert_allclose(mean, ref_mean, rtol=0, atol=1e-12)
    np.testing.assert_allclose(evals, ref_evals[order], rtol=0, atol=1e-9)
    for i, col in enumerate(order):
        v = ref_evecs[:, col]
        j = np.argmax(np.abs(v))
        if v[j] < 0:
            v = -v
        np.testing.assert_allclose(comps[i], v, rtol=0, atol=1e-9)


def test_pca_top_component_finds_planted_direction(spark):
    rng = random.Random(13)
    rows, u = _data(rng)
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    comps, evals, _, _ = pca_fit(df, "vec", out_dim=2)
    assert abs(float(np.dot(comps[0], u))) > 0.99
    assert evals[0] > 10 * evals[1]  # planted variance dominates


def test_pca_partitioning_invariance(spark):
    rng = random.Random(29)
    rows, _ = _data(rng, n=80)
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    c1, e1, m1, _ = pca_fit(df.coalesce(1), "vec", out_dim=2)
    c8, e8, m8, _ = pca_fit(df.repartition(8), "vec", out_dim=2)
    np.testing.assert_array_equal(m1, m8)
    np.testing.assert_array_equal(e1, e8)
    np.testing.assert_array_equal(c1, c8)


def test_pca_project_values_and_shape(spark):
    rng = random.Random(31)
    rows, _ = _data(rng, n=60)
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    comps, _, mean, _ = pca_fit(df, "vec", out_dim=2)
    got = {
        r["id"]: r["vec"]
        for r in pca_project(df, "id", "vec", out_dim=2).collect()
    }
    X = {r[0]: np.asarray(r[1]) for r in rows}
    for i, v in got.items():
        want = comps @ (X[i] - mean)
        assert len(v) == 2
        np.testing.assert_allclose(v, np.round(want, 6), rtol=0, atol=1e-6)


def test_pca_sign_convention(spark):
    """Every returned component's largest-|coeff| entry is positive."""
    rng = random.Random(37)
    rows, _ = _data(rng, n=60)
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    comps, _, _, _ = pca_fit(df, "vec", out_dim=4)
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0


def test_pca_validation(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0])], "id long, vec array<double>")
    with pytest.raises(ValueError, match="out_dim"):
        pca_fit(df, "vec", out_dim=3)
    with pytest.raises(ValueError, match=">= 2 rows"):
        pca_fit(df, "vec", out_dim=1)
    empty = spark.createDataFrame([], "id long, vec array<double>")
    with pytest.raises(ValueError, match="empty"):
        pca_fit(empty, "vec", out_dim=1)
