"""Semantic invariants for the r11 experiment-statistics queries.

The oracle MATCH pins Spark == DuckDB; these pin that what BOTH
engines compute is the statistic it claims to be — the laws that hold
for any input, checked on the sf0.001 driver tables.
"""

from __future__ import annotations

from ghcn_d_etl_project_spark.plans import all_queries
from tests.conftest import SF_DIR


def _run(spark, name):
    return all_queries()[name].fn(spark, SF_DIR).collect()


def test_jackknife_interval_brackets_point(spark):
    """ci_lo <= theta_hat <= ci_hi, se >= 0, and the point estimate is
    the plain ratio of totals."""
    r = _run(spark, "jackknife_ratio_orders")[0]
    assert r.jk_se >= 0
    assert r.ci_lo <= r.theta_hat <= r.ci_hi
    assert r.n_buckets == 20
    assert r.n_orders > 0


def test_bh_fdr_stepup_laws(spark):
    """BH significance is a PREFIX of the p-value ranking (if rank k is
    significant, every smaller rank is), ranks are 1..m without gaps,
    and bh_crit grows linearly with rank."""
    rows = sorted(_run(spark, "bh_fdr_events"), key=lambda r: r.bh_rank)
    assert [r.bh_rank for r in rows] == list(range(1, len(rows) + 1))
    flags = [r.significant for r in rows]
    assert flags == sorted(flags, reverse=True), (
        f"BH flags must be a prefix: {flags}"
    )
    for r in rows:
        assert 0 <= r.p_value <= 1
        assert abs(r.bh_crit - round(0.05 * r.bh_rank / len(rows), 6)) < 1e-9


def test_qte_deciles_monotone(spark):
    """Per-arm decile values are nondecreasing in the decile (they are
    quantiles of one distribution), and qte = q_a - q_b."""
    rows = sorted(_run(spark, "qte_deciles_events"), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 10))
    for a, b in zip(rows, rows[1:]):
        assert a.q_a <= b.q_a and a.q_b <= b.q_b
    for r in rows:
        # qte is rounded from the UNROUNDED difference; recomputing from
        # the rounded per-arm values can differ by up to 1 ulp of 1e-6
        assert abs(r.qte - round(r.q_a - r.q_b, 6)) < 2e-6


def test_mde_positive_and_consistent(spark):
    """MDE is positive, relative MDE = absolute / mean_a, and the arm
    moments are sane (sd >= 0, means near each other under a null
    split)."""
    r = _run(spark, "mde_power_events")[0]
    assert r.mde_abs > 0
    assert r.sd_a >= 0 and r.sd_b >= 0
    assert abs(r.mde_rel - round(r.mde_abs / r.mean_a, 6)) < 1e-5


def test_ess_bounds(spark):
    """Kish ESS lies in [1, n] for every domain and equals n exactly
    when all weights are equal (not asserted here — weights vary), so
    ess_ratio is in (0, 1]."""
    for r in _run(spark, "ess_balance_docs"):
        assert 1.0 <= r.ess <= r.n_docs + 1e-6
        assert 0.0 < r.ess_ratio <= 1.0 + 1e-9
