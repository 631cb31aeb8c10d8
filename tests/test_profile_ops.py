"""Bivariate profiling operators (operators/quality.py): exact-moment
correlation pairs and fixed-width histograms. The corr_matrix /
histogram_bins oracle queries pin engine parity; these pin the operator
semantics against numpy and hand-computed fixtures."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.quality import (
    corr_pairs,
    histogram_fixed_width,
)


def test_corr_pairs_matches_numpy(spark):
    xs = [1.0, 2.0, 3.0, 4.0, 5.0, 8.0]
    ys = [2.0, 1.0, 4.0, 3.0, 7.0, 6.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    r = corr_pairs(df, [("x", "y")]).collect()[0]
    assert r.n == 6
    assert r.corr == pytest.approx(np.corrcoef(xs, ys)[0, 1], abs=1e-6)
    assert r.covar_pop == pytest.approx(np.cov(xs, ys, bias=True)[0, 1], abs=1e-6)


def test_corr_pairs_null_rows_pairwise_complete(spark):
    """A NULL on either side drops the row for THAT pair only."""
    df = spark.createDataFrame(
        [(1.0, 2.0, 10.0), (2.0, None, 20.0), (3.0, 6.0, None), (4.0, 8.0, 40.0)],
        "x double, y double, z double",
    )
    out = {(r.col_x, r.col_y): r for r in corr_pairs(df, [("x", "y"), ("x", "z")]).collect()}
    rxy, rxz = out[("x", "y")], out[("x", "z")]
    assert rxy.n == 3 and rxz.n == 3
    # (x,y) over rows 1,3,4 is exactly linear y=2x
    assert rxy.corr == pytest.approx(1.0, abs=1e-6)
    # (x,z) over rows 1,2,4 is exactly linear z=10x
    assert rxz.corr == pytest.approx(1.0, abs=1e-6)


def test_corr_pairs_zero_variance_is_null(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
    )
    r = corr_pairs(df, [("x", "y")]).collect()[0]
    assert r.corr is None  # undefined, not 0 and not NaN
    assert r.covar_pop == pytest.approx(0.0, abs=1e-9)


def test_corr_pairs_one_scan_many_pairs(spark):
    """All pairs fold into ONE aggregate: a single Exchange in the plan."""
    df = spark.range(100).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2).cast("double").alias("y"),
        (F.col("id") % 7).cast("double").alias("z"),
    )
    out = corr_pairs(df, [("x", "y"), ("x", "z"), ("y", "z")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan[:1200]
    assert out.count() == 3


def test_histogram_counts_and_edges(spark):
    df = spark.createDataFrame(
        [(v,) for v in [0.0, 5.0, 9.99, 10.0, 15.0, 25.0, -3.0, 99.0, None]],
        "x double",
    )
    # [0, 30) in 3 bins of 10; -3 clamps into bin 0, 99 into bin 2
    rows = {r.bin: r for r in histogram_fixed_width(df, "x", 0.0, 30.0, 3).collect()}
    assert rows[0].n == 4  # 0, 5, 9.99, -3
    assert rows[1].n == 2  # 10, 15
    assert rows[2].n == 2  # 25, 99
    assert (rows[0].bin_lo, rows[0].bin_hi) == (0.0, 10.0)
    assert (rows[2].bin_lo, rows[2].bin_hi) == (20.0, 30.0)
    assert sum(r.n for r in rows.values()) == 8  # NULL excluded
    assert math.isclose(sum(r.share for r in rows.values()), 1.0, abs_tol=1e-6)


def test_histogram_validation(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        histogram_fixed_width(df, "x", 0.0, 10.0, 0)
    with pytest.raises(ValueError):
        histogram_fixed_width(df, "x", 10.0, 10.0, 5)


def test_avg_ranks_tie_convention_matches_pandas(spark):
    import pandas as pd

    from ghcn_d_etl_project_spark.operators.quality import avg_ranks

    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(xs)], "i long, x double")
    got = {r.i: r.x__rank for r in avg_ranks(df, "x").collect()}
    want = pd.Series(xs).rank(method="average")
    assert all(got[i] == want[i] for i in range(len(xs)))


def test_spearman_matches_pandas(spark):
    import pandas as pd

    xs = [1.0, 2.0, 2.0, 4.0, 7.0, 7.0, 7.0, 9.0]
    ys = [3.0, 1.0, 4.0, 4.0, 6.0, 5.0, 9.0, 8.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    from ghcn_d_etl_project_spark.operators.quality import spearman_pairs

    r = spearman_pairs(df, [("x", "y")]).collect()[0]
    want = pd.DataFrame({"x": xs, "y": ys}).corr(method="spearman").loc["x", "y"]
    assert r.n == 8
    assert r.spearman_rho == pytest.approx(want, abs=1e-6)


def test_spearman_monotone_invariance(spark):
    """rho(x, f(x)) == 1 for strictly increasing f, regardless of how
    nonlinear f is — the property Pearson lacks."""
    from ghcn_d_etl_project_spark.operators.quality import (
        corr_pairs,
        spearman_pairs,
    )

    df = spark.range(1, 40).select(
        F.col("id").cast("double").alias("x"),
        F.exp(F.col("id").cast("double") / 5.0).alias("y"),
    )
    rho = spearman_pairs(df, [("x", "y")]).collect()[0].spearman_rho
    pearson = corr_pairs(df, [("x", "y")]).collect()[0].corr
    assert rho == pytest.approx(1.0, abs=1e-6)
    assert pearson < 0.999  # strictly less: the relationship is nonlinear


def test_spearman_matrix_fact_side_never_sorts(spark):
    """Ranks come from broadcast value tables: the executed plan must
    join them with BroadcastHashJoin and contain no SortMergeJoin — the
    fact table is never globally sorted or re-shuffled for ranking."""
    from ghcn_d_etl_project_spark.plans import all_queries

    df = all_queries()["spearman_matrix"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:1200]


def _assoc_reference(pairs):
    """Pure-python chi2/V/MI/entropies for a list of (x, y) rows."""
    from collections import Counter

    n = len(pairs)
    cells, rx, cy = Counter(pairs), Counter(), Counter()
    for x, y in pairs:
        rx[x] += 1
        cy[y] += 1
    chi2 = 0.0
    for x in rx:
        for y in cy:
            e = rx[x] * cy[y] / n
            o = cells.get((x, y), 0)
            chi2 += (o - e) ** 2 / e
    mi = sum(
        (o / n) * math.log(o * n / (rx[x] * cy[y])) for (x, y), o in cells.items()
    )
    hx = -sum((c / n) * math.log(c / n) for c in rx.values())
    hy = -sum((c / n) * math.log(c / n) for c in cy.values())
    k = min(len(rx), len(cy))
    v = math.sqrt(chi2 / (n * (k - 1))) if k > 1 else None
    return chi2, v, mi, hx, hy, (len(rx) - 1) * (len(cy) - 1)


def test_categorical_association_matches_reference(spark):
    """Planted 3x3 table WITH a structural zero cell — the algebraic
    zero-cell fold-in must reproduce the full-grid chi-square."""
    from ghcn_d_etl_project_spark.operators.quality import (
        categorical_association,
    )

    pairs = (
        [("a", "p")] * 12 + [("a", "q")] * 3 + [("a", "r")] * 5
        + [("b", "p")] * 2 + [("b", "q")] * 9  # (b, r) never occurs
        + [("c", "p")] * 4 + [("c", "q")] * 1 + [("c", "r")] * 14
    )
    df = spark.createDataFrame(pairs, "x string, y string")
    r = categorical_association(df, "x", "y").collect()[0]
    chi2, v, mi, hx, hy, dof = _assoc_reference(pairs)
    assert r.n == len(pairs) and r.dof == dof
    assert r.chi2 == pytest.approx(chi2, abs=1e-6)
    assert r.cramers_v == pytest.approx(v, abs=1e-6)
    assert r.mutual_info == pytest.approx(mi, abs=1e-6)
    assert r.h_x == pytest.approx(hx, abs=1e-6)
    assert r.h_y == pytest.approx(hy, abs=1e-6)


def test_categorical_association_independent_is_zero(spark):
    """An exact product distribution: chi2 == 0 and MI == 0."""
    from ghcn_d_etl_project_spark.operators.quality import (
        categorical_association,
    )

    pairs = [(x, y) for x in ("a", "b") for y in ("p", "q", "r") for _ in range(5)]
    r = categorical_association(
        spark.createDataFrame(pairs, "x string, y string"), "x", "y"
    ).collect()[0]
    assert r.chi2 == pytest.approx(0.0, abs=1e-9)
    assert r.mutual_info == pytest.approx(0.0, abs=1e-9)
    assert r.cramers_v == pytest.approx(0.0, abs=1e-9)


def test_categorical_association_self_mi_is_entropy(spark):
    """MI(x, x) == H(x): the information-theory identity."""
    from ghcn_d_etl_project_spark.operators.quality import (
        categorical_association,
    )

    vals = ["a"] * 7 + ["b"] * 2 + ["c"] * 11
    df = spark.createDataFrame([(v, v) for v in vals], "x string, y string")
    r = categorical_association(df, "x", "y").collect()[0]
    assert r.mutual_info == pytest.approx(r.h_x, abs=1e-6)
    assert r.h_x == pytest.approx(r.h_y, abs=1e-9)


def test_group_trend_matches_numpy_polyfit(spark):
    from ghcn_d_etl_project_spark.operators.quality import group_trend

    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    ys = [1.0, 2.5, 3.1, 5.2, 6.9]
    rows = [("g", x, y) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = group_trend(df, ["g"], "x", "y").collect()[0]
    slope, intercept = np.polyfit(xs, ys, 1)
    assert r.n == 5
    assert r.slope == pytest.approx(slope, abs=1e-6)
    assert r.intercept == pytest.approx(intercept, abs=1e-6)


def test_group_trend_degenerate_groups_null(spark):
    """n=1 and zero-x-variance groups: NULL slope/intercept, not a
    divide-by-zero NaN."""
    from ghcn_d_etl_project_spark.operators.quality import group_trend

    df = spark.createDataFrame(
        [("single", 1.0, 5.0), ("flatx", 2.0, 1.0), ("flatx", 2.0, 9.0)],
        "g string, x double, y double",
    )
    got = {r.g: r for r in group_trend(df, ["g"], "x", "y").collect()}
    assert got["single"].slope is None and got["single"].intercept is None
    assert got["flatx"].slope is None and got["flatx"].intercept is None


def test_group_trend_null_rows_dropped_pairwise(spark):
    from ghcn_d_etl_project_spark.operators.quality import group_trend

    df = spark.createDataFrame(
        [("g", 0.0, 0.0), ("g", 1.0, 2.0), ("g", None, 99.0), ("g", 2.0, None)],
        "g string, x double, y double",
    )
    r = group_trend(df, ["g"], "x", "y").collect()[0]
    assert r.n == 2 and r.slope == pytest.approx(2.0) and r.intercept == pytest.approx(0.0)


def test_group_quantiles_matches_numpy(spark):
    """Spark's exact percentile == numpy's 'linear' (continuous) method
    per group — the interpolation definition both engines share."""
    from ghcn_d_etl_project_spark.plans import all_queries
    from ghcn_d_etl_project_spark.plans._util import t as load

    sf = "/root/testdata/sf0.001"
    out = {r.event_type: r for r in all_queries()["group_quantiles"].fn(spark, sf).collect()}
    vals = load(spark, sf, "events").select("event_type", "value").toPandas()
    for et, grp in vals.groupby("event_type"):
        v = grp["value"].dropna().to_numpy()
        assert out[et].n == len(v)
        for q, colname in ((0.1, "p10"), (0.5, "p50"), (0.9, "p90")):
            assert getattr(out[et], colname) == pytest.approx(
                np.quantile(v, q, method="linear"), abs=1e-6
            )


# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------


def _one_col(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "x double")


def test_psi_identical_distributions_is_zero(spark):
    from ghcn_d_etl_project_spark.operators.quality import psi_drift

    vals = [5, 15, 15, 25, 35, 35, 35]
    out = psi_drift(
        _one_col(spark, vals), _one_col(spark, vals), "x", 0.0, 40.0, 4
    ).collect()
    assert all(r["psi_term"] == 0.0 for r in out)
    assert all(r["psi_total"] == 0.0 for r in out)


def test_psi_hand_computed(spark):
    """base: 3 in bin0, 1 in bin1; cur: 1 in bin0, 3 in bin1 ->
    p=(0.75,0.25), q=(0.25,0.75); term = 0.5*ln(3) each ~ 0.549306."""
    import math

    from ghcn_d_etl_project_spark.operators.quality import psi_drift

    base = _one_col(spark, [1, 2, 3, 15])
    cur = _one_col(spark, [4, 11, 12, 13])
    out = {
        r["bin"]: r
        for r in psi_drift(base, cur, "x", 0.0, 20.0, 2).collect()
    }
    term = round(0.5 * math.log(3), 6)
    assert out[0]["n_base"] == 3 and out[0]["n_cur"] == 1
    assert out[0]["psi_term"] == term and out[1]["psi_term"] == term
    assert out[0]["psi_total"] == round(2 * term, 6)


def test_psi_one_sided_empty_bin_is_finite(spark):
    from ghcn_d_etl_project_spark.operators.quality import psi_drift

    base = _one_col(spark, [1, 1, 1, 11])
    cur = _one_col(spark, [12, 13])  # bin 0 empty on the cur side
    out = {
        r["bin"]: r for r in psi_drift(base, cur, "x", 0.0, 20.0, 2).collect()
    }
    import math

    assert math.isfinite(out[0]["psi_term"]) and out[0]["psi_term"] > 0
    assert out[0]["q"] == 1e-6


def test_psi_nulls_dropped_and_edges_clamped(spark):
    from ghcn_d_etl_project_spark.operators.quality import psi_drift

    base = spark.createDataFrame(
        [(None,), (-5.0,), (999.0,)], "x double"
    )
    cur = _one_col(spark, [5.0])
    out = {
        r["bin"]: r for r in psi_drift(base, cur, "x", 0.0, 20.0, 2).collect()
    }
    # -5 clamps into bin 0, 999 into bin 1, NULL dropped
    assert out[0]["n_base"] == 1 and out[1]["n_base"] == 1
    assert sum(r["n_base"] for r in out.values()) == 2


def test_psi_validation(spark):
    from ghcn_d_etl_project_spark.operators.quality import psi_drift

    d = _one_col(spark, [1.0])
    with pytest.raises(ValueError, match="n_bins"):
        psi_drift(d, d, "x", 0.0, 1.0, 0)
    with pytest.raises(ValueError, match="n_bins"):
        psi_drift(d, d, "x", 1.0, 1.0, 2)
    with pytest.raises(ValueError, match="eps"):
        psi_drift(d, d, "x", 0.0, 1.0, 2, eps=0.0)


def test_psi_plan_one_scan_per_side(spark):
    """One hash aggregate on the bin key over the tagged UNION (each
    side scanned exactly once), then ONE SinglePartition exchange of
    the <= n_bins aggregated rows feeding both total windows — no join
    of two histogram jobs, no re-planned input subtree."""
    from ghcn_d_etl_project_spark.operators.quality import psi_drift

    plan = (
        psi_drift(_one_col(spark, [1.0]), _one_col(spark, [2.0]), "x", 0.0, 10.0, 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 1
    assert plan.count("Scan ExistingRDD") == 2
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# histogram_equi_depth
# ---------------------------------------------------------------------------


def test_equidepth_balanced_bins(spark):
    """80 distinct values into 8 bins -> exactly 10 per bin, shares 0.125."""
    from ghcn_d_etl_project_spark.operators.quality import histogram_equi_depth

    df = _one_col(spark, range(80))
    out = {r["bin"]: r for r in histogram_equi_depth(df, "x", 8).collect()}
    assert sorted(out) == list(range(8))
    assert all(r["n"] == 10 and r["share"] == 0.125 for r in out.values())
    # bins tile the data: consecutive min/max ranges don't overlap
    for i in range(7):
        assert out[i]["max_val"] < out[i + 1]["min_val"]


def test_equidepth_skew_proof(spark):
    """Heavy skew (90% of mass at one value): fixed-width piles ~all
    rows into one bar; equi-depth still spreads the tail into its own
    bins. The duplicated median value spans several quantile edges, so
    its single bin legitimately holds the duplicate mass."""
    from ghcn_d_etl_project_spark.operators.quality import (
        histogram_equi_depth,
        histogram_fixed_width,
    )

    vals = [5.0] * 90 + [float(v) for v in range(100, 110)]
    df = _one_col(spark, vals)
    fixed = {r["bin"]: r["n"] for r in histogram_fixed_width(df, "x", 0.0, 110.0, 8).collect()}
    assert max(fixed.values()) == 90  # one bar has ~everything
    eq = histogram_equi_depth(df, "x", 8).collect()
    tail_bins = [r for r in eq if r["min_val"] >= 100.0]
    assert len(tail_bins) >= 1 and sum(r["n"] for r in tail_bins) == 10


def test_equidepth_exact_and_approx_agree_on_clean_data(spark):
    """At small n the sketch is exact, so both paths must coincide —
    pins that the approx twin is the same construction."""
    from ghcn_d_etl_project_spark.operators.quality import histogram_equi_depth

    df = _one_col(spark, range(64))
    a = sorted(tuple(r) for r in histogram_equi_depth(df, "x", 4, exact=True).collect())
    b = sorted(tuple(r) for r in histogram_equi_depth(df, "x", 4, exact=False).collect())
    assert a == b


def test_equidepth_validation_and_plan(spark):
    from ghcn_d_etl_project_spark.operators.quality import histogram_equi_depth

    df = _one_col(spark, range(10))
    with pytest.raises(ValueError, match="n_bins"):
        histogram_equi_depth(df, "x", 1)
    plan = (
        histogram_equi_depth(df, "x", 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # edge array broadcasts; binning is a higher-order filter, no UDF
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# psi_drift_categorical
# ---------------------------------------------------------------------------


def _cat(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x string")


def test_psi_cat_hand_computed_with_other_collapse(spark):
    """base: a x3, b x1; cur: a x1, b x3 (top_n=1 keeps only 'a' —
    'b' collapses to __other). p=(0.75,0.25), q=(0.25,0.75) ->
    each |term| = 0.5*ln(3)."""
    import math

    from ghcn_d_etl_project_spark.operators.quality import (
        psi_drift_categorical,
    )

    base = _cat(spark, ["a", "a", "a", "b"])
    cur = _cat(spark, ["a", "b", "b", "b"])
    out = {
        r["value"]: r
        for r in psi_drift_categorical(base, cur, "x", top_n=1).collect()
    }
    term = round(0.5 * math.log(3), 6)
    assert set(out) == {"a", "__other"}
    assert out["a"]["n_base"] == 3 and out["a"]["n_cur"] == 1
    assert out["a"]["psi_term"] == term
    assert out["__other"]["psi_term"] == term
    assert out["a"]["psi_total"] == round(2 * term, 6)


def test_psi_cat_null_is_its_own_category(spark):
    from ghcn_d_etl_project_spark.operators.quality import (
        psi_drift_categorical,
    )

    base = _cat(spark, ["a", "a", None, None])
    cur = _cat(spark, ["a", "a", "a", None])
    out = {
        r["value"]: r
        for r in psi_drift_categorical(base, cur, "x", top_n=5).collect()
    }
    assert out["__null"]["n_base"] == 2 and out["__null"]["n_cur"] == 1
    assert out["__null"]["p"] == 0.5 and out["__null"]["q"] == 0.25


def test_psi_cat_top_n_cut_is_deterministic_on_ties(spark):
    """Equal combined counts break ties by value ascending: with
    top_n=1 over tied 'x' and 'y', 'x' is kept every run."""
    from ghcn_d_etl_project_spark.operators.quality import (
        psi_drift_categorical,
    )

    base = _cat(spark, ["x", "y"])
    cur = _cat(spark, ["y", "x"])
    for _ in range(3):
        vals = {
            r["value"]
            for r in psi_drift_categorical(base, cur, "x", top_n=1).collect()
        }
        assert vals == {"x", "__other"}


def test_psi_cat_validation(spark):
    from ghcn_d_etl_project_spark.operators.quality import (
        psi_drift_categorical,
    )

    d = _cat(spark, ["a"])
    with pytest.raises(ValueError, match="top_n"):
        psi_drift_categorical(d, d, "x", top_n=0)
    with pytest.raises(ValueError, match="eps"):
        psi_drift_categorical(d, d, "x", eps=0.0)


def test_psi_cat_plan_one_data_pass(spark):
    """Each input side is scanned exactly once; the only data-sized
    exchange is the value aggregate — ranking/collapse/share windows
    ride the aggregated vocabulary frame. No joins anywhere."""
    from ghcn_d_etl_project_spark.operators.quality import (
        psi_drift_categorical,
    )

    plan = (
        psi_drift_categorical(_cat(spark, ["a"]), _cat(spark, ["b"]), "x")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") == 2
    assert plan.count("Exchange hashpartitioning") <= 2  # value agg + regroup
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# null_patterns
# ---------------------------------------------------------------------------


def test_null_patterns_counts_combinations(spark):
    from ghcn_d_etl_project_spark.operators.quality import null_patterns

    df = spark.createDataFrame(
        [
            (1.0, "a", 5),
            (2.0, None, None),
            (None, None, None),
            (3.0, "b", None),
            (4.0, None, None),
        ],
        "x double, y string, z int",
    )
    out = {r["pattern"]: r for r in null_patterns(df, ["x", "y", "z"]).collect()}
    assert out["111"]["n"] == 1 and out["111"]["missing"] == ""
    assert out["100"]["n"] == 2 and out["100"]["missing"] == "y,z"
    assert out["000"]["missing"] == "x,y,z"
    assert out["110"]["missing"] == "z"
    assert sum(r["n"] for r in out.values()) == 5
    assert out["100"]["share"] == 0.4


def test_null_patterns_validation_and_plan(spark):
    from ghcn_d_etl_project_spark.operators.quality import null_patterns

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="empty"):
        null_patterns(df, [])
    with pytest.raises(ValueError, match="not in input"):
        null_patterns(df, ["nope"])
    plan = (
        null_patterns(df, ["x"])._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# key_containment
# ---------------------------------------------------------------------------


def test_key_containment_fk_shape(spark):
    """Child keys all present in parent -> containment_l_in_r = 1.0;
    parent has extra keys -> r_in_l < 1; duplicates drop uniqueness."""
    from ghcn_d_etl_project_spark.operators.quality import key_containment

    child = spark.createDataFrame([(1,), (1,), (2,), (None,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,), (4,)], "p long")
    r = key_containment(child, parent, "k", "p").collect()[0]
    assert (r["n_left"], r["n_left_distinct"]) == (3, 2)  # NULL excluded
    assert (r["n_right"], r["n_right_distinct"]) == (4, 4)
    assert r["n_shared"] == 2
    assert r["containment_l_in_r"] == 1.0
    assert r["containment_r_in_l"] == 0.5
    assert r["uniqueness_l"] == round(2 / 3, 6) and r["uniqueness_r"] == 1.0


def test_key_containment_disjoint_and_empty(spark):
    from ghcn_d_etl_project_spark.operators.quality import key_containment

    a = spark.createDataFrame([(1,)], "k long")
    b = spark.createDataFrame([(9,)], "p long")
    r = key_containment(a, b, "k", "p").collect()[0]
    assert r["n_shared"] == 0 and r["containment_l_in_r"] == 0.0
    empty = spark.createDataFrame([], "k long")
    r2 = key_containment(empty, b, "k", "p").collect()[0]
    assert r2["n_left"] == 0 and r2["containment_l_in_r"] is None


def test_key_containment_no_cartesian_on_keys(spark):
    """The shared count must be a semi join of DISTINCT key sets — no
    data-sized cross product, no Python eval."""
    from ghcn_d_etl_project_spark.operators.quality import key_containment

    a = spark.createDataFrame([(i % 5,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i % 7,) for i in range(100)], "p long")
    plan = (
        key_containment(a, b, "k", "p")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# ks_drift
# ---------------------------------------------------------------------------


def _ks_reference(a, b):
    """Brute-force two-sample KS via numpy (right-continuous CDFs at
    every distinct pooled value)."""
    import numpy as np

    a, b = np.asarray(a, float), np.asarray(b, float)
    xs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    d = np.abs(fa - fb)
    i = int(np.argmax(d))  # first occurrence = smallest value at max
    return float(d[i]), float(xs[i])


def test_ks_hand_computed(spark):
    from ghcn_d_etl_project_spark.operators.quality import ks_drift

    base = _one_col(spark, [1, 2, 3, 4])
    cur = _one_col(spark, [3, 4, 5, 6])
    r = ks_drift(base, cur, "x").collect()[0]
    d, at = _ks_reference([1, 2, 3, 4], [3, 4, 5, 6])
    assert r["d_stat"] == round(d, 6) == 0.5
    assert r["at_value"] == at == 2.0
    assert r["n_base"] == 4 and r["n_cur"] == 4


def test_ks_matches_numpy_on_random_data(spark):
    import random

    from ghcn_d_etl_project_spark.operators.quality import ks_drift

    rng = random.Random(7)
    a = [round(rng.gauss(0, 1), 3) for _ in range(300)]
    b = [round(rng.gauss(0.4, 1.3), 3) for _ in range(200)]
    r = ks_drift(_one_col(spark, a), _one_col(spark, b), "x").collect()[0]
    d, at = _ks_reference(a, b)
    assert r["d_stat"] == round(d, 6)
    assert r["at_value"] == at


def test_ks_identical_zero_disjoint_one(spark):
    from ghcn_d_etl_project_spark.operators.quality import ks_drift

    same = [1.0, 2.0, 5.0]
    r0 = ks_drift(_one_col(spark, same), _one_col(spark, same), "x").collect()[0]
    assert r0["d_stat"] == 0.0
    r1 = ks_drift(
        _one_col(spark, [1.0, 2.0]), _one_col(spark, [10.0, 11.0]), "x"
    ).collect()[0]
    assert r1["d_stat"] == 1.0


def test_ks_no_data_sized_single_partition(spark):
    """The whole point vs the textbook global sort: the only
    SinglePartition exchanges are the BOUNDED bucket-summary prefix and
    1-row aggregates — never a rangepartitioning or a data-sized
    orderBy window."""
    from ghcn_d_etl_project_spark.operators.quality import ks_drift

    plan = (
        ks_drift(
            _one_col(spark, [1.0, 2.0]), _one_col(spark, [3.0]), "x",
            bucket_width=1.0,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" not in plan
    assert plan.count("Exchange SinglePartition") <= 3
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# Robust (median/MAD) outliers
# ---------------------------------------------------------------------------


def test_robust_outliers_hand_case(spark):
    """median 10, deviations [5,1,0,1,5,90] -> MAD 3; only the wild
    value exceeds 3*MAD. A mean/stddev fence would move toward the
    contamination; the median/MAD fence must not."""
    from ghcn_d_etl_project_spark.operators.quality import robust_outliers

    rows = [(1, 5.0), (2, 9.0), (3, 10.0), (4, 11.0), (5, 15.0), (6, 100.0)]
    df = spark.createDataFrame(rows, "id int, v double")
    got = {r.id: (r.med, r.mad, r.is_outlier)
           for r in robust_outliers(df, "v").collect()}
    assert got[3] == (10.5, 3.0, 0)
    assert got[6][2] == 1
    assert sum(o for _, _, o in got.values()) == 1


def test_robust_outliers_constant_group_flags_nothing(spark):
    """MAD == 0 (majority-constant group): robust_z NULL, no flags —
    NOT everything-flagged, which is what naive dev > 0 would give."""
    from ghcn_d_etl_project_spark.operators.quality import robust_outliers

    rows = [("a", 5.0), ("a", 5.0), ("a", 5.0), ("a", 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = robust_outliers(df, "v", group_cols=["g"]).collect()
    assert all(r.is_outlier == 0 for r in out)
    assert all(r.robust_z is None for r in out)


def test_robust_outliers_exact_vs_approx_same_shape(spark):
    """The percentile_approx twin keeps schema and flag monotonicity
    (the sketch may move the fence slightly; it must not invert it for
    an extreme point)."""
    from ghcn_d_etl_project_spark.operators.quality import robust_outliers
    from ghcn_d_etl_project_spark.plans._util import t

    o = t(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_totalprice"
    )
    exact = robust_outliers(o, "o_totalprice")
    approx = robust_outliers(o, "o_totalprice", exact=False)
    assert exact.columns == approx.columns
    ex = {r.o_orderkey: r.is_outlier for r in exact.collect()}
    ap = {r.o_orderkey: r.is_outlier for r in approx.collect()}
    agree = sum(1 for kk in ex if ex[kk] == ap[kk]) / len(ex)
    assert agree > 0.95, agree


# ---------------------------------------------------------------------------
# Entropy profile
# ---------------------------------------------------------------------------


def test_entropy_profile_known_distributions(spark):
    import math

    from ghcn_d_etl_project_spark.operators.quality import entropy_profile

    rows = [("a", "x", 1), ("a", "y", 2), ("b", "x", 3), ("b", "y", 4)]
    df = spark.createDataFrame(rows, "u string, v string, k int")
    got = {r.col: r for r in entropy_profile(df, ["u", "v", "k"]).collect()}
    # uniform over 2 -> exactly 1 bit, norm 1.0
    assert got["u"].entropy_bits == 1.0 and got["u"].norm_entropy == 1.0
    assert got["v"].entropy_bits == 1.0
    # uniform over 4 -> 2 bits
    assert abs(got["k"].entropy_bits - 2.0) < 1e-6
    assert abs(got["k"].max_entropy_bits - math.log2(4)) < 1e-9


def test_entropy_profile_constant_and_null(spark):
    from ghcn_d_etl_project_spark.operators.quality import entropy_profile

    rows = [("c", None), ("c", None), ("c", "z")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = {r.col: r for r in entropy_profile(df, ["a", "b"]).collect()}
    # constant column: 0 bits, norm NULL (log2(1) == 0 denominator)
    assert got["a"].entropy_bits == 0.0
    assert got["a"].norm_entropy is None
    assert got["a"].n_distinct == 1
    # NULL is a category: b has {__null: 2, z: 1}, entropy in (0, 1)
    assert got["b"].n_distinct == 2
    assert 0.9 < got["b"].entropy_bits < 0.92  # H(1/3) = 0.918...


# ---------------------------------------------------------------------------
# Benford audit
# ---------------------------------------------------------------------------


def test_benford_digit_extraction_and_spine(spark):
    from ghcn_d_etl_project_spark.operators.quality import benford_audit

    rows = [
        (123.45,), (0.0042,), (-987.0,), (9.9e-10,), (1e20,),
        (0.0,), (None,),                     # excluded: no significant digit
    ]
    df = spark.createDataFrame(rows, "v double")
    got = {r.digit: r for r in benford_audit(df, "v").collect()}
    assert set(got) == set(range(1, 10))     # dense spine: all 9 rows
    assert got[1].n == 2 and got[4].n == 1 and got[9].n == 2
    assert got[2].n == 0                     # absent digit present w/ 0
    assert got[1].n_used == 5                # zeros/NULLs excluded
    assert abs(got[1].benford_p - 0.30103) < 1e-5


def test_benford_conforming_sequence_low_chi2(spark):
    """A doubling (multi-scale) sequence is near-Benford; a constant-
    leading-digit sequence is maximally non-Benford. The chi2 must
    separate them by a wide margin."""
    from ghcn_d_etl_project_spark.operators.quality import benford_audit

    doubling = [(1.0 * 2 ** i,) for i in range(200)]
    constant = [(5.0 + i * 0.001,) for i in range(200)]   # all lead with 5
    chi_good = benford_audit(
        spark.createDataFrame(doubling, "v double"), "v"
    ).collect()[0].chi2
    chi_bad = benford_audit(
        spark.createDataFrame(constant, "v double"), "v"
    ).collect()[0].chi2
    assert chi_good < 20.0, chi_good
    assert chi_bad > 200.0, chi_bad
    assert chi_bad > 10 * chi_good


# ---------------------------------------------------------------------------
# weighted_median (r9)
# ---------------------------------------------------------------------------


def test_weighted_median_hand_cases(spark):
    """values 1,2,3 with weights 1,1,10 -> median 3 (weight mass);
    equal weights over 1..4 -> lower median 2."""
    import pytest

    from ghcn_d_etl_project_spark.operators.quality import weighted_median

    rows = [("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 10.0)] + [
        ("b", float(v), 1.0) for v in (1, 2, 3, 4)
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = {
        r["g"]: (r["weighted_median"], r["total_weight"])
        for r in weighted_median(df, ["g"], "v", "w").collect()
    }
    assert out["a"] == (3.0, pytest.approx(12.0))
    assert out["b"] == (2.0, pytest.approx(4.0))


def test_weighted_median_matches_python_reference(spark):
    import random

    from ghcn_d_etl_project_spark.operators.quality import weighted_median

    rng = random.Random(17)
    rows = [
        ("g", round(rng.uniform(0, 100), 2), float(rng.randint(1, 9)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    got = weighted_median(df, ["g"], "v", "w").collect()[0]["weighted_median"]

    agg: dict[float, float] = {}
    for _, v, w in rows:
        agg[v] = agg.get(v, 0.0) + w
    tot = sum(agg.values())
    cw = 0.0
    want = None
    for v in sorted(agg):
        cw += agg[v]
        if 2 * cw >= tot:
            want = v
            break
    assert got == want


def test_weighted_median_duplicate_values_collapse(spark):
    """Duplicate values pool their weight BEFORE the cumulative walk —
    the collapse step, not per-row order, decides the crossing."""
    from ghcn_d_etl_project_spark.operators.quality import weighted_median

    rows = [("g", 5.0, 1.0)] * 6 + [("g", 1.0, 5.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = weighted_median(df, ["g"], "v", "w").collect()[0]
    assert out["weighted_median"] == 5.0  # 6 of 11 mass at 5.0... lower
    # median: cw(1.0)=5, 2*5 < 11; cw(5.0)=11 -> first crossing at 5.0


def test_weighted_median_rejects_nonpositive_weight(spark):
    import pytest

    from ghcn_d_etl_project_spark.operators.quality import weighted_median

    df = spark.createDataFrame([("g", 1.0, 0.0)], "g string, v double, w double")
    with pytest.raises(Exception, match="non-positive weight"):
        weighted_median(df, ["g"], "v", "w").collect()
    with pytest.raises(ValueError):
        weighted_median(df, [], "v", "w")


# ---------------------------------------------------------------------------
# mann_whitney_u (r10)
# ---------------------------------------------------------------------------


def _mwu_reference(a, b):
    """Textbook Mann-Whitney with average ranks + tie correction."""
    import math
    from collections import Counter

    pooled = sorted(a + b)
    cnt = Counter(pooled)
    # average rank per value
    ranks, below = {}, 0
    for v in sorted(cnt):
        ranks[v] = below + (cnt[v] + 1) / 2.0
        below += cnt[v]
    ra = sum(ranks[v] for v in a)
    na, nb, n = len(a), len(b), len(a) + len(b)
    ua = ra - na * (na + 1) / 2.0
    mu = na * nb / 2.0
    t = sum(c**3 - c for c in cnt.values())
    sigma2 = na * nb / 12.0 * ((n + 1) - t / (n * (n - 1)))
    z = (ua - mu) / math.sqrt(sigma2) if sigma2 > 0 else None
    return ua, z, sum(1 for c in cnt.values() if c > 1)


def _mwu_df(spark, a, b):
    rows = [("A", float(v)) for v in a] + [("B", float(v)) for v in b]
    return spark.createDataFrame(rows, "g string, v double")


def test_mwu_hand_case_with_ties(spark):
    from ghcn_d_etl_project_spark.operators.quality import mann_whitney_u

    a, b = [1, 2, 2, 5], [2, 3, 4, 4, 6]
    r = mann_whitney_u(_mwu_df(spark, a, b), "g", "v", "A", "B").collect()[0]
    ua, z, n_tied = _mwu_reference(a, b)
    assert r["n_a"] == 4 and r["n_b"] == 5
    assert r["u_a"] == ua
    assert r["u_b"] == 4 * 5 - ua
    assert r["n_tied_values"] == n_tied == 2
    assert r["z"] == pytest.approx(z, abs=1e-6)
    assert r["cles"] == pytest.approx(ua / 20.0, abs=1e-6)


def test_mwu_matches_reference_on_random_data(spark):
    import random

    from ghcn_d_etl_project_spark.operators.quality import mann_whitney_u

    rng = random.Random(10)
    # coarse grid forces heavy ties; B shifted up so z is clearly signed
    a = [rng.randrange(0, 15) for _ in range(80)]
    b = [rng.randrange(3, 18) for _ in range(60)]
    r = mann_whitney_u(_mwu_df(spark, a, b), "g", "v", "A", "B").collect()[0]
    ua, z, n_tied = _mwu_reference(a, b)
    assert r["u_a"] == ua
    assert r["z"] == pytest.approx(z, abs=1e-6)
    assert r["n_tied_values"] == n_tied
    assert r["z"] < 0  # A sits below B by construction


def test_mwu_all_tied_and_empty_group(spark):
    from ghcn_d_etl_project_spark.operators.quality import mann_whitney_u

    # every value identical -> sigma 0 -> z NULL, U at its midpoint
    r = mann_whitney_u(
        _mwu_df(spark, [7, 7], [7, 7, 7]), "g", "v", "A", "B"
    ).collect()[0]
    assert r["z"] is None
    assert r["u_a"] == 2 * 3 / 2.0
    # one group absent -> cles/z NULL, counts honest
    r2 = mann_whitney_u(
        _mwu_df(spark, [1, 2], []), "g", "v", "A", "B"
    ).collect()[0]
    assert r2["n_a"] == 2 and r2["n_b"] == 0
    assert r2["cles"] is None and r2["z"] is None


def test_mwu_ignores_other_groups_and_nulls(spark):
    from ghcn_d_etl_project_spark.operators.quality import mann_whitney_u

    rows = [("A", 1.0), ("B", 2.0), ("C", 99.0), ("A", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    assert r["n_a"] == 1 and r["n_b"] == 1
    assert r["u_a"] == 0.0 and r["u_b"] == 1.0


def test_mwu_partitioning_invariance(spark):
    from ghcn_d_etl_project_spark.operators.quality import mann_whitney_u

    import random

    rng = random.Random(4)
    a = [rng.randrange(0, 9) for _ in range(50)]
    b = [rng.randrange(0, 9) for _ in range(50)]
    outs = []
    for parts in (1, 7):
        df = _mwu_df(spark, a, b).repartition(parts)
        outs.append(mann_whitney_u(df, "g", "v", "A", "B").collect()[0])
    assert outs[0] == outs[1]


# ---------------------------------------------------------------------------
# winsorized_mean (r10)
# ---------------------------------------------------------------------------


def test_winsorized_hand_case(spark):
    """10 values 1..9 + whale 1000, p10/p90: numpy-checked bounds, the
    whale clamps to the hi bound in the winsorized mean and vanishes
    from the trimmed mean."""
    import numpy as np

    from ghcn_d_etl_project_spark.operators.quality import winsorized_mean

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = winsorized_mean(df, "v", p_lo=0.1, p_hi=0.9).collect()[0]
    lo = round(float(np.percentile(vals, 10)), 6)
    hi = round(float(np.percentile(vals, 90)), 6)
    wins = [min(max(v, lo), hi) for v in vals]
    trim = [v for v in vals if lo <= v <= hi]
    assert r["n"] == 10
    assert r["mean_value"] == round(sum(vals) / 10, 6)
    assert r["winsorized_mean"] == pytest.approx(sum(wins) / 10, abs=1e-6)
    assert r["trimmed_mean"] == pytest.approx(sum(trim) / len(trim), abs=1e-6)
    assert r["n_clamped_lo"] == 1 and r["n_clamped_hi"] == 1


def test_winsorized_bounded_influence(spark):
    """Growing the whale 100x moves the plain mean but NEITHER robust
    metric (the whale already sits above the hi bound)."""
    from ghcn_d_etl_project_spark.operators.quality import winsorized_mean

    base = [float(v) for v in range(1, 50)]

    def metrics(whale):
        df = spark.createDataFrame([(v,) for v in base + [whale]], "v double")
        r = winsorized_mean(df, "v").collect()[0]
        return r["mean_value"], r["winsorized_mean"], r["trimmed_mean"]

    m1, w1, t1 = metrics(1e4)
    m2, w2, t2 = metrics(1e6)
    assert m2 > m1 * 10
    assert w1 == w2 and t1 == t2


def test_winsorized_groups_nulls_and_validation(spark):
    from ghcn_d_etl_project_spark.operators.quality import winsorized_mean

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 7.0), ("a", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in
           winsorized_mean(df, "v", group_cols=["g"]).collect()}
    assert got["a"]["n"] == 3  # NULL excluded
    assert got["b"]["n"] == 1 and got["b"]["winsorized_mean"] == 7.0
    with pytest.raises(ValueError, match="p_lo"):
        winsorized_mean(df, "v", p_lo=0.9, p_hi=0.1)


def test_winsorized_approx_twin_and_plan(spark):
    """The percentile_approx twin runs and agrees to sketch accuracy;
    the exact form's plan joins the bounds back BROADCAST (the fact
    side never shuffles for the robust metric)."""
    from ghcn_d_etl_project_spark.operators.quality import winsorized_mean
    from ghcn_d_etl_project_spark.plans._util import t as tt
    from tests.conftest import SF_DIR

    o = tt(spark, SF_DIR, "orders")
    exact = winsorized_mean(o, "o_totalprice", group_cols=["o_orderpriority"])
    approx = winsorized_mean(
        o, "o_totalprice", group_cols=["o_orderpriority"], exact=False
    )
    e = {r["o_orderpriority"]: r for r in exact.collect()}
    a = {r["o_orderpriority"]: r for r in approx.collect()}
    for k in e:
        assert a[k]["winsorized_mean"] == pytest.approx(
            e[k]["winsorized_mean"], rel=0.02
        )
    plan = exact._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
