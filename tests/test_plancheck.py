"""Plan-inspection API (utils/plancheck.py): the structured report must
agree with the raw plan text on known query shapes, and the assertion
helpers must fire exactly when their condition is violated."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.plans.registry import all_queries
from ghcn_d_etl_project_spark.utils.plancheck import (
    assert_max_shuffles,
    assert_no_cartesian,
    assert_scan_pruned,
    plan_report,
)
from tests.conftest import SF_DIR


def test_report_star_join_shape(spark):
    """star_join_revenue is the pinned 4-broadcast-join query: the
    report must see the BHJs, the pruned lineitem scan, and its pushed
    filter."""
    df = all_queries()["star_join_revenue"].fn(spark, SF_DIR)
    r = plan_report(df)
    assert r.broadcast_joins == 4
    assert r.cartesian_products == 0 and r.nested_loop_joins == 0
    assert r.python_evals == 0
    li = [s for s in r.scans if "l_orderkey" in s["columns"]]
    assert li, r.scans
    assert len(li[0]["columns"]) == 4  # pruned projection
    assert any("IsNotNull" in f for f in li[0]["pushed_filters"])


def test_report_counts_window_and_pandas_ops(spark):
    df = all_queries()["sessionize_events"].fn(spark, SF_DIR)
    r = plan_report(df)
    assert r.window_ops >= 1 and r.shuffles >= 1
    ew = all_queries()["ewma_events"].fn(spark, SF_DIR)
    r2 = plan_report(ew)
    assert r2.pandas_group_ops == 1


def test_assert_helpers_fire_and_pass(spark):
    ok = all_queries()["monthly_agg"].fn(spark, SF_DIR)
    assert_no_cartesian(ok)
    assert_max_shuffles(ok, 5)
    with pytest.raises(AssertionError, match="shuffles"):
        assert_max_shuffles(ok, 0)

    a = spark.range(3)
    b = spark.range(3)
    cart = a.crossJoin(b)
    with pytest.raises(AssertionError, match="pair-explosion"):
        assert_no_cartesian(cart)


def test_assert_scan_pruned(spark):
    df = all_queries()["star_join_revenue"].fn(spark, SF_DIR)
    assert_scan_pruned(df, max_columns=4, require_pushed=True)
    with pytest.raises(AssertionError, match="columns"):
        assert_scan_pruned(df, max_columns=1)
    no_scan = spark.range(3).select(F.col("id") * 2)
    with pytest.raises(AssertionError, match="no file scans"):
        assert_scan_pruned(no_scan, max_columns=10)


def test_cold_scans_vs_cached_refs(spark):
    """cold_scans counts FileScans OUTSIDE InMemoryRelation subtrees;
    a persisted substrate referenced k times must read cold=0 with k
    cached references, while the same plan unpersisted reads k cold
    scans — the distinction that separates a real rescan bug (the PMI
    class) from textual reprints of a cached recompute plan."""
    from ghcn_d_etl_project_spark.plans._util import t

    base = t(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    a = base.groupBy().agg(F.sum("o_totalprice").alias("s"))
    b = base.groupBy().agg(F.count("*").alias("n"))
    union = a.crossJoin(b)

    r_cold = plan_report(union)
    assert r_cold.cold_scans == 2
    assert r_cold.cached_refs == 0

    cached = base.persist()
    a2 = cached.groupBy().agg(F.sum("o_totalprice").alias("s"))
    b2 = cached.groupBy().agg(F.count("*").alias("n"))
    r_cached = plan_report(a2.crossJoin(b2))
    try:
        assert r_cached.cold_scans == 0
        assert r_cached.cached_refs == 2
        # the cached-subtree scans still appear in the textual list
        assert len(r_cached.scans) == 2
    finally:
        cached.unpersist()
