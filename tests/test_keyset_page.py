"""Keyset pagination: page-chain semantics (disjoint, ordered, gap-free,
exhaustive) and the scale pins that distinguish it from the reference's
limit/offset loop (cursor predicate pushed to the scan,
TakeOrderedAndProject instead of a global sort)."""

from __future__ import annotations

import re

import pytest

from ghcn_d_etl_project_spark.operators.common import keyset_page
from ghcn_d_etl_project_spark.plans import all_queries
from ghcn_d_etl_project_spark.plans._util import t
from tests.conftest import SF_DIR


def test_page_chain_is_disjoint_ordered_exhaustive(spark):
    o = t(spark, SF_DIR, "orders").select("o_orderkey")
    total = o.count()
    seen: list[int] = []
    cursor = None
    while True:
        page = [r.o_orderkey for r in keyset_page(o, ["o_orderkey"], cursor, n=700).collect()]
        if not page:
            break
        assert page == sorted(page)
        if seen:
            assert page[0] > seen[-1]  # no overlap, no gap backwards
        seen.extend(page)
        cursor = (page[-1],)
    assert len(seen) == total == len(set(seen))
    assert seen == sorted(seen)


def test_composite_key_cursor(spark):
    # unique composite key by construction (the operator's documented
    # requirement; the synthetic lineitem key is NOT unique)
    rows = [(a, b) for a in range(7) for b in range(5)]
    df = spark.createDataFrame(rows, "a long, b long").repartition(4)
    first = keyset_page(df, ["a", "b"], None, n=10).collect()
    last = first[-1]
    nxt = keyset_page(df, ["a", "b"], (last.a, last.b), n=10).collect()
    keys = [(r.a, r.b) for r in first + nxt]
    assert keys == sorted(rows)[:20]  # ordered, disjoint, gap-free


def test_cursor_arity_mismatch_raises(spark):
    o = t(spark, SF_DIR, "orders")
    with pytest.raises(ValueError, match="arity"):
        keyset_page(o, ["o_orderkey", "o_custkey"], after=(1,), n=5)


def test_keyset_plan_pushes_cursor_and_avoids_full_sort(spark):
    """The whole point vs limit/offset: the cursor reaches the parquet
    scan as a pushed GreaterThan filter, and the page materializes via
    TakeOrderedAndProject — no global-sort Exchange, no offset
    discard-scan."""
    old = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    try:
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
        df = all_queries()["keyset_page_orders"].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "GreaterThan(o_orderkey" in pushed, plan[:1500]
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_null_keys_excluded_and_null_cursor_raises(spark):
    """NULL keys would silently truncate the page chain (NULLS FIRST on
    page 1, then a NULL cursor element nulls the strict-after predicate
    for every row) — the operator excludes them and rejects NULL
    cursors."""
    df = spark.createDataFrame([(None, 1), (2, 2), (1, 3)], "k long, v long")
    page = keyset_page(df, ["k"], None, n=10).collect()
    assert [r.k for r in page] == [1, 2]
    with pytest.raises(ValueError, match="NULL cursor"):
        keyset_page(df, ["k"], after=(None,), n=10)
