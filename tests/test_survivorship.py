"""Survivorship (operators/survivorship.py): golden-record selection.

The oracle query (golden_record) hash-checks the fingerprint-cluster
formulation against DuckDB; these tests pin the operator semantics on
planted multi-member clusters (the sf0.01 documents table has no exact
dups, so cluster sizes > 1 only exist here), the agg/window strategy
equivalence, NULL-rule ordering, and the sort-free agg plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.survivorship import survivorship


def _clusters(spark):
    # cluster a: len ladder decides (id 3 wins); cluster b: len ties,
    # smaller id wins (id 4); cluster c: singleton; cluster d: NULL len
    # loses to any non-NULL (id 8 wins despite larger id)
    rows = [
        (1, "a", 10, "x"),
        (2, "a", 20, "y"),
        (3, "a", 30, "z"),
        (4, "b", 50, "p"),
        (5, "b", 50, "q"),
        (6, "c", 7, "r"),
        (7, "d", None, "s"),
        (8, "d", 1, "t"),
    ]
    return spark.createDataFrame(
        rows, "id long, cluster string, len int, payload string"
    )


RULES = [("len", "max"), ("id", "min")]


@pytest.mark.parametrize("strategy", ["agg", "window"])
def test_survivor_per_cluster(spark, strategy):
    out = survivorship(_clusters(spark), "cluster", RULES, strategy=strategy)
    got = {r["cluster"]: (r["id"], r["payload"], r["n_members"]) for r in out.collect()}
    assert got == {
        "a": (3, "z", 3),
        "b": (4, "p", 2),
        "c": (6, "r", 1),
        "d": (8, "t", 2),
    }


def test_strategies_agree_on_min_direction(spark):
    rules = [("len", "min"), ("id", "max")]
    df = _clusters(spark).where(F.col("len").isNotNull())
    a = survivorship(df, "cluster", rules, strategy="agg").collect()
    w = survivorship(df, "cluster", rules, strategy="window").collect()
    key = lambda rows: sorted((r["cluster"], r["id"]) for r in rows)
    assert key(a) == key(w) == [("a", 1), ("b", 5), ("c", 6), ("d", 8)]


def test_output_schema_is_input_plus_size(spark):
    out = survivorship(_clusters(spark), "cluster", RULES)
    assert out.columns == ["id", "cluster", "len", "payload", "n_members"]


def test_bad_specs_raise(spark):
    df = _clusters(spark)
    with pytest.raises(ValueError, match="strategy"):
        survivorship(df, "cluster", RULES, strategy="sort")
    with pytest.raises(ValueError, match="empty"):
        survivorship(df, "cluster", [])
    with pytest.raises(ValueError, match="direction"):
        survivorship(df, "cluster", [("len", "desc")])
    with pytest.raises(ValueError, match="collides"):
        survivorship(df, "cluster", RULES, size_col="payload")
    with pytest.raises(ValueError, match="numeric"):
        survivorship(df, "cluster", [("payload", "max")], strategy="agg")
    # ...but the window strategy takes string rules fine
    out = survivorship(df, "cluster", [("payload", "max")], strategy="window")
    assert out.count() == 4


def test_agg_plan_partial_combines_before_exchange(spark):
    """The 100 TB claim: the agg strategy partial-combines map-side
    (partial_max BELOW the single Exchange), so the shuffle carries at
    most one collapsed candidate per (cluster, partition) — unlike the
    window form, whose Exchange carries every input row. No Window or
    Join anywhere."""
    plan = (
        survivorship(_clusters(spark), "cluster", RULES, strategy="agg")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    ex = plan.index("Exchange hashpartitioning")
    assert "partial_max" in plan[ex:], "map-side combine must precede shuffle"
    assert "Window" not in plan and "Join" not in plan


def test_window_plan_sorts(spark):
    plan = (
        survivorship(_clusters(spark), "cluster", RULES, strategy="window")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Sort" in plan and "Window" in plan
