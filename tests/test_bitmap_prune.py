"""Bitmap semi-join reduction (operators/joins.py:bitmap_filter /
bitmap_prune / bitmap_prune_join): explicit Bloom-style pruning of the
fact side before an exact join. The oracle query
(bitmap_prune_join_revenue) hash-checks end-to-end exactness against
the plain DuckDB join; these pin the filter laws (no false negatives
ever, false positives appear under deliberate saturation and are
harmless), NULL handling, validation, and the map-only probe plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.joins import (
    bitmap_filter,
    bitmap_prune,
    bitmap_prune_join,
)


def _fact(spark, n=2000):
    return spark.range(0, n).select(F.col("id").alias("key"), (F.col("id") % 7).alias("v"))


def _dim(spark):
    return spark.range(0, 50).select((F.col("id") * 41).alias("key"), F.lit("x").alias("attr"))


def test_prune_join_equals_plain_join(spark):
    fact, dim = _fact(spark), _dim(spark)
    got = sorted(tuple(r) for r in bitmap_prune_join(fact, dim, "key").collect())
    want = sorted(tuple(r) for r in fact.join(dim, "key").collect())
    assert got == want and len(want) > 0


def test_no_false_negatives_even_saturated(spark):
    """At n_bits=64 with 50 keys the filter saturates (~everything
    passes) — survivors must still be a SUPERSET of true matches and
    the downstream join stays exact."""
    fact, dim = _fact(spark), _dim(spark)
    bm = bitmap_filter(dim.select("key"), "key", n_bits=64, k=2)
    pruned = bitmap_prune(fact, bm, "key", n_bits=64, k=2)
    true_keys = {r["key"] for r in fact.join(dim.select("key"), "key").collect()}
    survivors = {r["key"] for r in pruned.collect()}
    assert true_keys <= survivors
    got = sorted(
        tuple(r) for r in bitmap_prune_join(fact, dim, "key", n_bits=64, k=2).collect()
    )
    want = sorted(tuple(r) for r in fact.join(dim, "key").collect())
    assert got == want


def test_prune_is_selective_at_default_size(spark):
    """2^16 bits over 50 keys: the prune should pass (nearly) only the
    true matches — the whole point of shipping it before the shuffle."""
    fact, dim = _fact(spark), _dim(spark)
    bm = bitmap_filter(dim.select("key"), "key")
    n_pruned = bitmap_prune(fact, bm, "key").count()
    n_true = fact.join(dim.select("key"), "key").count()
    assert n_true <= n_pruned <= n_true + 20  # fp head-room, ~0 expected


def test_null_keys_dropped_both_sides(spark):
    fact = spark.createDataFrame([(None, 1), (41, 2)], "key long, v int")
    dim = spark.createDataFrame([(None, "a"), (41, "b")], "key long, attr string")
    out = bitmap_prune_join(fact, dim, "key").collect()
    assert [(r["key"], r["v"], r["attr"]) for r in out] == [(41, 2, "b")]


def test_validation(spark):
    d = _dim(spark)
    with pytest.raises(ValueError, match="power of two"):
        bitmap_filter(d, "key", n_bits=100)
    with pytest.raises(ValueError, match="power of two"):
        bitmap_filter(d, "key", n_bits=32)
    with pytest.raises(ValueError, match="k must"):
        bitmap_filter(d, "key", k=0)
    with pytest.raises(ValueError, match="single key"):
        bitmap_prune_join(_fact(spark), d, ["key", "attr"])


def test_probe_plan_is_map_only(spark):
    """The fact side must NOT shuffle before the prune: the one-row
    bitmap broadcasts (BroadcastNestedLoopJoin), the probe is a plain
    Filter of JVM bit arithmetic — no hashpartitioning Exchange on the
    probe path, no Python eval anywhere."""
    fact, dim = _fact(spark), _dim(spark)
    bm = bitmap_filter(dim.select("key"), "key")
    plan = (
        bitmap_prune(fact, bm, "key")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastNestedLoopJoin") == 1
    probe_side = plan.split("BroadcastNestedLoopJoin")[1].split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in probe_side
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
