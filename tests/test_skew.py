"""Operator-level tests for the skew-mitigation family
(``operators/skew.py``): salted_agg's derived avg, salted_join's
salt-invariance guard rails, and the recommend_n_salts sizing probe.
(The plan-shape pins — no-broadcast, AQE granularity — live in
tests/test_plans.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.skew import (
    recommend_n_salts,
    salted_agg,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """900 rows on key 'hot', ~10 each on 10 cold keys; val has planted
    nulls so avg's null semantics are exercised."""
    df = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 10).cast("string")))
        .alias("k"),
        F.when(F.col("id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise((F.col("id") % 101).cast("double"))
        .alias("val"),
    )
    return df.persist()


def test_salted_agg_avg_matches_plain_avg(spark, skewed):
    """avg decomposes to sum+count partials; result must equal plain
    F.avg (nulls excluded) on every key."""
    got = {
        r.k: r.avg_val
        for r in salted_agg(
            skewed, ["k"], [("val", "avg", "avg_val")], n_salts=8
        ).collect()
    }
    want = {
        r.k: r.avg_val
        for r in skewed.groupBy("k").agg(F.avg("val").alias("avg_val")).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_salted_agg_avg_all_null_group_is_null(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 4.0), ("b", 2.0)],
        "k string, val double",
    )
    rows = {
        r.k: r.m
        for r in salted_agg(df, ["k"], [("val", "avg", "m")], n_salts=4).collect()
    }
    assert rows["a"] is None
    assert rows["b"] == pytest.approx(3.0)


def test_salted_agg_mixed_specs_with_avg(spark, skewed):
    """avg rides alongside the other decomposables in one call."""
    row = (
        salted_agg(
            skewed,
            ["k"],
            [
                ("val", "count", "n"),
                ("val", "sum", "s"),
                ("val", "min", "mn"),
                ("val", "avg", "a"),
            ],
            n_salts=8,
        )
        .filter(F.col("k") == "hot")
        .first()
    )
    plain = (
        skewed.filter(F.col("k") == "hot")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("val").alias("s"),
            F.min("val").alias("mn"),
            F.avg("val").alias("a"),
        )
        .first()
    )
    assert row.n == plain.n
    assert row.s == pytest.approx(plain.s, rel=1e-12)
    assert row.mn == plain.mn
    assert row.a == pytest.approx(plain.a, rel=1e-12)


def test_salted_agg_rejects_non_decomposable(spark, skewed):
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(skewed, ["k"], [("val", "median", "m")])


def test_salted_join_rejects_outer_hows(spark, skewed):
    """right/full outer would duplicate unmatched dim keys once per salt
    replica — the operator must refuse rather than return silently wrong
    rows (ADVICE r6)."""
    dim = spark.createDataFrame([("hot", 1)], "k string, tag int")
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salt-invariant"):
            salted_join(skewed, dim, "k", "k", how=how)


def test_salted_join_left_null_extends_once(spark):
    """how='left' is allowed and unmatched FACT keys null-extend exactly
    once (fact rows are never replicated)."""
    fact = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("miss", 99)], "k string, v int"
    )
    dim = spark.createDataFrame([("hot", "H")], "kd string, tag string")
    out = salted_join(fact, dim, "k", "kd", n_salts=4, how="left").collect()
    assert len(out) == 51
    miss = [r for r in out if r.k == "miss"]
    assert len(miss) == 1 and miss[0].tag is None


def test_salted_join_rejects_salt_column_collision(spark, skewed):
    """A pre-existing __salt column would be silently overwritten then
    dropped (ADVICE r6) — must raise instead."""
    dim = spark.createDataFrame([("hot", 1)], "k string, tag int")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(skewed.withColumn("__salt", F.lit(0)), dim, "k", "k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(skewed, dim.withColumn("__salt", F.lit(0)), "k", "k")


def test_recommend_n_salts_skewed_vs_uniform(spark, skewed):
    """Hot-share probe: ~90% hot key at P=8 partitions needs
    ceil(0.9*8/2) = 4 salts; a uniform distribution needs none."""
    rec = recommend_n_salts(skewed, "k", shuffle_partitions=8)
    assert rec["skewed"] is True
    assert rec["top_count"] == 900 and rec["total"] == 1000
    assert rec["n_salts"] == 4  # ceil(900*8 / (2*1000))
    uniform = spark.range(1000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    rec_u = recommend_n_salts(uniform, "k", shuffle_partitions=8)
    assert rec_u["skewed"] is False and rec_u["n_salts"] == 1


def test_recommend_n_salts_clamps_to_partitions(spark, skewed):
    """No point salting beyond the reducer count: with a single key
    (hot_share=1) the raw recommendation is P/balance_factor, and a
    tighter balance target than that is capped at P."""
    one_key = skewed.withColumn("k", F.lit("only"))
    rec = recommend_n_salts(one_key, "k", shuffle_partitions=8)
    assert rec["hot_share"] == 1.0
    assert rec["n_salts"] == 4  # ceil(P / balance_factor) = 8/2
    tight = recommend_n_salts(
        one_key, "k", shuffle_partitions=8, balance_factor=0.25
    )
    assert tight["n_salts"] == 8  # raw 32, capped at P


def test_recommend_n_salts_empty_input(spark):
    empty = spark.createDataFrame([], "k string, v int")
    rec = recommend_n_salts(empty, "k", shuffle_partitions=8)
    assert rec == {
        "n_salts": 1, "top_count": 0, "total": 0, "n_keys": 0,
        "hot_share": 0.0, "partitions": 8, "skewed": False,
    }


# ---------------------------------------------------------------------------
# skew_report (r8): measure before you salt
# ---------------------------------------------------------------------------


def test_skew_report_planted_whale(spark):
    """90%-hot-key data: the whale must rank first with the right share,
    and skew_ratio must say 'the heaviest key is ~N_KEYS x the mean' —
    the number that justifies salting."""
    from ghcn_d_etl_project_spark.operators.skew import skew_report

    rows = [("whale", i) for i in range(900)] + [
        (f"k{j}", i) for j in range(10) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, x long")
    out = skew_report(df, ["k"], top_k=3).collect()
    assert len(out) == 3
    top = out[0]
    assert top["k"] == "whale" and top["heavy_rank"] == 1
    assert top["n_rows"] == 900 and top["n_keys"] == 11
    assert abs(top["share_pct"] - 90.0) < 1e-6
    # mean size = 1000/11; ratio = 900 / (1000/11) = 9.9
    assert abs(top["skew_ratio"] - 9.9) < 1e-6
    assert top["max_size"] == 900
    # runner-up keys tie at 10 rows -> deterministic key-order tiebreak
    assert [r["k"] for r in out[1:]] == ["k0", "k1"]


def test_skew_report_uniform_ratio_near_one(spark):
    from ghcn_d_etl_project_spark.operators.skew import skew_report

    rows = [(f"k{j}", i) for j in range(8) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, x long")
    out = skew_report(df, ["k"], top_k=1).collect()[0]
    assert out["skew_ratio"] == 1.0
    assert out["p50_size"] == 5.0 and out["max_size"] == 5


def test_skew_report_validation_and_plan(spark):
    from ghcn_d_etl_project_spark.operators.skew import skew_report

    df = spark.createDataFrame([("a", 1)], "k string, x long")
    with pytest.raises(ValueError, match="key column"):
        skew_report(df, [])
    with pytest.raises(ValueError, match="top_k"):
        skew_report(df, ["k"], top_k=0)
    plan = (
        skew_report(df, ["k"], top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two branches, each shuffling only map-side-combined per-key
    # partials; summary joins back via broadcast; top-k is TakeOrdered
    assert plan.count("Exchange hashpartitioning") == 2
    assert "partial_count" in plan  # map-side combine before each shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "TakeOrdered" in plan  # top-k never globally sorts
