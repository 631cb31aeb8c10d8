"""Association mining (operators/association.py): pairwise support /
confidence / lift over baskets, hand-computed fixtures, the
event_copurchase oracle cross-checks the relational-algebra form."""

from __future__ import annotations

import pytest

from ghcn_d_etl_project_spark.operators.association import basket_pairs


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "b long, item string")


def test_basket_pairs_hand_computed(spark):
    """4 baskets: {a,b}, {a,b}, {a,c}, {b}.
    P(a)=3/4, P(b)=3/4, P(ab)=2/4 -> lift(ab)=0.5/(0.75*0.75)=0.888889;
    conf(a->b)=2/3, conf(b->a)=2/3; ac: 1 basket, lift=(0.25)/(0.75*0.25)=1.333333."""
    df = _baskets(
        spark,
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"), (4, "b")],
    )
    out = {
        (r["item_a"], r["item_b"]): r
        for r in basket_pairs(df, ["b"], "item").collect()
    }
    ab = out[("a", "b")]
    assert ab["n_baskets_both"] == 2
    assert ab["support_pct"] == 50.0
    assert ab["conf_a_to_b"] == round(2 / 3, 6)
    assert ab["conf_b_to_a"] == round(2 / 3, 6)
    assert ab["lift"] == round(0.5 / (0.75 * 0.75), 6)
    ac = out[("a", "c")]
    assert ac["n_baskets_both"] == 1 and ac["lift"] == 1.333333
    assert ("b", "c") not in out  # never co-occur -> no row


def test_basket_pairs_duplicates_collapse(spark):
    """Repeated items inside one basket count once (set semantics)."""
    df = _baskets(spark, [(1, "a"), (1, "a"), (1, "b"), (2, "a")])
    out = basket_pairs(df, ["b"], "item").collect()
    assert len(out) == 1
    assert out[0]["n_baskets_both"] == 1
    assert out[0]["support_pct"] == 50.0  # 1 of 2 baskets


def test_basket_pairs_independence_lift_one(spark):
    """a and b in every basket -> lift exactly 1.0."""
    df = _baskets(spark, [(i, t) for i in range(4) for t in ("a", "b")])
    out = basket_pairs(df, ["b"], "item").collect()[0]
    assert out["lift"] == 1.0
    assert out["conf_a_to_b"] == 1.0 and out["conf_b_to_a"] == 1.0


def test_basket_pairs_min_support_and_validation(spark):
    df = _baskets(spark, [(1, "a"), (1, "b"), (2, "a"), (2, "c")])
    out = basket_pairs(df, ["b"], "item", min_support_pct=60.0).collect()
    assert out == []  # every pair sits at 50% support
    with pytest.raises(ValueError, match="basket column"):
        basket_pairs(df, [], "item")
    with pytest.raises(ValueError, match="min_support_pct"):
        basket_pairs(df, ["b"], "item", min_support_pct=101.0)


def test_basket_pairs_nulls_dropped_and_plan(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, None), (None, "b"), (1, "b")], "b long, item string"
    )
    out = basket_pairs(df, ["b"], "item").collect()
    assert len(out) == 1 and out[0]["n_baskets_both"] == 1
    plan = (
        basket_pairs(df, ["b"], "item")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
