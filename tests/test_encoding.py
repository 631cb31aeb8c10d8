"""Leave-one-out target encoding: edge semantics + the no-fact-shuffle
plan shape (operators/encoding.py)."""

from __future__ import annotations

from ghcn_d_etl_project_spark.operators.encoding import target_encode_loo


def test_loo_basic_and_edges(spark):
    rows = [
        (1, "a", 10.0),
        (2, "a", 20.0),
        (3, "a", 30.0),
        (4, "b", 5.0),        # singleton -> NULL
        (5, "c", 7.0),
        (6, "c", None),       # NULL target -> plain mean of others
        (7, None, 9.0),       # NULL category -> NULL
    ]
    df = spark.createDataFrame(rows, "id int, cat string, y double")
    got = {r.id: r.te_loo for r in target_encode_loo(df, "cat", "y").collect()}
    assert got[1] == 25.0 and got[2] == 20.0 and got[3] == 15.0
    assert got[4] is None
    assert got[5] is None    # c has one non-NULL y -> no leakage-free est
    assert got[6] == 7.0     # NULL target: plain mean over others
    assert got[7] is None
    assert len(got) == 7     # left join preserves every row


def test_loo_plan_one_shuffle_broadcast_back(spark):
    """ONE hash Exchange (the category aggregate); the join back to the
    fact must be a BroadcastHashJoin — the fact table never shuffles.
    This is the operator's reason to exist vs the window formulation."""
    from ghcn_d_etl_project_spark.plans._util import t

    out = target_encode_loo(
        t(spark, "/root/testdata/sf0.001", "orders"),
        "o_orderpriority", "o_totalprice",
    )
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1200]
    assert "SortMergeJoin" not in plan
    n = plan.count("Exchange hashpartitioning")
    assert n <= 1, f"fact side shuffled: {n} hash exchanges\n{plan[:1500]}"


def test_percentile_features_match_window_semantics(spark):
    """Counting formulation == PERCENT_RANK/CUME_DIST window semantics,
    including ties and NULLs (NULL -> NULL features, excluded from N)."""
    from ghcn_d_etl_project_spark.operators.encoding import percentile_features

    rows = [(1, 10.0), (2, 20.0), (3, 20.0), (4, 30.0), (5, None)]
    df = spark.createDataFrame(rows, "id int, v double")
    got = {r.id: (r.pct_rank, r.cume_dist)
           for r in percentile_features(df, "v").collect()}
    assert got[1] == (0.0, 0.25)
    # ties share below=1 -> pct (1/3), cume inclusive 3/4
    assert got[2] == (round(1 / 3, 6), 0.75)
    assert got[3] == got[2]
    assert got[4] == (1.0, 1.0)
    assert got[5] == (None, None)
    assert len(got) == 5


def test_percentile_features_no_single_partition_sort(spark):
    """The operator's reason to exist: the executed plan must not
    contain the window formulation's Exchange SinglePartition over the
    data (the broadcast of the one-row total is fine)."""
    from ghcn_d_etl_project_spark.operators.encoding import percentile_features
    from ghcn_d_etl_project_spark.plans._util import t

    out = percentile_features(
        t(spark, "/root/testdata/sf0.001", "orders"), "o_totalprice"
    )
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two BOUNDED SinglePartition exchanges are allowed — global_cumsum's
    # bucket-summary window (#buckets rows) and the one-row total — but
    # never a third (which would be the data-sized sort), and never the
    # window formulation's rangepartitioning
    assert plan.count("Exchange SinglePartition") <= 2, plan[:1500]
    assert "rangepartitioning" not in plan.lower(), plan[:1500]


def test_standardize_hand_case_and_edges(spark):
    import math

    from ghcn_d_etl_project_spark.operators.encoding import standardize

    rows = [
        (1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0),
        (4, "b", 7.0),                  # singleton -> NULL z
        (5, "c", 4.0), (6, "c", 4.0),   # zero variance -> NULL z
        (7, "a", None),                 # NULL x -> NULL z
        (8, None, 9.0),                 # NULL group -> NULL z
    ]
    df = spark.createDataFrame(rows, "id int, g string, v double")
    got = {r.id: r.v_z for r in standardize(df, ["v"], ["g"]).collect()}
    # group a: mean 20, sample std 10
    assert got[1] == -1.0 and got[2] == 0.0 and got[3] == 1.0
    assert got[4] is None and got[5] is None and got[6] is None
    assert got[7] is None and got[8] is None
    # population denominator: std = sqrt(200/3)
    gp = {r.id: r.v_z
          for r in standardize(df, ["v"], ["g"], sample=False).collect()}
    assert abs(gp[1] - (-10.0 / math.sqrt(200.0 / 3.0))) < 1e-6


def test_standardize_plan_no_fact_shuffle(spark):
    from ghcn_d_etl_project_spark.operators.encoding import standardize
    from ghcn_d_etl_project_spark.plans._util import t

    out = standardize(
        t(spark, "/root/testdata/sf0.001", "lineitem"),
        ["l_quantity", "l_extendedprice"],
        group_cols=["l_returnflag"],
    )
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan[:1500]
