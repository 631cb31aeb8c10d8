"""Event-sequence analytics (operators/funnel.py + merge_intervals):
ordered funnels, cohort retention, interval union. The three oracle
queries (funnel_conversion / cohort_retention_weekly /
interval_merge_events) cross-check the window formulations against
DuckDB; these tests pin the operator SEMANTICS on adversarial
hand-built inputs (strict ordering, greedy-earliest correctness,
touching-interval merges) and the single-full-shuffle plan shapes."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.funnel import (
    cohort_retention,
    funnel_steps,
    funnel_summary,
)
from ghcn_d_etl_project_spark.operators.timeseries import merge_intervals

TS = dt.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


# ---------------------------------------------------------------------------
# funnel_steps / funnel_summary
# ---------------------------------------------------------------------------


def test_funnel_strict_ordering(spark):
    """A user whose purchase precedes their click must NOT count as
    converted — strictly-after semantics, the defining property."""
    df = _events(
        spark,
        [
            # u1: clean A -> B -> C
            (1, TS(2024, 1, 1, 0), "view"),
            (1, TS(2024, 1, 1, 1), "click"),
            (1, TS(2024, 1, 1, 2), "purchase"),
            # u2: purchase BEFORE click -> reaches step 2 only
            (2, TS(2024, 1, 1, 0), "view"),
            (2, TS(2024, 1, 1, 1), "purchase"),
            (2, TS(2024, 1, 1, 2), "click"),
            # u3: never viewed -> reaches nothing even with click+purchase
            (3, TS(2024, 1, 1, 0), "click"),
            (3, TS(2024, 1, 1, 1), "purchase"),
        ],
    )
    out = {
        r["step"]: r
        for r in funnel_summary(df, ["view", "click", "purchase"]).collect()
    }
    assert out["view"]["users"] == 2
    assert out["click"]["users"] == 2
    assert out["purchase"]["users"] == 1
    assert out["purchase"]["pct_of_first"] == 0.5
    # time-to-reach: u1 clicks +1h, u2 clicks +2h -> mean 5400s; only
    # u1 purchases, +2h -> 7200s; step 1 is 0 by definition
    assert out["view"]["avg_sec_from_first"] == 0.0
    assert out["click"]["avg_sec_from_first"] == 5400.0
    assert out["purchase"]["avg_sec_from_first"] == 7200.0


def test_funnel_same_timestamp_does_not_advance(spark):
    """step i at exactly step i-1's counted time is NOT strictly after."""
    df = _events(
        spark,
        [
            (1, TS(2024, 1, 1, 0), "view"),
            (1, TS(2024, 1, 1, 0), "click"),  # tie -> no advance
            (2, TS(2024, 1, 1, 0), "view"),
            (2, TS(2024, 1, 1, 0, 0, 1), "click"),
        ],
    )
    out = {
        r["step"]: r["users"]
        for r in funnel_summary(df, ["view", "click"]).collect()
    }
    assert out == {"view": 2, "click": 1}


def test_funnel_greedy_earliest_is_complete(spark):
    """Greedy earliest completion finds a chain whenever one exists:
    the user's FIRST view is followed by no click, but a later
    view->click pair exists — greedy anchors on the first view yet the
    later click still counts because it is after it."""
    df = _events(
        spark,
        [
            (1, TS(2024, 1, 1), "view"),
            (1, TS(2024, 1, 3), "view"),
            (1, TS(2024, 1, 4), "click"),
        ],
    )
    rows = funnel_steps(df, ["view", "click"]).collect()
    assert rows[0]["t1"] == TS(2024, 1, 1)
    assert rows[0]["t2"] == TS(2024, 1, 4)


def test_funnel_rejects_bad_specs(spark):
    df = _events(spark, [(1, TS(2024, 1, 1), "view")])
    with pytest.raises(ValueError, match="at least 2"):
        funnel_steps(df, ["view"])
    with pytest.raises(ValueError, match="duplicate step"):
        funnel_steps(df, ["view", "view"])
    with pytest.raises(ValueError, match="reserved"):
        funnel_steps(df.withColumn("__t1", F.lit(1)), ["view", "click"])


def test_funnel_single_full_shuffle(spark):
    """The events table must shuffle exactly once — k chained window
    minima share one orderless user partition and the per-user collapse
    reuses it; only the final single-row count adds a SinglePartition
    exchange. A second hash exchange would mean the naive re-shuffle."""
    df = _events(spark, [(1, TS(2024, 1, 1), "view")])
    plan = funnel_summary(
        df, ["view", "click", "purchase"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "Join" not in plan


# ---------------------------------------------------------------------------
# cohort_retention
# ---------------------------------------------------------------------------


def test_cohort_retention_weekly_semantics(spark):
    # u1 first active week of Mon 2024-01-01; active again week +2
    # u2 same cohort, never returns
    # u3 cohort week of Mon 2024-01-08, returns week +1
    df = _events(
        spark,
        [
            (1, TS(2024, 1, 2), "view"),
            (1, TS(2024, 1, 16), "view"),
            (1, TS(2024, 1, 17), "click"),  # same week, counted once
            (2, TS(2024, 1, 3), "view"),
            (3, TS(2024, 1, 9), "view"),
            (3, TS(2024, 1, 15), "view"),
        ],
    )
    out = {
        (r["cohort_period"], r["period_offset"]): r
        for r in cohort_retention(df, period="week").collect()
    }
    r00 = out[("2024-01-01", 0)]
    assert r00["cohort_size"] == 2 and r00["active_users"] == 2
    assert r00["retention_pct"] == 1.0
    r02 = out[("2024-01-01", 2)]
    assert r02["active_users"] == 1 and r02["retention_pct"] == 0.5
    r11 = out[("2024-01-08", 1)]
    assert r11["cohort_size"] == 1 and r11["retention_pct"] == 1.0
    assert ("2024-01-01", 1) not in out  # nobody active that week


def test_cohort_retention_rejects_unknown_period(spark):
    df = _events(spark, [(1, TS(2024, 1, 1), "view")])
    with pytest.raises(ValueError, match="period"):
        cohort_retention(df, period="fortnight")


def test_cohort_single_full_data_shuffle(spark):
    """Full event volume shuffles once (the cohort-assignment window);
    later exchanges carry only collapsed triples / the triangle. Pin:
    the window exchange keys on the user column alone."""
    df = _events(spark, [(1, TS(2024, 1, 1), "view")])
    plan = (
        cohort_retention(df, period="week")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    first_ex = plan.find("Exchange hashpartitioning")
    assert first_ex != -1
    # the deepest (last-printed) exchange is the one on raw events
    last_ex = plan.rfind("Exchange hashpartitioning")
    seg = plan[last_ex : plan.find("\n", last_ex)]
    assert "user_id" in seg and "__cohort" not in seg


# ---------------------------------------------------------------------------
# merge_intervals
# ---------------------------------------------------------------------------


def _iv(spark, rows):
    return spark.createDataFrame(rows, "k string, s timestamp, e timestamp")


def test_merge_intervals_overlap_touch_disjoint(spark):
    df = _iv(
        spark,
        [
            # overlapping pair -> one island
            ("a", TS(2024, 1, 1, 0), TS(2024, 1, 1, 2)),
            ("a", TS(2024, 1, 1, 1), TS(2024, 1, 1, 3)),
            # touching endpoint -> merges into the same island
            ("a", TS(2024, 1, 1, 3), TS(2024, 1, 1, 4)),
            # gap -> new island
            ("a", TS(2024, 1, 1, 5), TS(2024, 1, 1, 6)),
            # other key untouched
            ("b", TS(2024, 1, 1, 0), TS(2024, 1, 1, 1)),
        ],
    )
    out = sorted(
        merge_intervals(df, ["k"], "s", "e").collect(),
        key=lambda r: (r["k"], r["s"]),
    )
    assert [(r["k"], r["s"].hour, r["e"].hour, r["n_source"]) for r in out] == [
        ("a", 0, 4, 3),
        ("a", 5, 6, 1),
        ("b", 0, 1, 1),
    ]


def test_merge_intervals_contained_interval_absorbed(spark):
    """An interval fully inside an earlier one must not split the island
    even when a LATER interval starts after the contained one's end —
    this is exactly the case the running-max-of-ends (not lag(end))
    construction exists for."""
    df = _iv(
        spark,
        [
            ("a", TS(2024, 1, 1, 0), TS(2024, 1, 1, 10)),
            ("a", TS(2024, 1, 1, 1), TS(2024, 1, 1, 2)),  # contained
            ("a", TS(2024, 1, 1, 3), TS(2024, 1, 1, 11)),  # after 1-2 ends
        ],
    )
    out = merge_intervals(df, ["k"], "s", "e").collect()
    assert len(out) == 1
    assert out[0]["n_source"] == 3 and out[0]["e"] == TS(2024, 1, 1, 11)


def test_merge_intervals_rejects_invalid(spark):
    with pytest.raises(ValueError, match="invalid interval"):
        merge_intervals(
            _iv(spark, [("a", TS(2024, 1, 2), TS(2024, 1, 1))]),
            ["k"], "s", "e",
        ).collect()
    with pytest.raises(ValueError, match="invalid interval"):
        merge_intervals(
            _iv(spark, [("a", None, TS(2024, 1, 1))]), ["k"], "s", "e"
        ).collect()
    with pytest.raises(ValueError, match="reserved"):
        merge_intervals(
            _iv(spark, [("a", TS(2024, 1, 1), TS(2024, 1, 2))]).withColumn(
                "__island", F.lit(1)
            ),
            ["k"], "s", "e",
        )
    with pytest.raises(ValueError, match="key column"):
        merge_intervals(_iv(spark, []), [], "s", "e")


def test_merge_intervals_one_exchange_one_sort(spark):
    """Both windows share one (key, start, end) spec and the island
    collapse reuses the key partitioning: exactly one Exchange and one
    Sort in the whole plan."""
    df = _iv(spark, [("a", TS(2024, 1, 1), TS(2024, 1, 2))])
    plan = (
        merge_intervals(df, ["k"], "s", "e")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert plan.count("Sort ") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# ewma (lives in operators/timeseries.py but tested with the event ops)
# ---------------------------------------------------------------------------


def test_ewma_matches_exact_recurrence(spark):
    """y_i = (1-a) y_{i-1} + a x_i, per key, ordered by ts — compared
    against a hand-rolled recurrence to 1e-12."""
    import datetime as dt

    from ghcn_d_etl_project_spark.operators.timeseries import ewma

    TS = dt.datetime
    rows = [
        ("a", TS(2024, 1, 1, h), float(v))
        for h, v in enumerate([10, 20, 0, 5, 5, 100])
    ] + [("b", TS(2024, 1, 1, 0), 7.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        (r["k"], r["ts"]): r["v_ewma"]
        for r in ewma(df, ["k"], "ts", ["v"], alpha=0.25).collect()
    }
    a = 0.25
    y = None
    for h, v in enumerate([10, 20, 0, 5, 5, 100]):
        y = v if y is None else (1 - a) * y + a * v
        assert abs(out[("a", TS(2024, 1, 1, h))] - y) < 1e-12
    assert out[("b", TS(2024, 1, 1, 0))] == 7.0


def test_ewma_null_carries_previous(spark):
    import datetime as dt

    from ghcn_d_etl_project_spark.operators.timeseries import ewma

    TS = dt.datetime
    df = spark.createDataFrame(
        [("a", TS(2024, 1, 1, 0), 10.0), ("a", TS(2024, 1, 1, 1), None),
         ("a", TS(2024, 1, 1, 2), 20.0)],
        "k string, ts timestamp, v double",
    )
    got = [
        r["v_ewma"]
        for r in sorted(
            ewma(df, ["k"], "ts", ["v"], alpha=0.5).collect(),
            key=lambda r: r["ts"],
        )
    ]
    assert got[0] == 10.0
    assert got[1] == 10.0  # NULL carries previous smoothed value
    assert abs(got[2] - 15.0) < 1e-12  # 0.5*10 + 0.5*20


def test_ewma_rejects_bad_specs(spark):
    import datetime as dt

    from ghcn_d_etl_project_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0)],
        "k string, ts timestamp, v double",
    )
    with pytest.raises(ValueError, match="exactly one"):
        ewma(df, ["k"], "ts", ["v"])
    with pytest.raises(ValueError, match="exactly one"):
        ewma(df, ["k"], "ts", ["v"], alpha=0.5, halflife_rows=3)
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, ["k"], "ts", ["v"], alpha=1.5)
    with pytest.raises(ValueError, match="halflife"):
        ewma(df, ["k"], "ts", ["v"], halflife_rows=-1)
    with pytest.raises(ValueError, match="key column"):
        ewma(df, [], "ts", ["v"], alpha=0.5)
    with pytest.raises(ValueError, match="reserved"):
        ewma(
            df.withColumn("v_ewma", df.v), ["k"], "ts", ["v"], alpha=0.5
        )


def test_ewma_plan_is_one_exchange_flatmap(spark):
    import datetime as dt

    from ghcn_d_etl_project_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0)],
        "k string, ts timestamp, v double",
    )
    plan = (
        ewma(df, ["k"], "ts", ["v"], alpha=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# rolling_zscore (operators/windows.py)
# ---------------------------------------------------------------------------


def test_rolling_zscore_excludes_current_row(spark):
    """The tested value must not contaminate its own baseline: a spike
    after a flat history scores against the FLAT mean/std, which has
    zero variance -> NULL (not a diluted z)."""
    import statistics

    from pyspark.sql import Window

    from ghcn_d_etl_project_spark.operators.windows import rolling_zscore

    rows = [("a", i, 100.0) for i in range(6)] + [("a", 6, 200.0)]
    df = spark.createDataFrame(rows, "k string, seq long, v double")
    w = Window.partitionBy("k").orderBy("seq")
    out = {
        r["seq"]: r
        for r in rolling_zscore(df, w, "v", preceding=10, min_obs=3).collect()
    }
    # flat baseline -> var 0 -> NULL even for the spike
    assert out[6]["v_zscore"] is None
    assert out[6]["v_base_n"] == 6

    # varied baseline: z computed against the PRIOR 3 values only
    rows2 = [("b", 0, 10.0), ("b", 1, 20.0), ("b", 2, 30.0), ("b", 3, 100.0)]
    df2 = spark.createDataFrame(rows2, "k string, seq long, v double")
    out2 = {
        r["seq"]: r["v_zscore"]
        for r in rolling_zscore(df2, w, "v", preceding=10, min_obs=3).collect()
    }
    base = [10.0, 20.0, 30.0]
    want = (100.0 - statistics.mean(base)) / statistics.stdev(base)
    assert abs(out2[3] - want) < 1e-9
    assert out2[2] is None  # only 2 prior observations < min_obs


def test_rolling_zscore_validation(spark):
    from pyspark.sql import Window

    from ghcn_d_etl_project_spark.operators.windows import rolling_zscore

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, seq long, v double")
    w = Window.partitionBy("k").orderBy("seq")
    with pytest.raises(ValueError, match="preceding"):
        rolling_zscore(df, w, "v", preceding=0)
    with pytest.raises(ValueError, match="min_obs"):
        rolling_zscore(df, w, "v", preceding=5, min_obs=1)


def test_null_ts_handling_across_event_ops(spark):
    """NULL timestamps: funnel and cohort DROP them explicitly (a user
    whose only entry event has NULL ts reads as not-entered / no
    cohort); ewma REFUSES them (a NULL has no position in the
    recurrence)."""
    from ghcn_d_etl_project_spark.operators.timeseries import ewma

    df = _events(
        spark,
        [(1, None, "view"), (1, TS(2024, 1, 2), "click"), (2, TS(2024, 1, 1), "view")],
    )
    out = {
        r["step"]: r["users"]
        for r in funnel_summary(df, ["view", "click"]).collect()
    }
    assert out["view"] == 1  # user 1's NULL-ts view does not count
    cohorts = cohort_retention(df, period="day").collect()
    assert all(r["cohort_period"] is not None for r in cohorts)
    assert {r["cohort_period"] for r in cohorts} == {"2024-01-02", "2024-01-01"}

    vdf = spark.createDataFrame(
        [("a", None, 1.0), ("a", TS(2024, 1, 1), 2.0)],
        "k string, ts timestamp, v double",
    )
    with pytest.raises(ValueError, match="NULL 'ts'"):
        ewma(vdf, ["k"], "ts", ["v"], alpha=0.5)


# ---------------------------------------------------------------------------
# Touch attribution
# ---------------------------------------------------------------------------


def _attr_events(spark):
    rows = [
        # user 1: view@1, click@2, purchase@3 (10.0) -> first=view, last=click
        (1, 1, TS(2024, 1, 1, 0, 0, 1), "view", None),
        (2, 1, TS(2024, 1, 1, 0, 0, 2), "click", None),
        (3, 1, TS(2024, 1, 1, 0, 0, 3), "purchase", 10.0),
        # user 2: touch AFTER the purchase -> (none) under both models
        (4, 2, TS(2024, 1, 1, 0, 0, 5), "purchase", 7.0),
        (5, 2, TS(2024, 1, 1, 0, 0, 9), "click", None),
        # user 3: no touches at all -> (none)
        (6, 3, TS(2024, 1, 1, 0, 0, 4), "purchase", 3.0),
        # user 4: two purchases share the same single view touch
        (7, 4, TS(2024, 1, 1, 0, 1, 0), "view", None),
        (8, 4, TS(2024, 1, 1, 0, 2, 0), "purchase", 1.0),
        (9, 4, TS(2024, 1, 1, 0, 3, 0), "purchase", 2.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )


def test_touch_attribution_models(spark):
    from ghcn_d_etl_project_spark.operators.funnel import touch_attribution

    out = touch_attribution(
        _attr_events(spark), "purchase", ["click", "view"]
    ).collect()
    got = {(r.model, r.touch_type): (r.n_conversions, r.attributed_revenue)
           for r in out}
    assert got[("last_touch", "click")] == (1, 10.0)   # user 1
    assert got[("last_touch", "view")] == (2, 3.0)     # user 4 x2
    assert got[("last_touch", "(none)")] == (2, 10.0)  # users 2, 3
    assert got[("first_touch", "view")] == (3, 13.0)   # user 1 + user 4 x2
    assert got[("first_touch", "(none)")] == (2, 10.0)
    assert ("first_touch", "click") not in got


def test_touch_attribution_is_conservative(spark):
    """Every model's rows must sum to exactly the total conversion count
    and revenue — attribution reassigns credit, never creates or drops
    it (the '(none)' bucket is what makes this hold)."""
    from ghcn_d_etl_project_spark.operators.funnel import touch_attribution
    from ghcn_d_etl_project_spark.plans._util import t

    ev = t(spark, "/root/testdata/sf0.001", "events")
    out = touch_attribution(ev, "purchase", ["click", "view"]).collect()
    purchases = ev.filter(F.col("event_type") == "purchase")
    n_total = purchases.count()
    rev_total = purchases.agg(
        F.sum(F.col("value").cast("decimal(24,6)")).cast("double")
    ).collect()[0][0]
    for model in ("first_touch", "last_touch"):
        rows = [r for r in out if r.model == model]
        assert sum(r.n_conversions for r in rows) == n_total
        assert abs(sum(r.attributed_revenue for r in rows) - rev_total) < 1e-6


def test_touch_attribution_decay_hand_case(spark):
    """Two touches at known ages: weights exp(0) = 1 and
    exp(-ln2) = 0.5 (age exactly one half-life), so the 12.0 conversion
    splits 8.0 / 4.0."""
    from ghcn_d_etl_project_spark.operators.funnel import (
        touch_attribution_decay,
    )

    rows = [
        (1, 1, TS(2024, 1, 1, 0, 0, 0), "view", None),    # age 1800s -> w .5
        (2, 1, TS(2024, 1, 1, 0, 30, 0), "click", None),  # age 0 -> w 1.0
        (3, 1, TS(2024, 1, 1, 0, 30, 0), "purchase", 12.0),
        # user 2: no touch in window -> (none)
        (4, 2, TS(2024, 1, 1, 9, 0, 0), "purchase", 5.0),
        (5, 2, TS(2024, 1, 1, 5, 0, 0), "click", None),   # 4h old, outside 1h
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    out = {r.touch_type: (r.n_credits, r.attributed_revenue)
           for r in touch_attribution_decay(
               df, "purchase", ["click", "view"],
               lookback_seconds=3600.0, half_life_seconds=1800.0,
           ).collect()}
    assert out["click"] == (1, 8.0)
    assert out["view"] == (1, 4.0)
    assert out["(none)"] == (1, 5.0)


def test_touch_attribution_decay_near_conservation(spark):
    """Credits sum to total conversion revenue within
    |pairs| * 10^-6 (each credit rounds once — documented tolerance)."""
    from ghcn_d_etl_project_spark.operators.funnel import (
        touch_attribution_decay,
    )
    from ghcn_d_etl_project_spark.plans._util import t

    ev = t(spark, "/root/testdata/sf0.001", "events")
    out = touch_attribution_decay(ev, "purchase", ["click", "view"]).collect()
    purchases = ev.filter(F.col("event_type") == "purchase")
    rev_total = purchases.agg(
        F.sum(F.col("value").cast("decimal(24,6)")).cast("double")
    ).collect()[0][0]
    got = sum(r.attributed_revenue for r in out)
    n_credits = sum(r.n_credits for r in out)
    assert abs(got - rev_total) <= n_credits * 1e-6 + 1e-9


# ---------------------------------------------------------------------------
# running_count_distinct (r9)
# ---------------------------------------------------------------------------


def test_running_count_distinct_hand_case(spark):
    """Values a,b,a,c per key: running distinct = 1,2,2,3; second key
    independent."""
    from ghcn_d_etl_project_spark.operators.windows import (
        running_count_distinct,
    )

    rows = [
        ("k1", 1, "a"),
        ("k1", 2, "b"),
        ("k1", 3, "a"),
        ("k1", 4, "c"),
        ("k2", 1, "a"),
    ]
    df = spark.createDataFrame(rows, "k string, seq int, v string")
    out = {
        (r["k"], r["seq"]): r["n_distinct_so_far"]
        for r in running_count_distinct(df, ["k"], ["seq"], "v").collect()
    }
    assert out == {
        ("k1", 1): 1,
        ("k1", 2): 2,
        ("k1", 3): 2,
        ("k1", 4): 3,
        ("k2", 1): 1,
    }


def test_running_count_distinct_ignores_nulls(spark):
    """NULLs never increment the count — SQL COUNT(DISTINCT) semantics
    (the DuckDB-native oracle would diverge otherwise)."""
    from ghcn_d_etl_project_spark.operators.windows import (
        running_count_distinct,
    )

    rows = [("k", 1, None), ("k", 2, "x"), ("k", 3, None)]
    df = spark.createDataFrame(rows, "k string, seq int, v string")
    out = {
        r["seq"]: r["n_distinct_so_far"]
        for r in running_count_distinct(df, ["k"], ["seq"], "v").collect()
    }
    assert out == {1: 0, 2: 1, 3: 1}


def test_running_count_distinct_validation(spark):
    from ghcn_d_etl_project_spark.operators.windows import (
        running_count_distinct,
    )

    df = spark.createDataFrame([("k", 1, "a")], "k string, seq int, v string")
    with pytest.raises(ValueError):
        running_count_distinct(df, [], ["seq"], "v")
    with pytest.raises(ValueError):
        running_count_distinct(df, ["k"], [], "v")
