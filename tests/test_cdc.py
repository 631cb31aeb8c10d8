"""CDC merge/SCD2, batch sessionization, and incremental-aggregate
operators: arm-by-arm MERGE semantics, history lineage invariants,
session boundary behavior, and partial-merge associativity."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.cdc import merge_upsert, scd2_apply
from ghcn_d_etl_project_spark.operators.incremental import (
    finalize_partials,
    merge_partials,
    partial_agg,
)
from ghcn_d_etl_project_spark.operators.sessions import (
    session_bounds,
    sessionize,
)


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )


def test_merge_all_four_arms(spark):
    """update (k=1), delete (k=2), carry (k=3), insert (k=9) — plus a
    delete for a missing key (k=8) which must be a no-op."""
    source = spark.createDataFrame(
        [(1, 11.0, False), (2, 0.0, True), (9, 99.0, False), (8, 0.0, True)],
        "k long, new_bal double, is_delete boolean",
    )
    out = merge_upsert(
        _target(spark),
        source,
        key="k",
        set_cols={"bal": "new_bal"},
        delete_col="is_delete",
    )
    got = sorted((r.k, r.name, r.bal) for r in out.collect())
    assert got == [(1, "a", 11.0), (3, "c", 30.0), (9, None, 99.0)]


def test_merge_insert_defaults_and_default_set_cols(spark):
    """Without set_cols, same-named non-key columns update by name;
    insert_defaults fills unmapped columns on insert."""
    source = spark.createDataFrame([(3, 33.0), (4, 44.0)], "k long, bal double")
    out = merge_upsert(
        _target(spark),
        source,
        key="k",
        insert_defaults={"name": F.lit("NEW")},
    )
    got = sorted((r.k, r.name, r.bal) for r in out.collect())
    assert got == [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 33.0), (4, "NEW", 44.0)]


def test_merge_null_attribute_is_not_absence(spark):
    """A matched source row with a NULL new value must still update (to
    NULL) — presence is tracked by marker columns, not null probing."""
    source = spark.createDataFrame([(2, None)], "k long, new_bal double")
    out = merge_upsert(
        _target(spark), source, key="k", set_cols={"bal": "new_bal"}
    )
    got = {r.k: r.bal for r in out.collect()}
    assert got == {1: 10.0, 2: None, 3: 30.0}


def test_merge_validates_inputs(spark):
    t = _target(spark)
    s = spark.createDataFrame([(1, 1.0)], "k long, new_bal double")
    with pytest.raises(ValueError, match="merge key"):
        merge_upsert(t, s, key="missing")
    with pytest.raises(ValueError, match="set_cols source"):
        merge_upsert(t, s, key="k", set_cols={"bal": "nope"})
    with pytest.raises(ValueError, match="set_cols target"):
        merge_upsert(t, s, key="k", set_cols={"nope": "new_bal"})
    with pytest.raises(ValueError, match="reserved"):
        merge_upsert(
            t.withColumn("__merge_t_present", F.lit(1)), s, key="k"
        )


# ---------------------------------------------------------------------------
# scd2_apply
# ---------------------------------------------------------------------------


def _ts(day):
    return dt.datetime(2024, 1, day)


def _history(spark):
    # k=1 has one closed + one current row; k=2 current only
    return spark.createDataFrame(
        [
            (1, "v1", _ts(1), _ts(5)),
            (1, "v2", _ts(5), None),
            (2, "x1", _ts(3), None),
        ],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )


def test_scd2_change_closes_and_opens(spark):
    changes = spark.createDataFrame(
        [(1, "v3", _ts(9))], "k long, attr string, eff_ts timestamp"
    )
    out = scd2_apply(_history(spark), changes, key="k", attrs=["attr"])
    rows = sorted(
        (r.k, r.attr, r.valid_from, r.valid_to) for r in out.collect()
    )
    assert rows == [
        (1, "v1", _ts(1), _ts(5)),      # closed history untouched
        (1, "v2", _ts(5), _ts(9)),      # current row closed at eff
        (1, "v3", _ts(9), None),        # new current opened
        (2, "x1", _ts(3), None),        # unrelated key untouched
    ]


def test_scd2_identical_change_is_noop(spark):
    changes = spark.createDataFrame(
        [(2, "x1", _ts(9))], "k long, attr string, eff_ts timestamp"
    )
    out = scd2_apply(_history(spark), changes, key="k", attrs=["attr"])
    assert sorted(
        (r.k, r.attr, r.valid_from, r.valid_to) for r in out.collect()
    ) == [
        (1, "v1", _ts(1), _ts(5)),
        (1, "v2", _ts(5), None),
        (2, "x1", _ts(3), None),
    ]


def test_scd2_new_key_opens_without_closing(spark):
    changes = spark.createDataFrame(
        [(7, "n1", _ts(4))], "k long, attr string, eff_ts timestamp"
    )
    out = scd2_apply(_history(spark), changes, key="k", attrs=["attr"])
    new = [r for r in out.collect() if r.k == 7]
    assert len(new) == 1 and new[0].valid_from == _ts(4) and new[0].valid_to is None
    # one current row per key afterwards
    cur = out.filter(F.col("valid_to").isNull()).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_null_attr_transition_counts_as_change(spark):
    """NULL -> value and value -> NULL are real changes (null-safe
    comparison), not no-ops."""
    hist = spark.createDataFrame(
        [(1, None, _ts(1), None)],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, "now-set", _ts(2))], "k long, attr string, eff_ts timestamp"
    )
    out = scd2_apply(hist, changes, key="k", attrs=["attr"]).collect()
    assert {(r.attr, r.valid_to) for r in out} == {
        (None, _ts(2)),
        ("now-set", None),
    }


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


def _events(spark):
    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        # user 1: 3 events 10min apart (one session), then a 31-min gap
        (1, base, 100),
        (1, base + dt.timedelta(minutes=10), 101),
        (1, base + dt.timedelta(minutes=20), 102),
        (1, base + dt.timedelta(minutes=51), 103),
        # user 2: gap EXACTLY the threshold -> same session (strict >)
        (2, base, 200),
        (2, base + dt.timedelta(minutes=30), 201),
        # user 2: one microsecond over -> new session
        (2, base + dt.timedelta(minutes=60, microseconds=1), 202),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")


def test_session_boundaries_strict_gap(spark):
    out = sessionize(
        _events(spark), "user_id", "ts", gap_seconds=1800, order_cols=("event_id",)
    )
    got = {r.event_id: r.session_seq for r in out.collect()}
    assert got == {100: 1, 101: 1, 102: 1, 103: 2, 200: 1, 201: 1, 202: 2}


def test_session_bounds_rollup(spark):
    out = session_bounds(
        _events(spark), "user_id", "ts", gap_seconds=1800, order_cols=("event_id",)
    )
    rows = {(r.user_id, r.session_seq): r.n_events for r in out.collect()}
    assert rows == {(1, 1): 3, (1, 2): 1, (2, 1): 2, (2, 2): 1}
    s = {
        (r.user_id, r.session_seq): (r.session_start, r.session_end)
        for r in out.collect()
    }
    start, end = s[(1, 1)]
    assert (end - start) == dt.timedelta(minutes=20)


def test_session_single_shuffle_single_sort(spark):
    """The running-sum window consumes the lag window's output, so two
    Window operators are unavoidable — but they share one partition
    ordering, so the plan must carry exactly ONE Exchange and ONE Sort
    (the per-key lower bound for order-dependent computation). A second
    Exchange/Sort would mean the windows disagree on ordering and the
    operator re-shuffles per function."""
    out = sessionize(
        _events(spark), "user_id", "ts", gap_seconds=1800, order_cols=("event_id",)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort ") == 1, plan


# ---------------------------------------------------------------------------
# incremental partial aggregates
# ---------------------------------------------------------------------------


def _batches(spark):
    rows = [("a", i, float(i)) for i in range(1, 11)] + [
        ("b", i, 2.0 * i) for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "g string, q long, price double")
    return [
        df.filter(F.col("q") % 3 == r) for r in range(3)
    ], df


SPECS = [
    ("q", "sum", "sum_q"),
    ("q", "count", "n"),
    ("price", "min", "min_p"),
    ("price", "max", "max_p"),
    ("price", "avg", "avg_p"),
]


def test_merge_partials_equals_full_recompute(spark):
    batches, full = _batches(spark)
    parts = [partial_agg(b, ["g"], SPECS) for b in batches]
    merged = finalize_partials(merge_partials(parts, ["g"], SPECS), SPECS)
    direct = finalize_partials(
        merge_partials([partial_agg(full, ["g"], SPECS)], ["g"], SPECS), SPECS
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    got = {r.g: r for r in merged.collect()}
    assert got["a"].sum_q == 55.0 and got["a"].n == 10
    assert got["a"].avg_p == pytest.approx(5.5)
    assert got["b"].min_p == 2.0 and got["b"].max_p == 10.0


def test_merge_partials_is_associative(spark):
    """Fold order must not matter: ((b0+b1)+b2) == (b0+(b1+b2))."""
    batches, _ = _batches(spark)
    parts = [partial_agg(b, ["g"], SPECS) for b in batches]
    left = merge_partials(
        [merge_partials(parts[:2], ["g"], SPECS), parts[2]], ["g"], SPECS
    )
    right = merge_partials(
        [parts[0], merge_partials(parts[1:], ["g"], SPECS)], ["g"], SPECS
    )
    assert sorted(map(tuple, finalize_partials(left, SPECS).collect())) == sorted(
        map(tuple, finalize_partials(right, SPECS).collect())
    )


def test_incremental_rejects_unknown_op(spark):
    batches, _ = _batches(spark)
    with pytest.raises(ValueError, match="unsupported op"):
        partial_agg(batches[0], ["g"], [("q", "median", "m")])


def test_merge_broadcast_strategy_matches_shuffle(spark):
    """strategy='broadcast' (three map-only broadcast arms, target never
    shuffled) must produce exactly the full-outer shuffle plan's rows —
    including deletes, inserts, null attribute updates, and a NULL-key
    source row (never matches; becomes an insert on both paths)."""
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (None, "n", 5.0)],
        "k long, name string, bal double",
    )
    source = spark.createDataFrame(
        [(1, 11.0, False), (2, 0.0, True), (9, 99.0, False),
         (8, 0.0, True), (None, 7.0, False)],
        "k long, new_bal double, is_delete boolean",
    )
    kw = dict(key="k", set_cols={"bal": "new_bal"}, delete_col="is_delete")
    a = merge_upsert(target, source, strategy="shuffle", **kw)
    b = merge_upsert(target, source, strategy="broadcast", **kw)
    key = lambda r: (repr(r.k), repr(r.name), repr(r.bal))
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_merge_broadcast_never_shuffles_target(spark):
    """Plan pin for the CDC scale shape: 3 BroadcastHashJoins, zero
    SortMergeJoin/ShuffledHashJoin — the 100 TB snapshot is scanned
    (twice) but never shuffled."""
    target = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, bal double"
    )
    source = spark.createDataFrame([(1, 5.0), (200, 6.0)], "k long, bal double")
    out = merge_upsert(target, source, key="k", strategy="broadcast")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 3, plan


def test_merge_rejects_unknown_strategy(spark):
    t = _target(spark)
    s = spark.createDataFrame([(1, 1.0)], "k long, bal double")
    with pytest.raises(ValueError, match="strategy"):
        merge_upsert(t, s, key="k", strategy="hash")


def test_sessionize_matches_native_session_window(spark):
    """Cross-validate the batch sessionizer against Spark's own
    ``F.session_window`` aggregation on the same static events: identical
    (user, session_start, session_end, n_events) sets. (Boundary note:
    session_window's window end is exclusive — an event at EXACTLY
    gap distance starts a new session there, while the batch operator
    keeps it (strict >); the events fixture has microsecond timestamps,
    so exact-boundary gaps cannot occur and the two agree.)"""
    from tests.conftest import SF_DIR
    from ghcn_d_etl_project_spark.plans._util import t as tbl

    e = tbl(spark, SF_DIR, "events")
    ours = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in session_bounds(
            e, "user_id", "ts", gap_seconds=1800, order_cols=("event_id",)
        ).collect()
    }
    native = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert ours == native


# ---------------------------------------------------------------------------
# scd2_apply broadcast strategy
# ---------------------------------------------------------------------------


def test_scd2_broadcast_strategy_matches_shuffle(spark):
    """strategy='broadcast' (three map-only broadcast arms, current
    slice never shuffled) must produce exactly the full-outer shuffle
    plan's rows — closes, no-ops, fresh-key opens, null-attr
    transitions, and a NULL-key change (never matches; opens fresh on
    both paths)."""
    hist = spark.createDataFrame(
        [
            (1, "v1", _ts(1), _ts(5)),
            (1, "v2", _ts(5), None),
            (2, "x1", _ts(3), None),
            (3, None, _ts(2), None),
        ],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [
            (1, "v3", _ts(9)),        # real change: close + open
            (2, "x1", _ts(9)),        # identical: no-op
            (3, "set", _ts(9)),       # NULL -> value: real change
            (7, "n1", _ts(4)),        # fresh key: open only
            (None, "nk", _ts(6)),     # NULL key: never matches, opens
        ],
        "k long, attr string, eff_ts timestamp",
    )
    kw = dict(key="k", attrs=["attr"])
    a = scd2_apply(hist, changes, strategy="shuffle", **kw)
    b = scd2_apply(hist, changes, strategy="broadcast", **kw)
    key = lambda r: (repr(r.k), repr(r.attr), repr(r.valid_from), repr(r.valid_to))
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_scd2_broadcast_never_shuffles_current(spark):
    """Plan pin for the SCD2 scale shape: 4 BroadcastHashJoins, zero
    SortMergeJoin/ShuffledHashJoin — the 100 TB dimension history is
    scanned (narrowly) but never shuffled. (4, not 3: Catalyst rewrites
    the reused left-join arm into a LeftOuter for close-or-carry plus an
    Inner with the differs condition pushed into the join for matched
    opens — still map-only.) The only Exchange in the plan hashes the
    matched-key set, bounded by the batch. The default full-outer path
    CANNOT get this shape: Spark refuses to broadcast either side of a
    full-outer join."""
    hist = spark.createDataFrame(
        [(i, f"v{i}", _ts(1), None) for i in range(100)],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, "new", _ts(5)), (200, "fresh", _ts(5))],
        "k long, attr string, eff_ts timestamp",
    )
    out = scd2_apply(hist, changes, key="k", attrs=["attr"], strategy="broadcast")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 4, plan


def test_scd2_validates_inputs(spark):
    hist = _history(spark)
    changes = spark.createDataFrame(
        [(1, "v", _ts(2))], "k long, attr string, eff_ts timestamp"
    )
    with pytest.raises(ValueError, match="strategy"):
        scd2_apply(hist, changes, key="k", attrs=["attr"], strategy="aqe")
    # reserved internal names must raise, not be silently clobbered
    with pytest.raises(ValueError, match="__cur"):
        scd2_apply(
            hist.withColumn("__cur", F.lit(1)), changes, key="k", attrs=["attr"]
        )
    with pytest.raises(ValueError, match="__new_attr"):
        scd2_apply(
            hist, changes.withColumn("__new_attr", F.lit(1)),
            key="k", attrs=["attr"],
        )


def test_partials_user_alias_with_avg_prefix_survives(spark):
    """Round-7 advice: a user sum alias that happens to start with
    ``__avg_`` must flow through finalize (hidden partials are tracked
    explicitly, not inferred by prefix), and an alias colliding with a
    generated hidden name raises."""
    df = spark.createDataFrame([(1, 2.0), (1, 4.0)], "g long, q double")
    specs = [("q", "sum", "__avg_ish_total"), ("q", "avg", "m")]
    out = finalize_partials(
        merge_partials([partial_agg(df, ["g"], specs)], ["g"], specs), specs
    )
    row = out.collect()[0]
    assert row["__avg_ish_total"] == 6.0 and row["m"] == 3.0

    bad = [("q", "sum", "__avg_sum_m"), ("q", "avg", "m")]
    with pytest.raises(ValueError, match="collid"):
        partial_agg(df, ["g"], bad)
    with pytest.raises(ValueError, match="collid"):
        partial_agg(df, ["g"], [("q", "sum", "dup"), ("q", "max", "dup")])


# ---------------------------------------------------------------------------
# mergeable quantile partials
# ---------------------------------------------------------------------------


def _qops():
    from ghcn_d_etl_project_spark.operators.incremental import (
        finalize_quantiles,
        merge_quantile_partials,
        quantile_partial,
    )

    return quantile_partial, merge_quantile_partials, finalize_quantiles


def test_quantile_partials_merge_equals_one_shot(spark):
    """Splitting the data into any number of batches and merging their
    histogram partials must be bit-identical to sketching all rows at
    once (summation is associative+commutative), including merging
    incrementally in two steps."""
    qp, mq, fq = _qops()
    rows = [("k", float(v % 977)) for v in range(3000)]
    df = spark.createDataFrame(rows, "g string, v double")
    batches = [df.filter(F.col("v") % 3 == i) for i in range(3)]
    args = (["g"], "v", 0.0, 1000.0, 50)

    one_shot = fq(mq([qp(df, *args)], ["g"]), ["g"], 0.0, 1000.0, 50)
    all_at_once = fq(
        mq([qp(b, *args) for b in batches], ["g"]), ["g"], 0.0, 1000.0, 50
    )
    stepwise = fq(
        mq(
            [mq([qp(batches[0], *args), qp(batches[1], *args)], ["g"]),
             qp(batches[2], *args)],
            ["g"],
        ),
        ["g"], 0.0, 1000.0, 50,
    )
    key = lambda r: (r.g, r.q, repr(r.est))
    expect = sorted(map(key, one_shot.collect()))
    assert sorted(map(key, all_at_once.collect())) == expect
    assert sorted(map(key, stepwise.collect())) == expect


def test_quantile_estimate_within_bin_width_of_exact(spark):
    """For in-domain data the interpolated estimate is exact to within
    one bin width of the true percentile."""
    qp, mq, fq = _qops()
    import random

    random.seed(11)
    vals = sorted(random.uniform(0, 1000) for _ in range(5000))
    df = spark.createDataFrame([("k", v) for v in vals], "g string, v double")
    n_bins = 100
    width = 1000.0 / n_bins
    out = fq(
        mq([qp(df, ["g"], "v", 0.0, 1000.0, n_bins)], ["g"]),
        ["g"], 0.0, 1000.0, n_bins, qs=(0.5, 0.95, 0.99),
    )
    for r in out.collect():
        exact = vals[min(len(vals) - 1, int(r.q * len(vals)) - 1)]
        assert abs(r.est - exact) <= width + 1e-9, (r.q, r.est, exact)


def test_quantile_partial_excludes_nulls_and_validates(spark):
    qp, mq, fq = _qops()
    df = spark.createDataFrame(
        [("k", 1.0), ("k", None), ("k", 2.0)], "g string, v double"
    )
    part = qp(df, ["g"], "v", 0.0, 10.0, 5)
    assert part.agg(F.sum("__qcnt")).collect()[0][0] == 2  # NULL dropped
    with pytest.raises(ValueError, match="hi > lo"):
        qp(df, ["g"], "v", 10.0, 10.0, 5)
    with pytest.raises(ValueError, match="n_bins"):
        qp(df, ["g"], "v", 0.0, 10.0, 1)


def test_quantile_out_of_domain_clamps_to_edge_bins(spark):
    """Values outside [lo, hi) land in the edge bins; estimates stay
    inside the declared domain (documented degradation, never a crash
    or an out-of-range answer)."""
    qp, mq, fq = _qops()
    df = spark.createDataFrame(
        [("k", -500.0), ("k", -400.0), ("k", 5.0), ("k", 2000.0)],
        "g string, v double",
    )
    out = fq(
        mq([qp(df, ["g"], "v", 0.0, 10.0, 5)], ["g"]),
        ["g"], 0.0, 10.0, 5, qs=(0.01, 0.5, 0.99),
    )
    for r in out.collect():
        assert 0.0 <= r.est <= 10.0


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_ops_and_values(spark):
    from ghcn_d_etl_project_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, name string, bal double",
    )
    new = spark.createDataFrame(
        [(1, "a", 11.0), (3, "c", None), (4, "d2", 40.0), (9, "x", 90.0)],
        "k long, name string, bal double",
    )
    got = {
        r.k: (r.op, r.name, r.bal)
        for r in snapshot_diff(old, new, "k").collect()
    }
    # k=3 identical (null-safely) -> absent; D carries OLD values
    assert got == {
        1: ("U", "a", 11.0),
        2: ("D", "b", 20.0),
        4: ("U", "d2", 40.0),
        9: ("I", "x", 90.0),
    }


def test_snapshot_diff_merge_round_trip_randomized(spark):
    """The defining law: merge_upsert(old, snapshot_diff(old, new)) must
    reproduce new EXACTLY — across seeded random snapshot pairs with
    overlapping keys, NULL attributes, and disjoint regions."""
    import random

    from ghcn_d_etl_project_spark.operators.cdc import (
        merge_upsert,
        snapshot_diff,
    )

    for seed in (3, 17, 99):
        rnd = random.Random(seed)

        def rows():
            out = []
            for k in range(60):
                if rnd.random() < 0.7:
                    name = rnd.choice(["a", "b", None])
                    bal = rnd.choice([None, round(rnd.uniform(0, 100), 2)])
                    out.append((k, name, bal))
            return out

        old = spark.createDataFrame(rows(), "k long, name string, bal double")
        new = spark.createDataFrame(rows(), "k long, name string, bal double")
        diff = snapshot_diff(old, new, "k").withColumn(
            "is_delete", F.col("op") == "D"
        )
        applied = merge_upsert(
            old,
            diff,
            key="k",
            set_cols={"name": "name", "bal": "bal"},
            delete_col="is_delete",
        )
        key = lambda r: (r.k, repr(r.name), repr(r.bal))
        assert sorted(map(key, applied.collect())) == sorted(
            map(key, new.collect())
        ), f"round trip failed for seed {seed}"


def test_snapshot_diff_validates_inputs(spark):
    from ghcn_d_etl_project_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(1, 1.0)], "k long, bal double")
    new = spark.createDataFrame([(1, 2.0)], "k long, bal double")
    with pytest.raises(ValueError, match="diff key"):
        snapshot_diff(old, new, "missing")
    with pytest.raises(ValueError, match="reserved"):
        snapshot_diff(old.withColumn("op", F.lit(1)), new, "k")


def test_finalize_quantiles_validates_qs(spark):
    qp, mq, fq = _qops()
    df = spark.createDataFrame([("k", 1.0)], "g string, v double")
    m = mq([qp(df, ["g"], "v", 0.0, 10.0, 5)], ["g"])
    with pytest.raises(ValueError, match="non-empty"):
        fq(m, ["g"], 0.0, 10.0, 5, qs=())
    with pytest.raises(ValueError, match="outside"):
        fq(m, ["g"], 0.0, 10.0, 5, qs=(0.5, 1.5))
    with pytest.raises(ValueError, match="outside"):
        fq(m, ["g"], 0.0, 10.0, 5, qs=(0.0,))


def test_evolve_target_schema_then_merge(spark):
    """A change feed growing a new column: evolve adds it as typed NULL
    on the target, and the subsequent default-set_cols merge carries it
    — NULL for untouched rows, the source value on update and insert.
    A type CHANGE on an existing column refuses loudly."""
    from ghcn_d_etl_project_spark.operators.cdc import (
        evolve_target_schema,
        merge_upsert,
    )

    target = _target(spark)  # k, name, bal
    source = spark.createDataFrame(
        [(1, 11.0, "gold"), (9, 99.0, "new")],
        "k long, bal double, tier string",
    )
    evolved = evolve_target_schema(target, source, key="k")
    assert evolved.columns == ["k", "name", "bal", "tier"]
    assert dict(evolved.dtypes)["tier"] == "string"
    out = merge_upsert(evolved, source, key="k")
    got = {r.k: (r.name, r.bal, r.tier) for r in out.collect()}
    assert got == {
        1: ("a", 11.0, "gold"),
        2: ("b", 20.0, None),
        3: ("c", 30.0, None),
        9: (None, 99.0, "new"),
    }
    # no new columns -> same frame back, no projection added
    assert evolve_target_schema(target, target, key="k").columns == target.columns

    bad = spark.createDataFrame([(1, "11")], "k long, bal string")
    with pytest.raises(ValueError, match="type change"):
        evolve_target_schema(target, bad, key="k")


def test_topk_partials_merge_equals_one_shot_with_ties(spark):
    """Maintained top-k: any batch split merges to the one-shot answer,
    overtakes across batches are honored (a value unseen in batch 1 can
    win overall), and ties rank deterministically (count desc, value
    asc)."""
    from ghcn_d_etl_project_spark.operators.incremental import (
        finalize_topk,
        merge_topk_partials,
        topk_partial,
    )

    rows = (
        [("g", "b")] * 5 + [("g", "a")] * 5      # tie: a ranks before b
        + [("g", "c")] * 2 + [("g", "d")] * 7    # d overtakes in batch 2
    )
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], "g string, v string, i long"
    )
    batches = [df.filter(F.col("i") < 9), df.filter(F.col("i") >= 9)]
    one = finalize_topk(
        merge_topk_partials([topk_partial(df, ["g"], "v")], ["g"], "v"),
        ["g"], "v", k=3,
    )
    merged = finalize_topk(
        merge_topk_partials(
            [topk_partial(b, ["g"], "v") for b in batches], ["g"], "v"
        ),
        ["g"], "v", k=3,
    )
    expect = [("g", "d", 7, 1), ("g", "a", 5, 2), ("g", "b", 5, 3)]
    key = lambda r: (r.g, r.v, r.n, r.rank)
    assert sorted(map(key, one.collect()), key=lambda x: x[3]) == expect
    assert sorted(map(key, merged.collect()), key=lambda x: x[3]) == expect

    import pytest as _pytest
    with _pytest.raises(ValueError, match="k >= 1"):
        finalize_topk(topk_partial(df, ["g"], "v"), ["g"], "v", k=0)


def test_distinct_partials_error_bands(spark):
    """Maintained distinct counts: merged-partial estimates land within
    the HLL error band of exact AND of the one-shot sketch (sparse-mode
    promotion makes bit-equality impossible — the contract is the
    band), and stepwise merge agrees with all-at-once."""
    import math

    from ghcn_d_etl_project_spark.operators.incremental import (
        distinct_partial,
        finalize_distinct,
        merge_distinct_partials,
    )

    lg_k = 12
    band = 3 * 1.04 / math.sqrt(2 ** lg_k)  # ~4.9% at lg_k=12
    df = spark.createDataFrame(
        [("g", i % 3000, i) for i in range(9000)], "g string, v long, i long"
    )
    batches = [df.filter(F.col("i") % 3 == b) for b in range(3)]
    parts = [distinct_partial(b, ["g"], "v", lg_k) for b in batches]

    one = finalize_distinct(
        merge_distinct_partials(
            [distinct_partial(df, ["g"], "v", lg_k)], ["g"]
        ), ["g"],
    ).collect()[0].approx_distinct
    merged = finalize_distinct(
        merge_distinct_partials(parts, ["g"]), ["g"]
    ).collect()[0].approx_distinct
    stepwise = finalize_distinct(
        merge_distinct_partials(
            [merge_distinct_partials(parts[:2], ["g"]), parts[2]], ["g"]
        ), ["g"],
    ).collect()[0].approx_distinct

    exact = 3000
    for est in (one, merged, stepwise):
        assert abs(est - exact) / exact <= band, (est, exact)
    assert abs(merged - one) / exact <= band
    # register-max associativity: stepwise union == flat union exactly
    # (both paths end fully dense here)
    assert stepwise == merged
