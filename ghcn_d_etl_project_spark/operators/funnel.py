"""Event-sequence analytics: ordered funnels and cohort retention.

The reference's event-shaped inputs (station observation streams,
``src/transform/silver_processor.py``'s long event grain) stop at
windowed aggregation; a product-analytics user of the same engine
immediately asks the two questions this module answers: *how many users
progressed through an ordered sequence of actions* (funnel) and *how many
users from each signup period were still active k periods later*
(retention). Both are first-class operators in every commercial event
engine; both reduce to single-shuffle Spark plans.

Scale design:

``funnel_steps`` computes each user's earliest strictly-ordered
completion time per step with CHAINED CONDITIONAL WINDOW MINIMA over an
unordered user partition: ``t1 = min(ts) where type = step1``;
``t_i = min(ts) where type = step_i and ts > t_{i-1}``. Greedy earliest
completion is exact for funnel existence (if any ordered occurrence
chain exists, the greedy one does). All k windows share one partition
spec with NO ordering, so the physical plan is a single hash Exchange on
the user key and k pipelined Window operators with no Sort; the
follow-up per-user collapse reuses that partitioning (hash partitioning
on ``user`` satisfies the clustered distribution of a
``groupBy(user)``), and the final step-count aggregate is a partial-agg
single-row reduce. Total: ONE shuffle of the events table, regardless of
k. No self-joins (the naive k-way self-join funnel is O(n^k) and
unshippable at 100 TB).

``cohort_retention`` derives each user's cohort (period of first
activity) with the same partition-only window min, truncates activity to
periods, and counts distinct (cohort, offset, user) triples — the full
event volume shuffles once (the window); every later exchange carries
only map-side-collapsed triples or the O(cohorts x horizon) triangle.
Retention percentages come from a window over that tiny summary, never a
second pass over the events.

Neither operator collects to the driver; outputs are O(steps) and
O(cohorts x horizon) rows respectively.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "funnel_steps",
    "funnel_summary",
    "cohort_retention",
    "touch_attribution",
    "touch_attribution_decay",
]

_PERIODS = {"day": "day", "week": "week", "month": "month"}


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user earliest strictly-ordered completion time for each step.

    Returns one row per user observed in ``df`` with columns ``user_col``
    and ``t1..tk`` (timestamp of the user's earliest completion of step
    i that happens STRICTLY after their counted completion of step i-1;
    NULL if the user never got that far). Duplicate step names are
    rejected — the chained-minimum recurrence needs distinct predicates
    per level (the same type twice is expressible but almost always a
    caller bug).

    One shuffle: all window minima share an orderless partition on
    ``user_col`` and the collapsing ``groupBy`` reuses its partitioning.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"duplicate step names in funnel: {list(steps)}")
    reserved = [c for c in df.columns if c.startswith("__t")]
    if reserved:
        raise ValueError(f"input carries reserved __t* columns: {reserved}")

    w = Window.partitionBy(user_col)
    # NULL-timestamp events cannot be ordered in a funnel — drop them
    # EXPLICITLY (min() would skip them anyway, but a user whose only
    # step-1 event has a NULL ts should read as "not entered", not
    # depend on aggregate NULL-skipping trivia)
    out = df.select(user_col, ts_col, type_col).where(
        F.col(ts_col).isNotNull()
    )
    prev: str | None = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == F.lit(step)
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        out = out.withColumn(
            f"__t{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = f"__t{i}"
    return out.groupBy(user_col).agg(
        *[
            F.max(f"__t{i}").alias(f"t{i}")
            for i in range(1, len(steps) + 1)
        ]
    )


def funnel_summary(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion counts: one row per step with the number of
    users whose ordered journey reached it, the conversion rate
    relative to step 1, and the mean time-to-reach from step 1 in
    seconds among users who got there (0.0 at step 1; NULL when nobody
    did). Rates and times rounded to 6 places.

    Built on :func:`funnel_steps`; the final reshape is a single-row
    aggregate stacked to ``len(steps)`` rows — no extra pass over the
    events. The time average goes through an exact DECIMAL sum of
    microsecond deltas (engine-parity convention: accumulation order
    cannot change the value).
    """
    per_user = funnel_steps(
        df, steps, user_col=user_col, ts_col=ts_col, type_col=type_col
    )
    aggs: list[Column] = []
    for i in range(1, len(steps) + 1):
        aggs.append(F.count(f"t{i}").alias(f"c{i}"))
        aggs.append(
            F.sum(
                (F.unix_micros(f"t{i}") - F.unix_micros("t1")).cast(
                    "decimal(24,0)"
                )
            ).alias(f"d{i}")
        )
    counts = per_user.agg(*aggs)
    stack_args: list[Column] = []
    for i, step in enumerate(steps, start=1):
        stack_args += [
            F.lit(i).cast("long"),
            F.lit(step),
            F.col(f"c{i}").cast("long"),
            F.when(
                F.col("c1") > 0,
                F.round(F.col(f"c{i}") / F.col("c1"), 6),
            ).cast("double"),
            F.when(
                F.col(f"c{i}") > 0,
                F.round(
                    F.col(f"d{i}").cast("double")
                    / F.col(f"c{i}")
                    / 1000000.0,
                    6,
                ),
            ).cast("double"),
        ]
    n = len(steps)
    return counts.select(F.stack(F.lit(n), *stack_args)).toDF(
        "step_idx", "step", "users", "pct_of_first", "avg_sec_from_first"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: users grouped by the period of their
    FIRST observed activity (their cohort), counted once per subsequent
    period they were active in.

    Returns one row per (cohort_period, period_offset) with
    ``cohort_size`` (users whose first activity fell in that period —
    identical at every offset of a cohort), ``active_users`` (distinct
    users of the cohort active at that offset) and ``retention_pct``
    (= active / cohort_size, offset 0 is 1.0 by construction).

    ``period`` is ``day`` / ``week`` (ISO, Monday-truncated) / ``month``.
    One full-data shuffle (the orderless window min on ``user_col`` for
    cohort assignment); the follow-up exchanges move only the distinct
    (cohort, offset, user) triples — O(users x horizon), already heavily
    collapsed map-side — and the O(cohorts x horizon) triangle the
    percentage window divides over. The events table is scanned and
    shuffled exactly once.
    """
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {sorted(_PERIODS)}")
    unit = _PERIODS[period]
    per_day = {"day": 1, "week": 7}.get(period)

    w = Window.partitionBy(user_col)
    # NULL timestamps carry no period — dropped explicitly (a user with
    # only NULL-ts activity has no cohort, not a NULL-cohort row)
    x = (
        df.select(user_col, ts_col)
        .where(F.col(ts_col).isNotNull())
        .withColumn("__first", F.min(ts_col).over(w))
        .select(
            F.col(user_col),
            F.date_trunc(unit, "__first").cast("date").alias("__cohort"),
            F.date_trunc(unit, ts_col).cast("date").alias("__active"),
        )
    )
    if per_day is not None:
        offset = (
            F.datediff("__active", "__cohort") / F.lit(per_day)
        ).cast("long")
    else:
        offset = F.months_between("__active", "__cohort").cast("long")
    tri = (
        x.select(user_col, "__cohort", offset.alias("__offset"))
        .distinct()
        .groupBy("__cohort", "__offset")
        .agg(F.count("*").alias("active_users"))
    )
    wc = Window.partitionBy("__cohort")
    return (
        tri.withColumn(
            "cohort_size",
            F.max(
                F.when(F.col("__offset") == 0, F.col("active_users"))
            ).over(wc),
        )
        .select(
            F.date_format("__cohort", "yyyy-MM-dd").alias("cohort_period"),
            F.col("__offset").alias("period_offset"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.col("active_users").cast("long").alias("active_users"),
            F.round(
                F.col("active_users") / F.col("cohort_size"), 6
            ).alias("retention_pct"),
        )
    )


def touch_attribution(
    df: DataFrame,
    conversion_type: str,
    touch_types: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    none_label: str = "(none)",
) -> DataFrame:
    """Marketing-style conversion attribution: credit each conversion
    event's value to a touch event by the same user, under the two
    classic single-touch models, and return the per-model x per-touch-
    type revenue summary.

    * ``last_touch`` — the LATEST touch at or before the conversion: a
      backward as-of join (``operators/joins.py:asof_join`` — the
      union-and-fill construction, ONE shuffle + per-key sort, linear,
      no range pair explosion).
    * ``first_touch`` — the user's earliest touch ever (ties broken by
      ``(ts, id)`` struct-min, deterministic): a partial-aggregating
      groupBy to one row per user, then an equi-join back to the
      conversions; credit only when the first touch is not AFTER the
      conversion (no future leakage).

    Conversions with no creditable touch keep their revenue under
    ``none_label`` so each model's rows sum to total conversion revenue
    — attribution must be conservative (pinned in tests).

    Scale: two pushdown filters over one events scan; the as-of join
    shuffles |conv|+|touch| once; the first-touch aggregate map-side
    collapses to one row per user before its shuffle; the final
    aggregates are O(|touch_types|) rows. Output: ``model, touch_type,
    n_conversions, attributed_revenue`` (exact DECIMAL(24,6) sum cast
    to double — engine-order-independent).
    """
    from ghcn_d_etl_project_spark.operators.joins import asof_join
    from ghcn_d_etl_project_spark.plans._util import dsum

    conv = df.filter(F.col(type_col) == conversion_type).select(
        user_col, ts_col, value_col, id_col
    )
    touch = df.filter(F.col(type_col).isin(list(touch_types))).select(
        user_col, ts_col, type_col, id_col
    )

    def _summary(tagged: DataFrame, model: str) -> DataFrame:
        return tagged.groupBy(
            F.coalesce(F.col("__touch"), F.lit(none_label)).alias("touch_type")
        ).agg(
            F.count(F.lit(1)).alias("n_conversions"),
            dsum(value_col, scale=6).alias("attributed_revenue"),
        ).select(F.lit(model).alias("model"), "*")

    last = asof_join(
        conv, touch, on=user_col, left_ts=ts_col, right_ts=ts_col,
        right_payload=[type_col],
    ).withColumn("__touch", F.col(f"asof_{type_col}"))

    first_per_user = touch.groupBy(user_col).agg(
        F.min(F.struct(ts_col, id_col, type_col)).alias("__ft")
    )
    first = (
        conv.join(first_per_user, user_col, "left")
        .withColumn(
            "__touch",
            F.when(
                F.col("__ft").isNotNull()
                & (F.col("__ft")[ts_col] <= F.col(ts_col)),
                F.col("__ft")[type_col],
            ),
        )
    )
    return _summary(last, "last_touch").unionByName(
        _summary(first, "first_touch")
    )


def touch_attribution_decay(
    df: DataFrame,
    conversion_type: str,
    touch_types: Sequence[str],
    lookback_seconds: float = 3600.0,
    half_life_seconds: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    none_label: str = "(none)",
    round_digits: int = 6,
) -> DataFrame:
    """Time-decay MULTI-touch attribution: every touch in the lookback
    window before a conversion gets a share of its value, weighted
    ``exp(-ln2/half_life * age)`` and normalized per conversion — the
    fractional-credit model next to :func:`touch_attribution`'s
    single-touch arms.

    Scale design: conversion x touch candidate pairs come from the
    TWO-TABLE form of the gap-bucket range join
    (``operators/joins.py:range_join_pairs``' scheme): bucket width =
    the lookback, conversions probe (bucket-1, bucket), the join is an
    equi-join on (user, bucket) with the exact window predicate as a
    post-filter — fan-out bounded by touches-per-user-per-lookback,
    never O(n^2). One more shuffle normalizes per conversion (window on
    the conversion id), and the final aggregate is O(|touch types|).

    Engine-parity recipe: the irrational decay weight is QUANTIZED per
    pair (``round(exp(...), round_digits)`` as DECIMAL) so the
    per-conversion normalizer is an exact sum; each credit is again
    quantized before the final exact sum. Conservation therefore holds
    to |pairs| * 10^-round_digits, not exactly (each credit rounds
    once) — pinned with that tolerance in tests. Conversions with no
    touch in the window keep their full value under ``none_label``.

    Output: ``model, touch_type, n_credits, attributed_revenue``.
    """
    import math

    dec = f"decimal(18,{round_digits})"
    lam = math.log(2.0) / float(half_life_seconds)
    l_us = int(lookback_seconds * 1_000_000)

    conv = df.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("cid"),
        F.col(value_col).alias("val"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("cus"),
    )
    touch = df.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("tt"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tus"),
    )
    probe = conv.withColumn(
        "__b",
        F.explode(
            F.array(
                F.floor(F.col("cus") / l_us) - 1, F.floor(F.col("cus") / l_us)
            )
        ),
    )
    build = touch.withColumn("__b", F.floor(F.col("tus") / l_us))
    age = (F.col("cus") - F.col("tus")) / F.lit(1_000_000.0)
    pairs = (
        probe.join(build, ["u", "__b"])
        .filter(
            (F.col("tus") <= F.col("cus"))
            & (F.col("cus") - F.col("tus") <= l_us)
        )
        .select(
            "cid", "val", "tt",
            F.round(F.exp(F.lit(-lam) * age), round_digits)
            .cast(dec)
            .alias("__w"),
        )
    )
    w_cid = Window.partitionBy("cid")
    credits = pairs.withColumn("__sw", F.sum("__w").over(w_cid)).select(
        "tt",
        "cid",
        F.round(
            F.col("val")
            * (F.col("__w").cast("double") / F.col("__sw").cast("double")),
            round_digits,
        )
        .cast(dec)
        .alias("__q"),
    )
    attributed = credits.groupBy(F.col("tt").alias("touch_type")).agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.sum("__q").cast("double").alias("attributed_revenue"),
    )
    unmatched = (
        conv.join(pairs.select("cid").distinct(), "cid", "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum(F.col("val").cast(f"decimal(24,{round_digits})"))
            .cast("double")
            .alias("attributed_revenue"),
        )
        .select(F.lit(none_label).alias("touch_type"), "n_credits",
                "attributed_revenue")
        .filter(F.col("n_credits") > 0)
    )
    return attributed.unionByName(unmatched).select(
        F.lit("time_decay").alias("model"), "*"
    )
