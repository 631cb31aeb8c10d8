"""Window-function queries (SURVEY.md §2.6: W1-W3 + extensions).

Per-customer order history plays the role of the reference's per-station
daily series. Every window orders by (date, orderkey) — the unique
tiebreaker makes lag/row_number deterministic for oracle hashing (the
reference orders by DATE alone, which is unique per station there).

Rolling sums/avgs go through DECIMAL inside the frame so Spark's and
DuckDB's accumulation orders cannot produce differing doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.windows import (
    ordered_window,
    rolling_range,
    rolling_rows,
    with_lags,
)
from ghcn_d_etl_project_spark.plans._util import as_date_str, t
from ghcn_d_etl_project_spark.plans.registry import register

_WIN_SQL = "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"

# ---------------------------------------------------------------------------
# W1: lag features (+ lead, the reference's missing twin)
# ---------------------------------------------------------------------------

_LAG_ORACLE = f"""
SELECT o_orderkey, o_custkey, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       lag(o_totalprice, 1) OVER ({_WIN_SQL}) AS prev_price,
       lag(o_totalprice, 2) OVER ({_WIN_SQL}) AS prev2_price,
       lead(o_totalprice, 1) OVER ({_WIN_SQL}) AS next_price,
       CAST(date_diff('day',
                      lag(CAST(o_orderdate AS DATE), 1) OVER ({_WIN_SQL}),
                      CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
FROM orders
"""


@register("lag_features", oracle=_LAG_ORACLE, tags=("window",), bench=True, late=True)
def lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag/lead features over a per-entity time series (W1,
    ``gold_processor.py:185-194``) plus the gap-to-previous-event length —
    all functions share one window spec = one shuffle."""
    o = t(spark, sf_dir, "orders")
    w = ordered_window(["o_custkey"], ["o_orderdate", "o_orderkey"])
    out = with_lags(o, w, ["o_totalprice"], offsets=(1, 2), prefix="prev")
    d = F.col("o_orderdate").cast("date")
    return (
        out.withColumn("next_o_totalprice", F.lead("o_totalprice", 1).over(w))
        .withColumn(
            "days_since_prev",
            F.datediff(d, F.lag(d, 1).over(w)).cast("long"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            as_date_str("o_orderdate").alias("order_date"),
            F.col("prev_o_totalprice").alias("prev_price"),
            F.col("prev2_o_totalprice").alias("prev2_price"),
            F.col("next_o_totalprice").alias("next_price"),
            "days_since_prev",
        )
    )


# ---------------------------------------------------------------------------
# W2/W3: ROWS-frame rolling mean/sum + running total
# ---------------------------------------------------------------------------

_ROLLING_ORACLE = f"""
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2)))
              OVER ({_WIN_SQL} ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS rolling_sum_7,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2)))
              OVER ({_WIN_SQL} ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(o_totalprice)
              OVER ({_WIN_SQL} ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         AS rolling_avg_7,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2)))
              OVER ({_WIN_SQL} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_total,
       CAST(COUNT(*) OVER ({_WIN_SQL} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS order_seq
FROM orders
"""


@register("rolling_features", oracle=_ROLLING_ORACLE, tags=("window",), bench=True, late=True)
def rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame rolling sum/avg over the trailing 7 rows (W2/W3,
    ``gold_processor.py:195-199``) plus a running total and sequence
    number. Decimal-quantized inside the frame for exact parity."""
    o = t(spark, sf_dir, "orders")
    w = ordered_window(["o_custkey"], ["o_orderdate", "o_orderkey"])
    dec = F.col("o_totalprice").cast("decimal(24,2)")
    out = rolling_rows(
        o,
        w,
        {
            "rolling_sum_dec": F.sum(dec),
            "rolling_cnt": F.count("o_totalprice"),
        },
        preceding=6,
    )
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return out.select(
        "o_orderkey",
        "o_custkey",
        as_date_str("o_orderdate").alias("order_date"),
        F.col("rolling_sum_dec").cast("double").alias("rolling_sum_7"),
        (F.col("rolling_sum_dec").cast("double") / F.col("rolling_cnt")).alias(
            "rolling_avg_7"
        ),
        F.sum(dec).over(run).cast("double").alias("running_total"),
        F.count(F.lit(1)).over(run).cast("long").alias("order_seq"),
    )


# ---------------------------------------------------------------------------
# RANGE-frame rolling window over calendar days (the correct-semantics twin)
# ---------------------------------------------------------------------------

_RANGE_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
           AS day_num
  FROM orders
)
SELECT o_orderkey, o_custkey, day_num,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2)))
              OVER (PARTITION BY o_custkey ORDER BY day_num
                    RANGE BETWEEN 89 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS spend_90d,
       CAST(COUNT(*)
              OVER (PARTITION BY o_custkey ORDER BY day_num
                    RANGE BETWEEN 89 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS orders_90d
FROM base
"""


@register("rolling_range_days", oracle=_RANGE_ORACLE, tags=("window",), late=True)
def rolling_range_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling 90-calendar-day spend per customer — the
    gap-correct alternative to the reference's ROWS-based "7-day" frames
    (SURVEY §2.6 W2 note). Ordering is a day number so the frame is
    calendar-based; ties (same-day orders) share a frame, which ROWS
    frames cannot express."""
    o = t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date"))
        .cast("long")
        .alias("day_num"),
    )
    out = rolling_range(
        base,
        partition_by=["o_custkey"],
        order_num_col=F.col("day_num"),
        agg_cols={
            "spend_90d_dec": F.sum(F.col("o_totalprice").cast("decimal(24,2)")),
            "orders_90d": F.count(F.lit(1)),
        },
        preceding=89,
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "day_num",
        F.col("spend_90d_dec").cast("double").alias("spend_90d"),
        F.col("orders_90d").cast("long").alias("orders_90d"),
    )


# ---------------------------------------------------------------------------
# Ranking family + top-k per group (absent from the reference; SURVEY §2.6)
# ---------------------------------------------------------------------------

_RANK_ORACLE = """
WITH ranked AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
         CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT)
           AS rnk,
         CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
              AS BIGINT) AS drnk,
         CAST(ntile(4) OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS quartile,
         ROUND(percent_rank() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC), 6) AS prank,
         ROUND(cume_dist() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC), 6) AS cume
  FROM orders
)
SELECT * FROM ranked WHERE rn <= 3
"""


@register("rank_topk_per_group", oracle=_RANK_ORACLE, tags=("window",), late=True)
def rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer with the full ranking + distribution
    family (row_number/rank/dense_rank/ntile/percent_rank/cume_dist) —
    the distributed top-k-per-group pattern; non-winners never leave
    their partition. percent_rank and cume_dist order by the VALUE alone
    (tie-stable by definition: equal prices share a rank), while
    row_number/ntile carry the unique o_orderkey tiebreaker."""
    o = t(spark, sf_dir, "orders")
    by_price = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    w_price = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    w_full = Window.partitionBy("o_custkey").orderBy(*by_price)
    # Ranks are computed over the FULL per-customer history, then filtered
    # (filtering first would re-rank the survivors).
    ranked = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w_full).cast("long").alias("rn"),
        F.rank().over(w_price).cast("long").alias("rnk"),
        F.dense_rank().over(w_price).cast("long").alias("drnk"),
        F.ntile(4).over(w_full).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w_price), 6).alias("prank"),
        F.round(F.cume_dist().over(w_price), 6).alias("cume"),
    )
    return ranked.filter(F.col("rn") <= 3)


# ---------------------------------------------------------------------------
# Batch sessionization (extension): gap-based sessions over the event log
# ---------------------------------------------------------------------------

_SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
                OR epoch_us(ts)
                   - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id))
                   > 1800000000
              THEN 1 ELSE 0 END AS new_sess,
         event_id
  FROM events
), sessions AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM flagged
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_seq
"""


@register(
    "sessionize_events",
    oracle=_SESSIONIZE_ORACLE,
    tags=("window", "session"),
    late=True,
    bench=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (``operators/sessions.py``): per-user sessions
    with a 30-minute inactivity gap, collapsed to one row per session
    (bounds, event count, exact value sum). The batch twin of the
    streaming ``session_window_agg`` query — gap decisions compare exact
    ``unix_micros`` so the boundary is bit-identical to the DuckDB
    oracle's ``epoch_us`` arithmetic; ``event_id`` breaks timestamp ties
    deterministically."""
    from ghcn_d_etl_project_spark.operators.sessions import session_bounds
    from ghcn_d_etl_project_spark.plans._util import dsum

    e = t(spark, sf_dir, "events")
    out = session_bounds(
        e,
        key="user_id",
        ts_col="ts",
        gap_seconds=1800,
        order_cols=("event_id",),
        aggs=[dsum("value", scale=6).alias("sum_value")],
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("session_seq").cast("long").alias("session_seq"),
        F.date_format("session_start", fmt).alias("session_start"),
        F.date_format("session_end", fmt).alias("session_end"),
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value",
    )


# ---------------------------------------------------------------------------
# Calendar densification + forward fill (extension): the missing-row half
# of the reference's ROWS-frame gap problem (gold_processor.py:195-199)
# ---------------------------------------------------------------------------

_GAP_FILL_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS total
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
spine AS (
  SELECT user_id, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM span
),
j AS (
  SELECT s.user_id, s.day, d.total
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
),
f AS (
  SELECT user_id, day, total,
         last_value(total IGNORE NULLS) OVER w AS total_ffill,
         CAST(max(CASE WHEN total IS NOT NULL THEN day END) OVER w AS DATE)
           AS obs_day
  FROM j
  WINDOW w AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day, total, total_ffill,
       CAST(total IS NULL AS BIGINT) AS is_gap,
       CAST(date_diff('day', obs_day, day) AS BIGINT) AS days_since_obs
FROM f
"""


@register(
    "gap_fill_events",
    oracle=_GAP_FILL_ORACLE,
    tags=("window", "timeseries"),
    late=True,
    bench=True,
)
def gap_fill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase totals per user, densified over each user's own
    [min, max] span with last-observation-carried-forward + staleness
    (``operators/timeseries.py:gap_fill_ffill``). The Spark side is the
    join-free lead-explode construction (one shuffle); the oracle is the
    textbook generate_series spine + LEFT JOIN + IGNORE NULLS window —
    two independent formulations of the same semantics cross-checking
    each other."""
    from ghcn_d_etl_project_spark.operators.timeseries import gap_fill_ffill
    from ghcn_d_etl_project_spark.plans._util import dsum

    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(dsum("value", scale=6).alias("total"))
    out = gap_fill_ffill(daily, ["user_id"], "day", ["total"])
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        as_date_str("day").alias("day"),
        "total",
        "total_ffill",
        "is_gap",
        "days_since_obs",
    )


# ---------------------------------------------------------------------------
# Event-sequence analytics (extension): ordered funnel, cohort retention,
# interval union — the product-analytics trio over the events table
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
), s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM s1
), s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
              OVER (PARTITION BY user_id) AS t3
  FROM s2
), u AS (
  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
  FROM s3 GROUP BY user_id
), c AS (
  SELECT COUNT(t1) AS c1, COUNT(t2) AS c2, COUNT(t3) AS c3,
         SUM(CAST(epoch_us(t1) - epoch_us(t1) AS DECIMAL(24,0))) AS d1,
         SUM(CAST(epoch_us(t2) - epoch_us(t1) AS DECIMAL(24,0))) AS d2,
         SUM(CAST(epoch_us(t3) - epoch_us(t1) AS DECIMAL(24,0))) AS d3
  FROM u
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
         CAST(c1 AS BIGINT) AS users,
         CASE WHEN c1 > 0 THEN ROUND(c1 * 1.0 / c1, 6) END AS pct_of_first,
         CASE WHEN c1 > 0
              THEN ROUND(CAST(d1 AS DOUBLE) / c1 / 1000000.0, 6)
         END AS avg_sec_from_first
  FROM c
  UNION ALL
  SELECT 2, 'click', CAST(c2 AS BIGINT),
         CASE WHEN c1 > 0 THEN ROUND(c2 * 1.0 / c1, 6) END,
         CASE WHEN c2 > 0
              THEN ROUND(CAST(d2 AS DOUBLE) / c2 / 1000000.0, 6)
         END FROM c
  UNION ALL
  SELECT 3, 'purchase', CAST(c3 AS BIGINT),
         CASE WHEN c1 > 0 THEN ROUND(c3 * 1.0 / c1, 6) END,
         CASE WHEN c3 > 0
              THEN ROUND(CAST(d3 AS DOUBLE) / c3 / 1000000.0, 6)
         END FROM c
)
"""


@register(
    "funnel_conversion",
    oracle=_FUNNEL_ORACLE,
    tags=("window", "events", "funnel"),
    late=True,
    bench=True,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered view -> click -> purchase funnel over the events
    table (``operators/funnel.py:funnel_summary``): users counted at
    step i only if step i happened strictly after their greedy-earliest
    completion of step i-1. The Spark plan is ONE shuffle — three
    conditional window minima sharing an orderless user partition, the
    per-user collapse reusing that partitioning, and a single-row final
    count; the naive k-way self-join formulation is O(n^k) and is
    exactly what this operator exists to avoid. Oracle restates the
    identical chained-minimum recurrence in DuckDB."""
    from ghcn_d_etl_project_spark.operators.funnel import funnel_summary

    e = t(spark, sf_dir, "events")
    return funnel_summary(e, ["view", "click", "purchase"])


_COHORT_ORACLE = """
WITH f AS (
  SELECT user_id, ts,
         MIN(ts) OVER (PARTITION BY user_id) AS first_ts
  FROM events
), p AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', first_ts) AS DATE) AS cohort,
         CAST(
           date_diff('day',
                     CAST(date_trunc('week', first_ts) AS DATE),
                     CAST(date_trunc('week', ts) AS DATE)) / 7
           AS BIGINT) AS period_offset
  FROM f
), tri AS (
  SELECT cohort, period_offset, COUNT(*) AS active_users
  FROM p GROUP BY cohort, period_offset
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_period,
       period_offset,
       CAST(MAX(CASE WHEN period_offset = 0 THEN active_users END)
              OVER (PARTITION BY cohort) AS BIGINT) AS cohort_size,
       CAST(active_users AS BIGINT) AS active_users,
       ROUND(active_users * 1.0 /
             MAX(CASE WHEN period_offset = 0 THEN active_users END)
               OVER (PARTITION BY cohort), 6) AS retention_pct
FROM tri
"""


@register(
    "cohort_retention_weekly",
    oracle=_COHORT_ORACLE,
    tags=("window", "events", "cohort"),
    late=True,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle
    (``operators/funnel.py:cohort_retention``): users grouped by the
    ISO week of their first event, counted once per subsequent week
    active. The events table shuffles ONCE (orderless window min for
    cohort assignment); the later exchanges carry only the
    map-side-collapsed distinct triples and the O(cohorts x horizon)
    triangle the retention-percentage window divides over — never a
    second event pass."""
    from ghcn_d_etl_project_spark.operators.funnel import cohort_retention

    e = t(spark, sf_dir, "events")
    return cohort_retention(e, period="week")


_INTERVAL_ORACLE = """
WITH iv AS (
  SELECT user_id, ts AS s, ts + INTERVAL 2 HOUR AS e
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
), w AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmax
  FROM iv
), f AS (
  SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS ni
  FROM w
), g AS (
  SELECT *, SUM(ni) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS island
  FROM f
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(MIN(s), '%Y-%m-%d %H:%M:%S.%f') AS span_start,
       strftime(MAX(e), '%Y-%m-%d %H:%M:%S.%f') AS span_end,
       CAST(epoch_us(MAX(e)) - epoch_us(MIN(s)) AS BIGINT) AS covered_us,
       CAST(COUNT(*) AS BIGINT) AS n_source
FROM g GROUP BY user_id, island
"""


@register(
    "interval_merge_events",
    oracle=_INTERVAL_ORACLE,
    tags=("window", "events", "interval"),
    late=True,
    bench=True,
)
def interval_merge_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union (``operators/timeseries.py:merge_intervals``):
    each engagement event opens a 2-hour activity interval; overlapping
    or touching intervals per user coalesce into maximal disjoint spans
    (running-max-of-ends island construction — one Exchange + one Sort
    feeding a single Window operator, island collapse reuses the key
    partitioning). Oracle restates the same recurrence; both engines
    compare microsecond-exact timestamps so island boundaries are
    bit-identical."""
    from ghcn_d_etl_project_spark.operators.timeseries import merge_intervals

    e = (
        t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "click", "purchase"))
        .select(
            "user_id",
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e"),
        )
    )
    out = merge_intervals(e, ["user_id"], "s", "e")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.date_format("s", fmt).alias("span_start"),
        F.date_format("e", fmt).alias("span_end"),
        (F.unix_micros("e") - F.unix_micros("s")).alias("covered_us"),
        F.col("n_source").cast("long").alias("n_source"),
    )


# Full value-hash oracle (r11): no overflow-safe CLOSED-FORM window
# formulation exists (the (1-a)^{-j} prefix factors blow up), but the
# recurrence itself REPLAYS in a recursive CTE — one step per event
# rank, all users advancing in the same iteration, depth = max events
# per user (86 at the oracle SF). pandas' ewm(adjust=False) computes
# literally (1-a)*y + a*x in doubles (verified bit-for-bit against the
# manual recurrence), and DuckDB runs the identical IEEE ops, so the
# smoothed values match to the last ulp before the 6dp rounding.
_EWMA_ORACLE = """
WITH RECURSIVE e AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, ts,
         CAST(event_id AS BIGINT) AS event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
r AS (
  SELECT user_id, rn, CAST(value AS DOUBLE) AS y FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, 0.7 * r.y + 0.3 * e.value
  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
)
SELECT e.user_id, strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       e.event_id, e.value, round(r.y, 6) AS value_ewma
FROM r JOIN e USING (user_id, rn)
"""


@register(
    "ewma_events",
    oracle=_EWMA_ORACLE,
    tags=("window", "timeseries", "pandas"),
    # promoted to the 50-slot hard window in the r12 rotation
)
def ewma_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA smoothing of the event value series
    (``operators/timeseries.py:ewma``): the adjust=False recurrence
    y_i = (1-a) y_{i-1} + a x_i via per-key Arrow-batched applyInPandas
    (pandas' C-vectorized ewm) — the honest Spark shape for a stateful
    recurrence no window function can express overflow-safely. One
    shuffle on user_id; full value-hash oracle via a DuckDB recursive
    CTE replaying the recurrence (since 0b25fb5, r11); the recurrence
    is additionally pinned in ``tests/test_timeseries.py``."""
    from ghcn_d_etl_project_spark.operators.timeseries import ewma

    e = t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    out = ewma(
        e, ["user_id"], "ts", ["value"], alpha=0.3,
        order_cols=("event_id",),
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.date_format("ts", fmt).alias("ts"),
        F.col("event_id").cast("long").alias("event_id"),
        "value",
        F.round("value_ewma", 6).alias("value_ewma"),
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection (extension, r8)
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = f"""
WITH fr AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         CAST(COUNT(CAST(o_totalprice AS DECIMAL(24,2)))
                OVER ({_WIN_SQL} ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
              AS DOUBLE) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2)))
                OVER ({_WIN_SQL} ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
              AS DOUBLE) AS s1,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(24,2))
                       * CAST(o_totalprice AS DECIMAL(24,2))
                       AS DECIMAL(38,4)))
                OVER ({_WIN_SQL} ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
              AS DOUBLE) AS s2
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, order_date,
       CAST(n AS BIGINT) AS base_n,
       CASE WHEN n >= 5 AND (n*s2 - s1*s1) / (n*(n-1)) > 0
            THEN ROUND(
              (o_totalprice - s1/n)
                / sqrt((n*s2 - s1*s1) / (n*(n-1))), 6)
       END AS price_zscore,
       CAST(
         COALESCE(abs((o_totalprice - s1/n)
                      / sqrt((n*s2 - s1*s1) / (n*(n-1)))) > 3
                  AND n >= 5 AND (n*s2 - s1*s1) / (n*(n-1)) > 0,
                  FALSE) AS BIGINT) AS is_anomaly
FROM fr
"""


@register(
    "rolling_zscore_orders",
    oracle=_ZSCORE_ORACLE,
    tags=("window", "quality", "anomaly"),
    late=True,
)
def rolling_zscore_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection
    (``operators/windows.py:rolling_zscore``): each order scored against
    its customer's OWN trailing-20-order baseline with the current row
    excluded from its baseline frame, NULL below 5 observations, |z| > 3
    flagged. Mean/variance from exact DECIMAL sum + sum-of-squares
    partials combined in one double expression — the oracle restates the
    identical expression tree, so both engines are bit-identical. One
    shuffle: all frame aggregates share the (customer, date, orderkey)
    window spec."""
    from ghcn_d_etl_project_spark.operators.windows import rolling_zscore

    o = t(spark, sf_dir, "orders")
    w = ordered_window(["o_custkey"], ["o_orderdate", "o_orderkey"])
    out = rolling_zscore(
        o, w, "o_totalprice", preceding=20, min_obs=5, scale=2
    )
    z = F.col("o_totalprice_zscore")
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        as_date_str("o_orderdate").alias("order_date"),
        F.col("o_totalprice_base_n").alias("base_n"),
        F.round(z, 6).alias("price_zscore"),
        F.coalesce(F.abs(z) > 3, F.lit(False))
        .cast("long")
        .alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Event transition matrix (extension, r8): path analysis
# ---------------------------------------------------------------------------

_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type,
       CAST(n AS BIGINT) AS n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6)
         AS prob
FROM pairs
"""


@register(
    "event_transitions",
    oracle=_TRANSITIONS_ORACLE,
    tags=("window", "events", "path"),
    late=True,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event transition matrix: for every (prev, next)
    event-type pair, the observed count and the conditional probability
    P(next | prev) — the path-analysis primitive behind journey Sankeys
    and Markov attribution, completing the funnel/cohort/session trio.
    One full-data shuffle (the per-user lag window, deterministic
    (ts, event_id) ordering); the pair aggregation reuses nothing heavy
    — its exchange carries only the event-type pair counts, and the
    probability normalization is a window over the tiny matrix."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    pairs = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Conversion attribution (first-touch / last-touch)
# ---------------------------------------------------------------------------

_ATTRIBUTION_ORACLE = """
WITH conv AS (
  SELECT user_id, ts, value, event_id FROM events
  WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id, ts, event_type, event_id FROM events
  WHERE event_type IN ('click', 'view')
), lt AS (
  SELECT c.value, t.event_type AS tt
  FROM conv c ASOF LEFT JOIN touch t
    ON c.user_id = t.user_id AND c.ts >= t.ts
), ft AS (
  SELECT user_id, ts, event_type FROM (
    SELECT user_id, ts, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM touch) WHERE rn = 1
), fj AS (
  SELECT c.value,
         CASE WHEN f.user_id IS NOT NULL AND f.ts <= c.ts
              THEN f.event_type END AS tt
  FROM conv c LEFT JOIN ft f ON c.user_id = f.user_id
)
SELECT 'last_touch' AS model, COALESCE(tt, '(none)') AS touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE)
         AS attributed_revenue
FROM lt GROUP BY 2
UNION ALL
SELECT 'first_touch', COALESCE(tt, '(none)'),
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE)
FROM fj GROUP BY 2
"""


@register(
    "attribution_revenue",
    oracle=_ATTRIBUTION_ORACLE,
    tags=("window", "events", "funnel"),
    late=True,
)
def attribution_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch conversion attribution over the events
    table (``operators/funnel.py:touch_attribution``): purchase revenue
    credited to click/view touches. Last-touch rides the linear as-of
    join (union-and-fill, one shuffle); first-touch is a struct-min
    per-user aggregate + equi-join with a no-future-leakage guard;
    unattributable conversions stay under '(none)' so each model sums
    to total purchase revenue. The oracle cross-checks with DuckDB's
    NATIVE ASOF JOIN for the last-touch arm and the window formulation
    for first-touch."""
    from ghcn_d_etl_project_spark.operators.funnel import touch_attribution

    return touch_attribution(
        t(spark, sf_dir, "events"),
        conversion_type="purchase",
        touch_types=["click", "view"],
    )


# ---------------------------------------------------------------------------
# Peak concurrency: distributed sweep-line over interval endpoints
# ---------------------------------------------------------------------------

_PEAK_ORACLE = """
WITH iv AS (
  SELECT ts AS s, ts + INTERVAL 2 HOUR AS e FROM events
  WHERE event_type IN ('view', 'click', 'purchase') AND ts IS NOT NULL
), ev AS (
  SELECT s AS ts, 1 AS d FROM iv
  UNION ALL
  SELECT e AS ts, -1 AS d FROM iv
), net AS (
  SELECT ts, CAST(SUM(d) AS BIGINT) AS net FROM ev GROUP BY ts
), c AS (
  SELECT ts, SUM(net) OVER (ORDER BY ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
  FROM net
)
SELECT strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS at_ts,
       CAST(conc AS BIGINT) AS peak_concurrency
FROM c ORDER BY conc DESC, ts LIMIT 1
"""


@register(
    "peak_concurrency_events",
    oracle=_PEAK_ORACLE,
    tags=("window", "events", "interval"),
    late=True,
)
def peak_concurrency_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum number of simultaneously open 2-hour activity windows —
    the classic sweep-line, distributed: interval endpoints become
    +1/-1 deltas, a per-timestamp aggregate collapses them map-side to
    |distinct ts| NET rows (ends cancel starts at equal ts, which is
    exactly half-open [s, e) semantics and keeps the running value
    order-independent within a timestamp), the running count is ONE
    ``operators/prefix.global_cumsum`` pass (bucketed two-phase prefix —
    no single-partition data-sized sort), and the answer is a
    TakeOrderedAndProject top-1 (peak desc, earliest ts). Integer
    arithmetic throughout — bit-exact on any engine."""
    from ghcn_d_etl_project_spark.operators.timeseries import peak_concurrency

    iv = (
        t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "click", "purchase"))
        .select("ts", (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e"))
    )
    return peak_concurrency(iv, "ts", "e").select(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("at_ts"),
        "peak_concurrency",
    )


# ---------------------------------------------------------------------------
# Time-decay multi-touch attribution
# ---------------------------------------------------------------------------

import math as _math

_DECAY_LAM = _math.log(2.0) / 1800.0  # half-life 30 min

_DECAY_ORACLE = f"""
WITH conv AS (
  SELECT user_id, event_id, value, ts FROM events
  WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id, event_type, ts FROM events
  WHERE event_type IN ('click', 'view')
), pairs AS (
  SELECT c.event_id AS cid, c.value, t.event_type AS tt,
         CAST(ROUND(EXP(-{_DECAY_LAM!r} *
                        (epoch_us(c.ts) - epoch_us(t.ts)) / 1000000.0), 6)
              AS DECIMAL(18,6)) AS w
  FROM conv c JOIN touch t
    ON c.user_id = t.user_id
   AND t.ts <= c.ts
   AND epoch_us(c.ts) - epoch_us(t.ts) <= 3600000000
), sw AS (
  SELECT *, SUM(w) OVER (PARTITION BY cid) AS swt FROM pairs
), cr AS (
  SELECT tt, CAST(ROUND(value * (CAST(w AS DOUBLE) / CAST(swt AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS q
  FROM sw
)
SELECT 'time_decay' AS model, tt AS touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_credits,
       CAST(SUM(q) AS DOUBLE) AS attributed_revenue
FROM cr GROUP BY 2
UNION ALL
SELECT 'time_decay', '(none)', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE)
FROM conv WHERE event_id NOT IN (SELECT cid FROM pairs)
HAVING COUNT(*) > 0
"""


@register(
    "attribution_decay",
    oracle=_DECAY_ORACLE,
    tags=("window", "events", "funnel"),
    late=True,  # r13 rotation: 4-round green, demoted to sim coverage
)
def attribution_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution (half-life 30 min, lookback
    1 h) over the events table
    (``operators/funnel.py:touch_attribution_decay``): candidate pairs
    via the two-table gap-bucket range join (equi-join on (user,
    bucket), fan-out bounded by touches-per-lookback), per-conversion
    normalization via one window, decimal-quantized weights and credits
    for engine-exact sums. The oracle is the plain inequality join the
    bucketing replaces."""
    from ghcn_d_etl_project_spark.operators.funnel import touch_attribution_decay

    return touch_attribution_decay(
        t(spark, sf_dir, "events"),
        conversion_type="purchase",
        touch_types=["click", "view"],
        lookback_seconds=3600.0,
        half_life_seconds=1800.0,
    )


# ---------------------------------------------------------------------------
# Series autocorrelation (extension, r9): lagged self-similarity
# ---------------------------------------------------------------------------

_AUTOCORR_ORACLE = """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, v AS x,
         lag(v, 1) OVER w AS l1,
         lag(v, 2) OVER w AS l2,
         lag(v, 3) OVER w AS l3
  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
long AS (
  SELECT event_type, 1 AS lag, x, l1 AS y FROM lagged
  UNION ALL SELECT event_type, 2, x, l2 FROM lagged
  UNION ALL SELECT event_type, 3, x, l3 FROM lagged
),
m AS (
  SELECT event_type, lag, COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(28,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(30,6))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(x * y AS DECIMAL(30,6))) AS DOUBLE) AS sxy
  FROM long WHERE y IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
       CASE WHEN sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0
            THEN round((n * sxy - sx * sy)
                       / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
       END AS acf
FROM m
"""


@register(
    "autocorr_events",
    oracle=_AUTOCORR_ORACLE,
    tags=("window", "events", "timeseries"),
    late=True,
)
def autocorr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1/2/3 autocorrelation of each event type's daily value series
    (``operators/timeseries.py:autocorrelation``): the raw events
    collapse to a per-(type, day) series in one partial-agg shuffle —
    the only pass that ever touches the fact table — then all three
    lags share ONE window sort and ONE grouped exact-DECIMAL co-moment
    aggregate (the ``corr_pairs`` recipe), so an iteratively-defined
    statistic hash-matches a SQL oracle under any partitioning.
    ``F.corr``'s streaming accumulator could not."""
    from ghcn_d_etl_project_spark.operators.timeseries import autocorrelation

    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    series = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("v"))
    return autocorrelation(
        series, ["event_type"], "day", "v", lags=(1, 2, 3)
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonal profile (extension, r9): seasonal-means decomposition
# ---------------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
b AS (
  -- floored (positive) modulus mirroring the engine's pmod, so the
  -- ISO weekday stays in 1..7 for pre-1970 dates too
  SELECT event_type,
         ((((date_diff('day', DATE '1970-01-01', day) + 3) % 7) + 7) % 7)
           + 1 AS dow, v
  FROM s
),
bd AS (
  SELECT event_type, dow, COUNT(*) AS n_days,
         CAST(SUM(CAST(v AS DECIMAL(28,4))) AS DOUBLE) AS sv
  FROM b GROUP BY 1, 2
),
o AS (
  SELECT event_type, COUNT(*) AS tn,
         CAST(SUM(CAST(v AS DECIMAL(28,4))) AS DOUBLE) AS tsum
  FROM b GROUP BY 1
)
SELECT bd.event_type, CAST(dow AS BIGINT) AS dow,
       CAST(n_days AS BIGINT) AS n_days,
       round(sv / n_days, 6) AS mean_value,
       CASE WHEN tsum / tn <> 0
            THEN round((sv / n_days) / (tsum / tn), 6) END AS seasonal_index
FROM bd JOIN o ON bd.event_type = o.event_type
"""


@register(
    "seasonal_profile_events",
    oracle=_SEASONAL_ORACLE,
    tags=("window", "events", "timeseries"),
    late=True,
)
def seasonal_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative day-of-week seasonality of each event type's daily
    value series (``operators/timeseries.py:seasonal_profile``):
    weekday mean level and seasonal index (weekday mean / overall
    mean). Weekday is integer arithmetic on days-since-epoch — never
    ``dayofweek()``, whose week origin differs per engine. After the
    one fact-table pass that builds the series, the rest is two
    map-side-combining aggregates over type×day rows and a broadcast
    join — nothing here grows with the raw event count."""
    from ghcn_d_etl_project_spark.operators.timeseries import seasonal_profile

    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    series = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("v"))
    return seasonal_profile(series, ["event_type"], "day", "v")


# ---------------------------------------------------------------------------
# Running COUNT(DISTINCT) over a window (extension, r9)
# ---------------------------------------------------------------------------

# The oracle uses the NATIVE distinct window aggregate (DuckDB supports
# it; Spark raises DISTINCT_WINDOW_FUNCTION_UNSUPPORTED) — so the MATCH
# certifies the first-occurrence rewrite against an engine that can
# state the semantics directly.
_RUNNING_DISTINCT_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority,
       CAST(COUNT(DISTINCT o_orderpriority) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_distinct_so_far
FROM orders
"""


@register(
    "running_distinct_orders",
    oracle=_RUNNING_DISTINCT_ORACLE,
    tags=("window", "orders"),
    late=True,
)
def running_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer, the running number of DISTINCT order priorities
    used so far (``operators/windows.py:running_count_distinct``).
    Spark has no distinct window aggregate; the first-occurrence
    decomposition (row_number==1 flag over (key, value), running sum
    over key) computes it with two key-partitioned exchanges and no
    per-row distinct state. The oracle is DuckDB's NATIVE
    COUNT(DISTINCT) OVER, so the rewrite is certified against an
    engine that can express the semantics directly."""
    from ghcn_d_etl_project_spark.operators.windows import (
        running_count_distinct,
    )

    o = t(spark, sf_dir, "orders")
    out = running_count_distinct(
        o,
        keys=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        value_col="o_orderpriority",
    )
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        as_date_str("o_orderdate").alias("order_date"),
        "o_orderpriority",
        "n_distinct_so_far",
    )


# ---------------------------------------------------------------------------
# Path trigram mining (extension, r9): second-order sequence analysis
# ---------------------------------------------------------------------------

_TRIGRAMS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type, 1) OVER w AS p1,
         lag(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tri AS (
  SELECT p2 AS t1, p1 AS t2, event_type AS t3, COUNT(*) AS n
  FROM seq WHERE p2 IS NOT NULL
  GROUP BY 1, 2, 3
),
tot AS (SELECT SUM(n) AS t FROM tri)
SELECT t1, t2, t3, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / t, 6) AS share
FROM tri, tot
"""


@register(
    "path_trigrams_events",
    oracle=_TRIGRAMS_ORACLE,
    tags=("window", "events", "path"),
    late=True,
)
def path_trigrams_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order path mining: (step-2, step-1, current) event-type
    trigram counts + corpus share — the sequence features behind
    journey clustering and next-event prediction baselines, extending
    the first-order ``event_transitions`` matrix. Both lags share ONE
    window sort (the only full-data shuffle); the trigram aggregate
    and the share's one-row broadcast total run on the tiny trigram
    table."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    tri = seq.groupBy(
        F.col("p2").alias("t1"),
        F.col("p1").alias("t2"),
        F.col("event_type").alias("t3"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    # corpus share via an unpartitioned frame over the COLLAPSED
    # trigram table (|event types|^3 rows at most — the bounded
    # SinglePartition case, same as event_transitions' prob window);
    # a separate total aggregate re-scans the fact table instead
    tot = F.sum("n").over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return tri.withColumn("t", tot).select(
        "t1",
        "t2",
        "t3",
        "n",
        F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival (extension, r9): time-to-event analysis
# ---------------------------------------------------------------------------

_KM_ORACLE = """
WITH sign AS (
  SELECT user_id, MIN(ts) AS s0 FROM events
  WHERE event_type = 'signup' AND user_id IS NOT NULL GROUP BY 1
),
pur AS (
  SELECT e.user_id, MIN(e.ts) AS p0
  FROM events e JOIN sign s ON e.user_id = s.user_id AND e.ts >= s.s0
  WHERE e.event_type = 'purchase'
  GROUP BY 1
),
mx AS (SELECT MAX(ts) AS mts FROM events),
subj AS (
  SELECT CASE WHEN p.p0 IS NOT NULL
              THEN date_diff('day', CAST(s.s0 AS DATE), CAST(p.p0 AS DATE))
              ELSE date_diff('day', CAST(s.s0 AS DATE), CAST(mx.mts AS DATE))
         END AS t,
         CASE WHEN p.p0 IS NOT NULL THEN 1 ELSE 0 END AS e
  FROM sign s LEFT JOIN pur p ON s.user_id = p.user_id, mx
),
per_t AS (
  SELECT t, SUM(e) AS d_events, SUM(1 - e) AS c_censored
  FROM subj GROUP BY 1
),
marked AS (
  SELECT t, d_events, c_censored,
         SUM(d_events + c_censored) OVER ()
           - COALESCE(SUM(d_events + c_censored) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS n_at_risk
  FROM per_t
),
curve AS (
  SELECT t, n_at_risk, d_events, c_censored,
         SUM(CAST(CASE WHEN d_events > 0 AND d_events < n_at_risk
                       THEN ln(1 - CAST(d_events AS DOUBLE) / n_at_risk)
                       ELSE 0.0 END AS DECIMAL(28,12)))
           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum,
         MAX(CASE WHEN d_events = n_at_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS extinct
  FROM marked
)
SELECT CAST(t AS BIGINT) AS t, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d_events AS BIGINT) AS d_events,
       CAST(c_censored AS BIGINT) AS c_censored,
       CASE WHEN extinct = 1 THEN 0.0
            ELSE round(exp(CAST(cum AS DOUBLE)), 6) END AS survival
FROM curve
"""


@register(
    "survival_km_events",
    oracle=_KM_ORACLE,
    tags=("window", "events", "survival"),
    late=True,  # rotated out of hard window r14 (tenure since <=r10)
)
def survival_km_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion: days from each user's first
    signup to their first subsequent purchase, right-censored at the
    corpus horizon for users who never convert
    (``operators/timeseries.py:kaplan_meier``). The estimator's
    running PRODUCT is made engine-exact by quantizing each
    ``ln(1 - d/n)`` term to DECIMAL(28,12) before the window sum —
    windowed double sums are free to accumulate in segment-tree order,
    which would otherwise move the last bit; extinction (d == n) is an
    explicit flag, not a -inf. Subjects collapse to one row per
    distinct duration; the curve is two frames over one bounded
    unpartitioned window on that table."""
    from ghcn_d_etl_project_spark.operators.timeseries import kaplan_meier

    e = t(spark, sf_dir, "events")
    sign = (
        e.filter(
            (F.col("event_type") == "signup") & F.col("user_id").isNotNull()
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("s0"))
    )
    pur = (
        e.filter(F.col("event_type") == "purchase")
        .join(sign, "user_id")
        .filter(F.col("ts") >= F.col("s0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p0"))
    )
    mx = e.agg(F.max("ts").alias("mts"))
    subj = (
        sign.join(pur, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("p0").isNotNull(),
                F.datediff(F.col("p0").cast("date"), F.col("s0").cast("date")),
            )
            .otherwise(
                F.datediff(F.col("mts").cast("date"), F.col("s0").cast("date"))
            )
            .alias("t"),
            F.col("p0").isNotNull().cast("long").alias("e"),
        )
    )
    return kaplan_meier(subj, "t", "e")


# ---------------------------------------------------------------------------
# Active users & stickiness (extension, r9): DAU / trailing-7-day WAU
# ---------------------------------------------------------------------------

_ACTIVE_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE user_id IS NOT NULL
),
days AS (SELECT DISTINCT day FROM ud),
wau AS (
  SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
  FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
  GROUP BY 1
),
dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1)
SELECT strftime(dau.day, '%Y-%m-%d') AS day,
       CAST(dau AS BIGINT) AS dau,
       CAST(wau AS BIGINT) AS wau,
       round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
"""


@register(
    "active_users_events",
    oracle=_ACTIVE_ORACLE,
    tags=("window", "events", "analytics"),
    late=True,  # rotated out of hard window r14 (tenure since <=r10)
)
def active_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU, trailing-7-day WAU, and DAU/WAU stickiness per observed
    day — the product-health curve. The trailing DISTINCT count is
    computed by SUPPORT EXPLODE, not a window: each (user, day)
    activity row emits the <= 7 future days it supports, a distinct +
    count per target day finishes it — two hash aggregates, fan-out
    bounded by the window length, no per-day range self-join of the
    fact table and no distinct-over-window state (which Spark refuses
    and which holds a user SET per frame elsewhere). The oracle states
    the range-join formulation it replaces. Target days land only on
    OBSERVED days via a broadcast semi-join with the day spine."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    ud = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    support = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("tday"),
    )
    wau = (
        support.join(
            F.broadcast(days.withColumnRenamed("day", "tday")), "tday"
        )
        .select("user_id", "tday")
        .distinct()
        .groupBy("tday")
        .agg(F.count(F.lit(1)).cast("long").alias("wau"))
    )
    dau = ud.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    return (
        dau.join(wau, dau["day"] == wau["tday"])
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Forecast baseline + accuracy (extension, r9): seasonal-naive + MASE
# ---------------------------------------------------------------------------

_FORECAST_ORACLE = """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, v,
         lag(v, 1) OVER w AS l1,
         lag(v, 7) OVER w AS l7
  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
m AS (
  SELECT event_type,
         COUNT(l7) AS n_eval,
         CAST(SUM(CASE WHEN l7 IS NOT NULL
                  THEN CAST(ABS(v - l7) AS DECIMAL(28,4)) END) AS DOUBLE)
           AS sae7,
         COUNT(l1) AS n1,
         CAST(SUM(CASE WHEN l1 IS NOT NULL
                  THEN CAST(ABS(v - l1) AS DECIMAL(28,4)) END) AS DOUBLE)
           AS sae1
  FROM lagged GROUP BY 1
)
SELECT event_type, CAST(n_eval AS BIGINT) AS n_eval,
       round(sae7 / n_eval, 6) AS mae_seasonal_naive,
       round(sae1 / n1, 6) AS mae_naive1,
       CASE WHEN sae1 > 0
            THEN round((sae7 / n_eval) / (sae1 / n1), 6) END AS mase
FROM m
"""


@register(
    "forecast_eval_events",
    oracle=_FORECAST_ORACLE,
    tags=("window", "events", "timeseries"),
    late=True,  # rotated out of hard window r14 (tenure since <=r10)
)
def forecast_eval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting baseline readout per event type: the seasonal-naive
    forecast (value from 7 days earlier) scored by MAE and by MASE
    (Hyndman & Koehler 2006 — scaled against the one-step naive's MAE,
    the scale-free accuracy metric that makes series comparable). Both
    lags share ONE window sort on the daily series (the raw facts are
    touched once, in the series-building partial agg); absolute errors
    are exact-DECIMAL sums (the series carries <= 4 decimals, so
    differences are exact), means one double division — the whole
    readout value-hashes cross-engine. MASE NULL when the naive MAE is
    zero (constant series)."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = s.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("l1"),
        F.lag("v", 7).over(w).alias("l7"),
    )
    ae = lambda l: F.abs(F.col("v") - F.col(l)).cast("decimal(28,4)")  # noqa: E731
    m = lagged.groupBy("event_type").agg(
        F.count("l7").alias("n_eval"),
        F.sum(F.when(F.col("l7").isNotNull(), ae("l7")))
        .cast("double")
        .alias("sae7"),
        F.count("l1").alias("n1"),
        F.sum(F.when(F.col("l1").isNotNull(), ae("l1")))
        .cast("double")
        .alias("sae1"),
    )
    mae7 = F.col("sae7") / F.col("n_eval")
    mae1 = F.col("sae1") / F.col("n1")
    return m.select(
        "event_type",
        F.col("n_eval").cast("long").alias("n_eval"),
        F.round(mae7, 6).alias("mae_seasonal_naive"),
        F.round(mae1, 6).alias("mae_naive1"),
        F.when(F.col("sae1") > 0, F.round(mae7 / mae1, 6)).alias("mase"),
    )
