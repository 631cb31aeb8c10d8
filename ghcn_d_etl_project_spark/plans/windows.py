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


@register("lag_features", oracle=_LAG_ORACLE, tags=("window",), bench=True)
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


@register("rolling_features", oracle=_ROLLING_ORACLE, tags=("window",), bench=True)
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


@register("rolling_range_days", oracle=_RANGE_ORACLE, tags=("window",))
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
                             ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS quartile
  FROM orders
)
SELECT * FROM ranked WHERE rn <= 3
"""


@register("rank_topk_per_group", oracle=_RANK_ORACLE, tags=("window",))
def rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer with the full ranking family
    (row_number/rank/dense_rank/ntile) — the distributed top-k-per-group
    pattern; non-winners never leave their partition."""
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
