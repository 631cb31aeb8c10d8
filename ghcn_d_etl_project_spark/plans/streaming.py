"""Event-time window queries over the events table.

Streaming-capable operators (ghcn_d_etl_project_spark.streaming.windows)
registered in BATCH mode so the driver can oracle-check the window
semantics exactly: tumbling/sliding windows restate as epoch-aligned
bucket arithmetic, session windows as the gaps-and-islands rewrite.
tests/test_streaming.py runs the same operators through readStream +
watermark + memory sink and asserts convergence to these batch answers.

Plus the JSON-extraction family the events.props column motivates
(reference uses no JSON functions — SURVEY.md §2.9 — so this is part of
the modern-pipeline extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.plans._util import dsum, t
from ghcn_d_etl_project_spark.plans.registry import register
from ghcn_d_etl_project_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

_EVENT_AGGS = lambda: [  # noqa: E731  (fresh Column objects per call)
    F.count(F.lit(1)).cast("long").alias("n_events"),
    dsum("value").alias("total_value"),
]


_TUMBLING_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S')
         AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(24,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


@register("tumbling_window_agg", oracle=_TUMBLING_ORACLE, tags=("streaming", "window"), bench=True,
          late=True)  # r13 rotation: 11-round green, demoted to sim coverage
def tumbling_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows per event_type (count + exact
    sum). Epoch-aligned [start, start+1h) — identical to date_trunc
    bucketing; the same operator runs streaming with a watermark."""
    return tumbling_window_agg(
        t(spark, sf_dir, "events"), "ts", "1 hour", ["event_type"], _EVENT_AGGS()
    )


_SLIDING_ORACLE = """
WITH expanded AS (
  SELECT event_type, value,
         to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)
                      - o.off * 1800) AS wstart
  FROM events, (SELECT UNNEST([0, 1]) AS off) o
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(wstart + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(24,2))) AS DOUBLE) AS total_value
FROM expanded
GROUP BY 1, 2, 3
"""


@register("sliding_window_agg", oracle=_SLIDING_ORACLE, tags=("streaming", "window"), late=True)
def sliding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes per event_type — each
    event lands in exactly 2 windows; the oracle expands events to their
    epoch-aligned window starts and re-aggregates."""
    return sliding_window_agg(
        t(spark, sf_dir, "events"),
        "ts",
        "1 hour",
        "30 minutes",
        ["event_type"],
        _EVENT_AGGS(),
    )


_SESSION_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   < INTERVAL 30 MINUTES
              THEN 0 ELSE 1 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTES, '%Y-%m-%d %H:%M:%S') AS session_end,
       user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(24,2))) AS DOUBLE) AS total_value
FROM sess
GROUP BY user_id, sid
"""


@register("session_window_agg", oracle=_SESSION_ORACLE, tags=("streaming", "window"), late=True)
def session_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap: session
    end = last event + gap, a new session starts when the gap to the
    previous event is >= 30 min. Oracle = gaps-and-islands rewrite (lag →
    new-session flag → running sum → group) — exact, including boundary
    semantics (extend strictly-within gap)."""
    return session_window_agg(
        t(spark, sf_dir, "events"), "ts", "30 minutes", ["user_id"], _EVENT_AGGS()
    )


_JSON_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid_json
FROM events
"""


@register("json_extract", oracle=_JSON_ORACLE, tags=("scalar", "json"), late=True)
def json_extract_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the semi-structured props column —
    get_json_object stays JVM-side (Jackson) and codegen-friendly; the
    validity probe demonstrates safe handling of malformed payloads."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.when(F.try_parse_json(F.col("props")).isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_valid_json"),
    )
