"""Reshape queries: unpivot (stack + explode variants) and pivot.

SURVEY.md §2.3 — the reference's two signature operators (R1/R2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.reshape import (
    explode_slots,
    pivot_wide,
    unpivot,
)
from ghcn_d_etl_project_spark.plans._util import as_date_str, t
from ghcn_d_etl_project_spark.plans.registry import register

# ---------------------------------------------------------------------------
# R1a: wide -> long unpivot of measure columns via stack
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""


@register("unpivot_measures", oracle=_UNPIVOT_ORACLE, tags=("reshape",), late=True)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (R1) of 4 measure columns via ``stack`` — the
    idiomatic twin of the reference's explode-based day-slot unpivot
    (``bronze_processor.py:83-124``)."""
    li = t(spark, sf_dir, "lineitem")
    return unpivot(
        li,
        id_cols=["l_orderkey", "l_linenumber"],
        value_cols=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        var_name="measure",
        value_name="value",
    )


# ---------------------------------------------------------------------------
# R1b: explode-driven slot expansion + invalid-date drop (P2/P5 semantics)
# ---------------------------------------------------------------------------

_EXPLODE_ORACLE = """
WITH months AS (
  SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS y,
                  CAST(month(o_orderdate) AS BIGINT) AS m
  FROM orders
), slots AS (
  SELECT y, m, CAST(unnest(generate_series(1, 31)) AS BIGINT) AS d FROM months
)
SELECT y, m, d,
       strftime(make_date(CAST(y AS INTEGER), CAST(m AS INTEGER), CAST(d AS INTEGER)),
                '%Y-%m-%d') AS date_str
FROM slots
WHERE d <= day(last_day(make_date(CAST(y AS INTEGER), CAST(m AS INTEGER), 1)))
"""


@register("explode_day_slots", oracle=_EXPLODE_ORACLE, tags=("reshape",), late=True)
def explode_day_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode-based slot expansion (R1) exactly as the reference builds
    bronze: cross (year,month) rows with literal days [1..31], build the
    date via to_date(concat(...)), drop NULL (impossible) dates
    (``bronze_processor.py:86-96,67-75``)."""
    months = (
        t(spark, sf_dir, "orders")
        .select(
            F.year("o_orderdate").cast("long").alias("y"),
            F.month("o_orderdate").cast("long").alias("m"),
        )
        .distinct()
    )
    exploded = explode_slots(months, n_slots=31, slot_col="d").withColumn(
        "d", F.col("d").cast("long")
    )
    # Spark 4 ANSI mode: to_date THROWS on invalid dates; try_to_date gives
    # the reference's NULL-on-invalid semantics (bronze_processor.py:68-75).
    dated = exploded.withColumn(
        "date",
        F.try_to_date(
            F.concat(
                F.col("y").cast("string"),
                F.lpad(F.col("m").cast("string"), 2, "0"),
                F.lpad(F.col("d").cast("string"), 2, "0"),
            ),
            "yyyyMMdd",
        ),
    )
    return (
        dated.filter(F.col("date").isNotNull())
        .withColumn("date_str", as_date_str("date"))
        .drop("date")
    )


# ---------------------------------------------------------------------------
# R2: long -> wide pivot with explicit value list + deterministic collapse
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]

_PIVOT_ORACLE = """
SELECT user_id,
       strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
       MAX(CASE WHEN event_type = 'click' THEN value END) AS click,
       MAX(CASE WHEN event_type = 'view' THEN value END) AS view,
       MAX(CASE WHEN event_type = 'signup' THEN value END) AS signup,
       MAX(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
       MAX(CASE WHEN event_type = 'error' THEN value END) AS error
FROM events
GROUP BY user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d')
"""


@register("pivot_events", oracle=_PIVOT_ORACLE, tags=("reshape",), bench=True, late=True)
def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pivot (R2): events long -> one row per (user, day) with one
    column per event type — the reference's element pivot
    (``silver_processor.py:79-84``) with a deterministic ``max`` collapse
    (its ``first`` is order-dependent; see operators/reshape.py). Explicit
    value list avoids the pivot-value discovery job."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        as_date_str(F.col("ts").cast("date")).alias("event_date"),
        "event_type",
        "value",
    )
    return pivot_wide(
        ev,
        keys=["user_id", "event_date"],
        pivot_col="event_type",
        pivot_values=_EVENT_TYPES,
        value_col="value",
        agg="max",
    )


@register("pivot_first_semantics", oracle=None, tags=("reshape",))
def pivot_first_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-exact pivot collapse using ``first()``
    (``silver_processor.py:81-83``) — non-deterministic under duplicate
    (key, pivot-value) pairs, so checked rows-only (the row COUNT is
    deterministic: one row per distinct key)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        as_date_str(F.col("ts").cast("date")).alias("event_date"),
        "event_type",
        "value",
    )
    return pivot_wide(
        ev,
        keys=["user_id", "event_date"],
        pivot_col="event_type",
        pivot_values=_EVENT_TYPES,
        value_col="value",
        agg="first",
    )
