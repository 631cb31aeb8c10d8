"""Projection / filter / scalar-function queries (SURVEY.md §2.2, §2.9).

Reference analogs: sentinel filter (P3, ``bronze_processor.py:122``),
range/IN/null predicates (P4-P6), conditional rewrite + bounds-nulling
(P7-P8, ``silver_processor.py:52-70``), string family
(``bronze_processor.py:52-72``, ``silver_processor.py:100-107``), date
family (``bronze_processor.py:68-72``, ``gold_processor.py:204``), math
family incl. the reference's hard-coded pi=3.14159 seasonal encodings
(``gold_processor.py:205-207``).

All row-level: these stay inside whole-stage codegen with filters pushed
to the parquet scan — at 100 TB the scan reads only referenced columns and
skips row groups via min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.plans._util import as_date_str, t
from ghcn_d_etl_project_spark.plans.registry import register

# ---------------------------------------------------------------------------
# P3-P6: sentinel / range / IN-list / null-validity predicates in one scan
# ---------------------------------------------------------------------------

_FILTER_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE l_discount <> 0.00
  AND l_quantity BETWEEN 10 AND 40
  AND l_returnflag IN ('A', 'R')
  AND l_shipdate IS NOT NULL
"""


@register("filter_predicates", oracle=_FILTER_ORACLE, tags=("filter",),
          late=True)  # r13 rotation: 12-round green, demoted to sim coverage
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate scan (P3 sentinel != , P4 between, P5 isNotNull,
    P6 isin) — pushed down to the parquet reader."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_discount") != 0.00)
        & F.col("l_quantity").between(10, 40)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_shipdate").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


# ---------------------------------------------------------------------------
# P7-P8: conditional unit rewrite + out-of-range nulling (silver semantics)
# ---------------------------------------------------------------------------

_REWRITE_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_returnflag IN ('A', 'R') THEN l_extendedprice / 10
            ELSE l_extendedprice END AS price_conv,
       CASE WHEN l_quantity < 5 OR l_quantity > 45 THEN NULL
            ELSE l_quantity END AS qty_bounded,
       CASE WHEN l_tax > 0.05 THEN 'high' WHEN l_tax > 0.02 THEN 'mid'
            ELSE 'low' END AS tax_band
FROM lineitem
"""


@register("conditional_rewrite", oracle=_REWRITE_ORACLE, tags=("filter", "scalar"), late=True)
def conditional_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise unit conversion (P7, ``silver_processor.py:52-57``),
    out-of-range -> NULL (P8, :59-70), and a classification ladder (A6,
    ``gold_processor.py:167-178``)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(
            F.col("l_returnflag").isin("A", "R"), F.col("l_extendedprice") / 10
        )
        .otherwise(F.col("l_extendedprice"))
        .alias("price_conv"),
        F.when(
            (F.col("l_quantity") < 5) | (F.col("l_quantity") > 45), F.lit(None)
        )
        .otherwise(F.col("l_quantity"))
        .alias("qty_bounded"),
        F.when(F.col("l_tax") > 0.05, "high")
        .when(F.col("l_tax") > 0.02, "mid")
        .otherwise("low")
        .alias("tax_band"),
    )


# ---------------------------------------------------------------------------
# String family (P1 fixed & computed-position substring, trim/concat/lpad)
# ---------------------------------------------------------------------------

_STRING_ORACLE = """
SELECT c_custkey,
       substring(c_name, 1, 9) AS name_prefix,
       substring(c_name, CAST(length(c_name) - 3 AS INTEGER), 4) AS name_tail,
       trim(c_mktsegment) AS segment_trim,
       c_name || '#' || c_mktsegment AS name_seg,
       lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded,
       upper(c_mktsegment) AS seg_upper,
       lower(c_name) AS name_lower,
       CAST(length(c_name) AS BIGINT) AS name_len,
       replace(c_mktsegment, 'A', '_') AS seg_replaced
FROM customer
"""


@register("string_funcs", oracle=_STRING_ORACLE, tags=("scalar",), late=True)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (P1/P11): fixed and computed-position substring (the
    reference's day-slot extraction pattern, ``bronze_processor.py:99-119``),
    trim/concat/lpad/upper/lower/length/replace."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.expr("substring(c_name, CAST(length(c_name) - 3 AS INT), 4)").alias(
            "name_tail"
        ),
        F.trim(F.col("c_mktsegment")).alias("segment_trim"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("name_seg"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.length("c_name").cast("long").alias("name_len"),
        F.replace(F.col("c_mktsegment"), F.lit("A"), F.lit("_")).alias("seg_replaced"),
    )


# ---------------------------------------------------------------------------
# Date family (to_date/concat builder, extraction, arithmetic)
# ---------------------------------------------------------------------------

_DATE_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       CAST(day(o_orderdate) AS BIGINT) AS order_day,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS order_doy,
       CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT)
         AS days_to_y2k,
       strftime(CAST(make_date(CAST(year(o_orderdate) AS INTEGER), 7, 1) AS DATE),
                '%Y-%m-%d') AS mid_year
FROM orders
"""


@register("date_funcs", oracle=_DATE_ORACLE, tags=("scalar",), late=True)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family: extraction (year/month/day/dayofyear/quarter — the
    reference's partition keys and ``dayofyear`` feature,
    ``gold_processor.py:204``), date arithmetic, last_day, datediff, and a
    date built from parts (the reference's to_date(concat(...)) pattern,
    ``bronze_processor.py:68-72``)."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        F.dayofmonth(d).cast("long").alias("order_day"),
        F.dayofyear(d).cast("long").alias("order_doy"),
        F.quarter(d).cast("long").alias("order_quarter"),
        as_date_str(F.date_add(d, 30)).alias("due_date"),
        as_date_str(F.last_day(d)).alias("month_end"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("long").alias(
            "days_to_y2k"
        ),
        as_date_str(
            F.to_date(
                F.concat(F.year(d).cast("string"), F.lit("0701")), "yyyyMMdd"
            )
        ).alias("mid_year"),
    )


# ---------------------------------------------------------------------------
# Math family incl. the reference's pi=3.14159 seasonal encodings
# ---------------------------------------------------------------------------

_MATH_ORACLE = """
SELECT o_orderkey,
       round(sin(month(o_orderdate) * 2 * 3.14159 / 12), 6) AS month_sin,
       round(cos(month(o_orderdate) * 2 * 3.14159 / 12), 6) AS month_cos,
       round(sqrt(o_totalprice), 6) AS price_sqrt,
       abs(o_totalprice - 100000) AS price_dev,
       round(o_totalprice / 3.0, 6) AS price_third,
       floor(o_totalprice / 1000) AS price_k_floor,
       ceil(o_totalprice / 1000) AS price_k_ceil,
       round(ln(o_totalprice), 6) AS price_ln,
       round(pow(o_totalprice / 100000, 2), 6) AS price_sq
FROM orders
"""


@register("math_funcs", oracle=_MATH_ORACLE, tags=("scalar",), late=True)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: the reference's seasonal sin/cos encodings with its
    hard-coded pi=3.14159 quirk (``gold_processor.py:205-207`` — kept, not
    "fixed"), plus sqrt/abs/round/floor/ceil/ln/pow. Transcendentals are
    rounded to 6 on both engines (libm last-bit differences)."""
    o = t(spark, sf_dir, "orders")
    month = F.month(F.col("o_orderdate"))
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.sin(month * 2 * 3.14159 / 12), 6).alias("month_sin"),
        F.round(F.cos(month * 2 * 3.14159 / 12), 6).alias("month_cos"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.abs(price - 100000).alias("price_dev"),
        # round() parity caveat: Spark rounds the SHORTEST DECIMAL repr of a
        # double (BigDecimal.valueOf), DuckDB rounds the exact binary value —
        # they disagree on values like 69.195 whose repr terminates at the
        # boundary. Only round non-terminating values (quotients by 3 here,
        # transcendentals elsewhere).
        F.round(price / 3.0, 6).alias("price_third"),
        F.floor(price / 1000).cast("double").alias("price_k_floor"),
        F.ceil(price / 1000).cast("double").alias("price_k_ceil"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.pow(price / 100000, 2), 6).alias("price_sq"),
    )


# ---------------------------------------------------------------------------
# Casts (P12) + top-k global sort (O1/O2)
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("top_k_orders", oracle=_TOPK_ORACLE, tags=("sort",), late=True)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (O1/O2): Spark plans TakeOrderedAndProject —
    a per-partition top-k then a driver-side merge, no full sort shuffle.
    Tie-broken on the key for determinism."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            as_date_str("o_orderdate").alias("order_date"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# SQL entry path: the same engine surface via spark.sql over temp views
# ---------------------------------------------------------------------------

_SQL_CTE = """
WITH nation_orders AS (
  SELECT n.n_name AS nation,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(24,2))) AS DOUBLE) AS revenue,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM {orders} o
  JOIN {customer} c ON o.o_custkey = c.c_custkey
  JOIN {nation} n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT nation, revenue, n_orders,
       round(revenue / n_orders, 6) AS avg_order_value
FROM nation_orders
"""


@register(
    "sql_cte_revenue",
    oracle=_SQL_CTE.format(orders="orders", customer="customer", nation="nation"),
    tags=("sql", "join", "agg"),
    late=True,  # r11 rotation: 7 rounds green in the hard window
)
def sql_cte_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry path: identical ANSI text runs on both engines
    (spark.sql over registered temp views vs DuckDB over parquet views) —
    demonstrating that the engine's surface is DataFrame API and SQL
    equally, compiled by the same Catalyst pipeline."""
    for name in ("orders", "customer", "nation"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        _SQL_CTE.format(orders="v_orders", customer="v_customer", nation="v_nation")
    )


# ---------------------------------------------------------------------------
# Keyset pagination: the scale-correct answer to O3 (reference
# spark_utils.py:58-84 pages with limit/offset — SURVEY §4 anti-pattern)
# ---------------------------------------------------------------------------

_KEYSET_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderkey > 1250
ORDER BY o_orderkey
LIMIT 100
"""


@register("keyset_page_orders", oracle=_KEYSET_ORACLE, tags=("sort", "page"), late=True)
def keyset_page_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One keyset page: the 100 orders strictly after cursor
    o_orderkey=1250 (inside every SF's key range, so the page is non-empty
    at each scale). Replaces the reference's limit/offset batch loop
    (O3, ``spark_utils.py:58-84``): the cursor predicate reaches the
    parquet scan as a pushed filter (row groups before the cursor are
    skipped) and the sort+limit plans TakeOrderedAndProject — per-page
    cost is one pruned scan regardless of how deep the cursor sits,
    where OFFSET re-scans and discards everything before it each page."""
    from ghcn_d_etl_project_spark.operators.common import keyset_page

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return keyset_page(o, ["o_orderkey"], after=(1250,), n=100)
