"""Aggregation-family queries (SURVEY.md §2.5: A1-A16).

The reference's climate marts are multi-function hash aggregates with
conditional counts and post-agg derived columns
(``src/transform/gold_processor.py:49-178``). Re-expressed here on the
synthetic star schema. All aggregates go through the decimal-quantization
recipe in ``plans/_util.py`` so DuckDB oracle hashes match exactly.

Scale notes: grouping keys are kept minimal (ids + time), NOT the
reference's 8-column keys that drag float metadata through the shuffle
(``gold_processor.py:49-57`` groups by LATITUDE/LONGITUDE/...). Metadata
re-attaches via a post-agg broadcast join — see ``plans/joins.py``. Spark
plans partial (map-side) aggregation automatically; AQE coalesces the
post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.plans._util import (
    as_date_str,
    count_if,
    davg,
    dsum,
    t,
)
from ghcn_d_etl_project_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Flagship: monthly multi-aggregate with conditional counts + derived columns
# (reference A1+A2: gold_processor.py:49-89)
# ---------------------------------------------------------------------------

_MONTHLY_AGG_ORACLE = """
WITH base AS (
  SELECT l_returnflag, l_linestatus,
         CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         CAST(month(l_shipdate) AS BIGINT) AS ship_month,
         l_quantity, l_extendedprice, l_discount, l_tax
  FROM lineitem
), agg AS (
  SELECT l_returnflag, l_linestatus, ship_year, ship_month,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
           AS sum_disc_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,2))) AS DOUBLE) / COUNT(l_extendedprice)
           AS avg_price,
         MIN(l_extendedprice) AS min_price,
         MAX(l_extendedprice) AS max_price,
         CAST(SUM(CASE WHEN l_discount > 0.06 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
         CAST(SUM(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
  FROM base
  GROUP BY l_returnflag, l_linestatus, ship_year, ship_month
)
SELECT *,
       max_price - min_price AS price_range,
       CAST(n_discounted AS DOUBLE) / n_rows * 100 AS pct_discounted
FROM agg
"""


@register("monthly_agg", oracle=_MONTHLY_AGG_ORACLE, tags=("agg", "flagship"), bench=True,
          late=True)  # r13 rotation: 12-round green, demoted to sim coverage
def monthly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly climate-mart pattern (A1+A2): multi-agg + conditional counts
    + derived % columns, grouped by (flag, status, year, month)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.year("l_shipdate").cast("long").alias("ship_year"),
        F.month("l_shipdate").cast("long").alias("ship_month"),
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    )
    agg = li.groupBy("l_returnflag", "l_linestatus", "ship_year", "ship_month").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
            "sum_disc_price"
        ),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        count_if(F.col("l_discount") > 0.06).alias("n_discounted"),
        count_if(F.col("l_quantity") > 40).alias("n_bulk"),
    )
    return agg.withColumns(
        {
            "price_range": F.col("max_price") - F.col("min_price"),
            "pct_discounted": F.col("n_discounted").cast("double") / F.col("n_rows") * 100,
        }
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary (A1 family; classic OLAP shape)
# ---------------------------------------------------------------------------

_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
         AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6)))
         AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,2))) AS DOUBLE) / COUNT(l_extendedprice)
         AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(24,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=_PRICING_ORACLE, tags=("agg",), bench=True,
          late=True)  # r13 rotation: 12-round green, demoted to sim coverage
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter + 2-key hash agg with 8 aggregate fns."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
            "sum_disc_price"
        ),
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
            scale=6,
        ).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# A9 exact distinct count + A10 global min/max/avg + A11 frequency table,
# fused into ONE rollup pass (was distinct_count / global_minmax in round 1
# and table_profile + freq_table in round 2 — merged in round 3 to free a
# driver correctness slot; COVERAGE.md records the mapping)
# ---------------------------------------------------------------------------

_TABLE_PROFILE_ORACLE = """
SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
            ELSE o_orderpriority END AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
       strftime(MIN(o_orderdate), '%Y-%m-%d') AS min_date,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_date,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2))) AS DOUBLE) / COUNT(o_totalprice)
         AS avg_price
FROM orders
GROUP BY ROLLUP(o_orderpriority)
"""


@register(
    "table_profile",
    oracle=_TABLE_PROFILE_ORACLE,
    tags=("agg",),
    late=True,  # r11 rotation: 7 rounds green in the hard window
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency table (A11, reference ``02_bronze_processing.py:65``) +
    exact distinct counts (A9) + global min/max/avg statistics (A10) in
    ONE rollup pass — per-priority rows carry the segment frequency and
    segment stats, the GROUPING()-marked 'ALL' row carries the global
    profile. The reference runs these as separate actions
    (``bronze_processor.py:151-155``); the fused rollup is one
    expand+two-phase agg over a single scan."""
    agged = (
        t(spark, sf_dir, "orders")
        .rollup("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
            as_date_str(F.min("o_orderdate")).alias("min_date"),
            as_date_str(F.max("o_orderdate")).alias("max_date"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            davg("o_totalprice").alias("avg_price"),
            F.grouping("o_orderpriority").alias("_g"),
        )
    )
    return agged.select(
        F.when(F.col("_g") == 1, "ALL")
        .otherwise(F.col("o_orderpriority"))
        .alias("priority"),
        "n_orders",
        "n_customers",
        "n_statuses",
        "min_date",
        "max_date",
        "min_price",
        "max_price",
        "avg_price",
    )


# ---------------------------------------------------------------------------
# A15: grain-cardinality check; A16: second-level rollup of a mart
# ---------------------------------------------------------------------------

_GRAIN_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_grains,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(MAX(cnt) AS BIGINT) AS max_per_grain
FROM (
  SELECT l_orderkey, l_linenumber, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_orderkey, l_linenumber
)
"""


@register("grain_cardinality", oracle=_GRAIN_ORACLE, tags=("agg", "quality"), late=True)
def grain_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grain-cardinality lineage check (A15/Q6): groupBy(grain).count()
    then summarize — reference ``05_data_validation.py:179-180`` computed
    expected-silver rows from bronze grain."""
    per_grain = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per_grain.agg(
        F.count(F.lit(1)).alias("n_grains"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_per_grain"),
    )


_ROLLUP_ORACLE = """
WITH mart AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) AS BIGINT) AS order_year,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2))) AS DOUBLE) AS cust_year_spend,
         CAST(COUNT(*) AS BIGINT) AS cust_year_orders
  FROM orders GROUP BY o_custkey, year(o_orderdate)
)
SELECT order_year,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(cust_year_spend AS DECIMAL(28,2))) AS DOUBLE) AS total_spend,
       CAST(SUM(cust_year_orders) AS BIGINT) AS total_orders,
       MAX(cust_year_spend) AS top_customer_spend
FROM mart
GROUP BY order_year
"""


@register("cross_rollup", oracle=_ROLLUP_ORACLE, tags=("agg",), late=True)
def cross_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-level rollup over a first-level mart (A16), reference
    ``04_gold_processing.py:51-73`` state-wide trends over gold marts."""
    mart = (
        t(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey", F.year("o_orderdate").cast("long").alias("order_year")
        )
        .agg(
            dsum("o_totalprice").alias("cust_year_spend"),
            F.count(F.lit(1)).alias("cust_year_orders"),
        )
    )
    return mart.groupBy("order_year").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("cust_year_spend", scale=2, precision=28).alias("total_spend"),
        F.sum("cust_year_orders").cast("long").alias("total_orders"),
        F.max("cust_year_spend").alias("top_customer_spend"),
    )


# ---------------------------------------------------------------------------
# Multi-level aggregation: rollup / cube / grouping sets (extension — the
# reference never uses them, SURVEY.md §2.5 note; standard OLAP surface)
# ---------------------------------------------------------------------------

_MULTI_GRAIN_ORACLE = """
SELECT 'rollup' AS grain, l_returnflag, l_linestatus,
       CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
UNION ALL
SELECT 'cube' AS grain, l_returnflag, l_linestatus,
       CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
UNION ALL
SELECT 'sets' AS grain, l_returnflag, l_linestatus,
       CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


@register("multi_grain_agg", oracle=_MULTI_GRAIN_ORACLE, tags=("agg", "multilevel"), late=True)
def multi_grain_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three multi-level grouping APIs in one labeled query:
    rollup(flag, status) for hierarchical subtotals, cube for all 2^k
    combinations, and explicit grouping sets for per-flag/per-status
    marginals. Each grain expands its grouping sets BEFORE the hash
    aggregate — one shuffle per grain — with grouping_id disambiguating
    NULL-as-subtotal from NULL-as-value. (Registered as one query so the
    driver's correctness budget covers the whole family in a single row;
    was rollup_agg/cube_agg/grouping_sets_agg in round 1.)"""
    li = t(spark, sf_dir, "lineitem")

    def grain(grouped, label: str) -> DataFrame:
        return grouped.agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_quantity").alias("sum_qty"),
        ).select(
            F.lit(label).alias("grain"),
            "l_returnflag",
            "l_linestatus",
            "gid",
            "n_rows",
            "sum_qty",
        )

    return (
        grain(li.rollup("l_returnflag", "l_linestatus"), "rollup")
        .unionByName(grain(li.cube("l_returnflag", "l_linestatus"), "cube"))
        .unionByName(
            grain(
                li.groupingSets(
                    [["l_returnflag"], ["l_linestatus"]],
                    "l_returnflag",
                    "l_linestatus",
                ),
                "sets",
            )
        )
    )


# ---------------------------------------------------------------------------
# Skew handling: salted two-phase aggregation (scale posture — result is
# identical to the plain groupBy, which IS the oracle)
# ---------------------------------------------------------------------------

_SALTED_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) AS sum_qty,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,2))) AS DOUBLE)
         / CAST(COUNT(l_extendedprice) AS BIGINT) AS avg_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("salted_hot_key_agg", oracle=_SALTED_ORACLE, tags=("agg", "skew"),
          late=True)  # r12 rotation: 7-round green, demoted to sim coverage
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over an extremely hot key (l_returnflag: 3 values for
    600k rows at sf0.1) via the salted two-phase rewrite — each key's rows
    spread across 16 salt reducers before a tiny combine. Result (and
    oracle) identical to the plain groupBy; only the shuffle shape
    changes. The summed/averaged columns are decimal-quantized BEFORE
    salting so the partials combine order-insensitively (``avg`` is the
    derived two-phase form: exact decimal sum + count partials, one
    final double division — ``operators/skew.py:salted_agg``)."""
    from ghcn_d_etl_project_spark.operators.skew import salted_agg

    li = (
        t(spark, sf_dir, "lineitem")
        .withColumn("__qty_dec", F.col("l_quantity").cast("decimal(24,2)"))
        .withColumn(
            "__price_dec", F.col("l_extendedprice").cast("decimal(24,2)")
        )
    )
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        specs=[
            ("l_quantity", "count", "n_rows"),
            ("__qty_dec", "sum", "sum_qty"),
            ("l_extendedprice", "min", "min_price"),
            ("l_extendedprice", "max", "max_price"),
            ("__price_dec", "avg", "avg_price"),
        ],
        n_salts=16,
    )
    return out.withColumn("sum_qty", F.col("sum_qty").cast("double")).withColumn(
        "n_rows", F.col("n_rows").cast("long")
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (extension): merge partials, don't rebuild
# ---------------------------------------------------------------------------

_INCR_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sum_qty,
       CAST(COUNT(l_quantity) AS BIGINT) AS n_rows,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE)
         / COUNT(l_extendedprice) AS avg_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "incremental_agg_merge",
    oracle=_INCR_ORACLE,
    tags=("agg", "incremental"),
    late=True,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance (``operators/incremental.py``):
    lineitem is split into a stored 'history' batch and a newly-arrived
    'delta' batch (orderkey % 4), each reduced to mergeable PARTIALS
    (decimal sum / count / min / max, avg as hidden sum+count), then
    folded with one groupBy over the partials' union — the pipeline-level
    form of map-side combine that maintains a 100 TB rollup by touching
    only the rollup and the delta, never the history rows. The oracle is
    the full recompute over all of lineitem: merging partials must be
    bit-identical to aggregating from scratch (sums quantized to DECIMAL
    so accumulation order cannot matter)."""
    from ghcn_d_etl_project_spark.operators.incremental import (
        finalize_partials,
        merge_partials,
        partial_agg,
    )

    li = t(spark, sf_dir, "lineitem")
    history = li.filter(F.col("l_orderkey") % 4 != 0)
    delta = li.filter(F.col("l_orderkey") % 4 == 0)
    keys = ["l_returnflag", "l_linestatus"]
    specs = [
        ("l_quantity", "sum", "sum_qty"),
        ("l_quantity", "count", "n_rows"),
        ("l_extendedprice", "min", "min_price"),
        ("l_extendedprice", "max", "max_price"),
        ("l_extendedprice", "avg", "avg_price"),
    ]
    parts = [partial_agg(history, keys, specs), partial_agg(delta, keys, specs)]
    return finalize_partials(merge_partials(parts, keys, specs), specs)


# ---------------------------------------------------------------------------
# Incremental quantile maintenance (extension): mergeable histogram sketch
# ---------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH bins AS (
  SELECT l_returnflag,
         CAST(LEAST(64 - 1, GREATEST(0,
              FLOOR((l_extendedprice - 900.0) / 104100.0 * 64))) AS BIGINT)
           AS __qbin,
         COUNT(*) AS __qcnt
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL
  GROUP BY 1, 2
), cums AS (
  SELECT l_returnflag, __qbin, __qcnt,
         SUM(__qcnt) OVER (PARTITION BY l_returnflag ORDER BY __qbin)
           AS __cum,
         SUM(__qcnt) OVER (PARTITION BY l_returnflag) AS __tot
  FROM bins
), hits AS (
  SELECT c.*, q.q,
         ROW_NUMBER() OVER (PARTITION BY c.l_returnflag, q.q
                            ORDER BY c.__qbin) AS __rn
  FROM cums c
  CROSS JOIN (SELECT UNNEST([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE),
                             CAST(0.99 AS DOUBLE)]) AS q) q
  WHERE c.__cum >= q.q * c.__tot
)
SELECT l_returnflag, q,
       LEAST(105000.0, GREATEST(900.0,
         900.0 + (105000.0 - 900.0) / 64
               * (__qbin + (q * __tot - (__cum - __qcnt)) / __qcnt)))
         AS est
FROM hits
WHERE __rn = 1
"""


@register(
    "incremental_quantiles",
    oracle=_QUANT_ORACLE,
    tags=("agg", "incremental", "quantile"),
    late=True,
    bench=True,
)
def incremental_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental PERCENTILE maintenance
    (``operators/incremental.py:quantile_partial``): quantiles are
    holistic — no exact fixed-size partial exists, and Spark keeps
    percentile_approx's sketch state internal, so it cannot be stored
    and merged across pipeline runs. This maintains p50/p95/p99 of
    lineitem price per return flag as a DETERMINISTIC fixed-width
    histogram sketch (64 bins over the declared [900, 105000) domain):
    lineitem splits into a stored 'history' batch and a newly-arrived
    'delta' batch (orderkey % 4), each reduced to long-format bin-count
    partials, folded by summation, and finalized by in-bin linear
    interpolation — O(keys x bins) state regardless of history size.
    The oracle builds the identical sketch in one pass over ALL of
    lineitem: the merge path must agree bit-for-bit with the full
    recompute (pure double arithmetic both sides), the same guarantee
    ``incremental_agg_merge`` pins for algebraic aggregates."""
    from ghcn_d_etl_project_spark.operators.incremental import (
        finalize_quantiles,
        merge_quantile_partials,
        quantile_partial,
    )

    li = t(spark, sf_dir, "lineitem")
    history = li.filter(F.col("l_orderkey") % 4 != 0)
    delta = li.filter(F.col("l_orderkey") % 4 == 0)
    keys, lo, hi, n = ["l_returnflag"], 900.0, 105000.0, 64
    parts = [
        quantile_partial(history, keys, "l_extendedprice", lo, hi, n),
        quantile_partial(delta, keys, "l_extendedprice", lo, hi, n),
    ]
    merged = merge_quantile_partials(parts, keys)
    return finalize_quantiles(merged, keys, lo, hi, n, qs=(0.5, 0.95, 0.99))


# ---------------------------------------------------------------------------
# Incremental top-k maintenance (extension): exact heavy hitters
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
WITH counts AS (
  SELECT l_returnflag, CAST(l_suppkey AS BIGINT) AS l_suppkey,
         COUNT(*) AS n
  FROM lineitem
  GROUP BY 1, 2
), ranked AS (
  SELECT l_returnflag, l_suppkey, n,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY n DESC, l_suppkey ASC) AS rank
  FROM counts
)
SELECT l_returnflag, l_suppkey, CAST(n AS BIGINT) AS n,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


@register(
    "incremental_topk",
    oracle=_TOPK_ORACLE,
    tags=("agg", "incremental", "topk"),
    late=True,
)
def incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EXACT top-k maintenance
    (``operators/incremental.py:topk_partial``): the five most frequent
    suppliers per return flag, maintained as a mergeable per-(key,
    value) count rollup — history and delta batches (orderkey % 4) each
    reduce to count partials, fold by summation, finalize by ranking
    the rollup (count desc, supplier asc tie-break, deterministic on
    both engines). O(keys x suppliers) state, never O(history rows);
    the oracle is the one-pass full recompute that the merge path must
    reproduce exactly."""
    from ghcn_d_etl_project_spark.operators.incremental import (
        finalize_topk,
        merge_topk_partials,
        topk_partial,
    )

    li = t(spark, sf_dir, "lineitem").withColumn(
        "l_suppkey", F.col("l_suppkey").cast("long")
    )
    history = li.filter(F.col("l_orderkey") % 4 != 0)
    delta = li.filter(F.col("l_orderkey") % 4 == 0)
    keys = ["l_returnflag"]
    parts = [
        topk_partial(history, keys, "l_suppkey"),
        topk_partial(delta, keys, "l_suppkey"),
    ]
    return finalize_topk(
        merge_topk_partials(parts, keys, "l_suppkey"), keys, "l_suppkey", k=5
    )


@register(
    "incremental_distinct",
    oracle=None,
    tags=("agg", "incremental", "sketch"),
)
def incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental DISTINCT-COUNT maintenance
    (``operators/incremental.py:distinct_partial``): per-returnflag
    distinct part counts over lineitem, maintained as mergeable
    DataSketches HLL binaries (Spark-native ``hll_sketch_agg`` /
    ``hll_union_agg``) — store the sketch, not the values: O(2^lg_k)
    bytes per key regardless of history size. Rows-only checked: the
    estimate is implementation-defined (DuckDB's HLL differs), so the
    oracle-grade guarantee is the pytest error-band contract (merged
    within the sketch band of exact AND of a one-shot sketch;
    stepwise union == flat union)."""
    from ghcn_d_etl_project_spark.operators.incremental import (
        distinct_partial,
        finalize_distinct,
        merge_distinct_partials,
    )

    li = t(spark, sf_dir, "lineitem")
    history = li.filter(F.col("l_orderkey") % 4 != 0)
    delta = li.filter(F.col("l_orderkey") % 4 == 0)
    keys = ["l_returnflag"]
    parts = [
        distinct_partial(history, keys, "l_partkey"),
        distinct_partial(delta, keys, "l_partkey"),
    ]
    return finalize_distinct(merge_distinct_partials(parts, keys), keys)


# ---------------------------------------------------------------------------
# Per-group exact quantiles (extension): the group-wise shape of A14 —
# exact anchor at oracle scale; groups at 100 TB use the approx sketch
# ---------------------------------------------------------------------------

_GROUP_QUANTILES_ORACLE = """
SELECT event_type,
       CAST(COUNT(value) AS BIGINT) AS n,
       round(quantile_cont(value, CAST(0.1 AS DOUBLE)), 6) AS p10,
       round(quantile_cont(value, CAST(0.5 AS DOUBLE)), 6) AS p50,
       round(quantile_cont(value, CAST(0.9 AS DOUBLE)), 6) AS p90
FROM events
GROUP BY event_type
"""


@register(
    "group_quantiles",
    oracle=_GROUP_QUANTILES_ORACLE,
    tags=("agg", "quantile"),
    late=True,
)
def group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact P10/P50/P90 of event value PER GROUP — the group-wise twin
    of column_stats_outliers' global quantiles (A14), one hash aggregate.
    Same posture as there: exact ``percentile`` buffers each group's
    values, the right oracle anchor at test SF; swap
    ``percentile_approx`` (mergeable sketch, same call shape) for
    100 TB groups. Both engines interpolate the same continuous-quantile
    definition; outputs rounded to 6dp on both sides."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.round(F.expr("percentile(value, 0.1D)"), 6).alias("p10"),
        F.round(F.expr("percentile(value, 0.5D)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9D)"), 6).alias("p90"),
    )


# ---------------------------------------------------------------------------
# Per-group linear trend (extension): least-squares slope per entity
# ---------------------------------------------------------------------------

_TREND_ORACLE = """
WITH pts AS (
  SELECT o_custkey,
         CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
              AS DOUBLE) AS x,
         o_totalprice AS y
  FROM orders
),
m AS (
  SELECT o_custkey,
         COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(28,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(30,6))) AS DOUBLE) AS sxy
  FROM pts GROUP BY o_custkey
)
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(n AS BIGINT) AS n,
       CASE WHEN n >= 2 AND (n * sxx - sx * sx) != 0
            THEN round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) END AS slope,
       CASE WHEN n >= 2 AND (n * sxx - sx * sx) != 0
            THEN round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                       / n, 6)
       END AS intercept
FROM m
"""


@register(
    "trend_per_customer", oracle=_TREND_ORACLE, tags=("agg", "ml"), late=True
)
def trend_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer spend trend: least-squares slope + intercept of
    order totalprice over order date (days since the corpus epoch),
    1,500 regressions in one hash aggregate
    (``operators/quality.py:group_trend``). Exact DECIMAL moments per
    group make every regression deterministic under any partitioning —
    the distributed version of fitting a trend line per entity, the
    per-entity drift / trajectory feature a training pipeline derives
    at feature-engineering time."""
    from ghcn_d_etl_project_spark.operators.quality import group_trend

    o = t(spark, sf_dir, "orders")
    pts = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("double")
        .alias("x"),
        F.col("o_totalprice").alias("y"),
    )
    out = group_trend(pts, ["o_custkey"], "x", "y")
    return out.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "n",
        "slope",
        "intercept",
    )


# ---------------------------------------------------------------------------
# Skew diagnostics (extension, r8): measure before you salt
# ---------------------------------------------------------------------------

_SKEW_REPORT_ORACLE = """
WITH sizes AS (
  SELECT l_suppkey, COUNT(*) AS n_rows FROM lineitem GROUP BY 1
), s AS (
  SELECT COUNT(*) AS n_keys, SUM(n_rows) AS total,
         quantile_cont(n_rows, 0.5) AS p50,
         quantile_cont(n_rows, 0.9) AS p90,
         MAX(n_rows) AS mx
  FROM sizes
), top AS (
  SELECT * FROM sizes ORDER BY n_rows DESC, l_suppkey LIMIT 5
)
SELECT CAST(t.l_suppkey AS BIGINT) AS l_suppkey,
       CAST(t.n_rows AS BIGINT) AS n_rows,
       ROUND(t.n_rows * 100.0 / s.total, 6) AS share_pct,
       CAST(row_number() OVER (ORDER BY t.n_rows DESC, t.l_suppkey)
            AS BIGINT) AS heavy_rank,
       CAST(s.n_keys AS BIGINT) AS n_keys,
       ROUND(s.p50, 6) AS p50_size,
       ROUND(s.p90, 6) AS p90_size,
       CAST(s.mx AS BIGINT) AS max_size,
       ROUND(s.mx * s.n_keys / s.total, 6) AS skew_ratio
FROM top t CROSS JOIN s
"""


@register(
    "skew_report_lineitem",
    oracle=_SKEW_REPORT_ORACLE,
    tags=("agg", "skew", "diagnostic"),
    late=True,
)
def skew_report_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostics over lineitem's supplier key
    (``operators/skew.py:skew_report``): the measurement that decides
    whether a join/agg needs salting, AQE skew handling, or nothing —
    top heavy keys with their shares plus the global group-size
    distribution (interpolated percentiles, max, skew_ratio = heaviest
    key vs mean). Both branches shuffle only map-side-combined per-key
    partials (O(distinct keys), never raw rows); the summary is a
    single-row aggregate broadcast back onto the TakeOrdered top-k.
    Oracle restates it with quantile_cont (the same linear
    interpolation as Spark's percentile)."""
    from ghcn_d_etl_project_spark.operators.skew import skew_report

    li = t(spark, sf_dir, "lineitem")
    out = skew_report(li, ["l_suppkey"], top_k=5)
    return out.withColumn(
        "l_suppkey", F.col("l_suppkey").cast("long")
    )


# ---------------------------------------------------------------------------
# Association mining (extension, r8): support / confidence / lift
# ---------------------------------------------------------------------------

_ASSOC_ORACLE = """
WITH b AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
  FROM events
), nb AS (
  SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, day FROM b)
), items AS (
  SELECT event_type, COUNT(*) AS n_item FROM b GROUP BY 1
), pairs AS (
  SELECT l.event_type AS item_a, r.event_type AS item_b,
         COUNT(*) AS n_pair
  FROM b l JOIN b r
    ON l.user_id = r.user_id AND l.day = r.day
   AND l.event_type < r.event_type
  GROUP BY 1, 2
)
SELECT p.item_a, p.item_b,
       CAST(p.n_pair AS BIGINT) AS n_baskets_both,
       ROUND(p.n_pair * 1.0 / nb.n * 100.0, 6) AS support_pct,
       ROUND(p.n_pair * 1.0 / ia.n_item, 6) AS conf_a_to_b,
       ROUND(p.n_pair * 1.0 / ib.n_item, 6) AS conf_b_to_a,
       ROUND((p.n_pair * 1.0 / nb.n)
             / ((ia.n_item * 1.0 / nb.n) * (ib.n_item * 1.0 / nb.n)), 6)
         AS lift
FROM pairs p
JOIN items ia ON ia.event_type = p.item_a
JOIN items ib ON ib.event_type = p.item_b
CROSS JOIN nb
"""


@register(
    "event_copurchase",
    oracle=_ASSOC_ORACLE,
    tags=("agg", "association"),
    late=True,
)
def event_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise association rules over (user, day) event-type baskets
    (``operators/association.py:basket_pairs``): support, both
    confidences, and lift — which behaviors co-occur in the same
    user-day beyond chance. The pair self-join is ON THE BASKET KEYS so
    its fan-out is bounded by basket width C(5, 2), never basket count;
    item/pair counts are map-side-combined over bounded vocabularies
    and the one-row basket total broadcasts. Oracle restates the same
    relational algebra."""
    from ghcn_d_etl_project_spark.operators.association import basket_pairs

    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        "event_type",
    )
    out = basket_pairs(e, ["user_id", "day"], "event_type")
    return out.select(
        F.col("item_a"),
        F.col("item_b"),
        "n_baskets_both",
        "support_pct",
        "conf_a_to_b",
        "conf_b_to_a",
        "lift",
    )


# ---------------------------------------------------------------------------
# Statistical mode per group (extension, r9)
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
tot AS (SELECT o_orderstatus, SUM(n) AS t FROM c GROUP BY 1),
r AS (
  SELECT c.o_orderstatus, o_orderpriority, n, t,
         ROW_NUMBER() OVER (PARTITION BY c.o_orderstatus
                            ORDER BY n DESC, o_orderpriority) AS rn
  FROM c JOIN tot ON c.o_orderstatus = tot.o_orderstatus
)
SELECT o_orderstatus, o_orderpriority AS mode_value,
       CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / t, 6) AS share
FROM r WHERE rn = 1
"""


@register(
    "mode_per_group_orders",
    oracle=_MODE_ORACLE,
    tags=("agg", "stats"),
    late=True,
)
def mode_per_group_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode (most frequent value, ties broken by smallest
    value — deterministic, unlike Spark's own ``F.mode`` whose tie
    choice is non-deterministic by documentation) of order priority per
    order status, with its frequency share. Completes the A13 summary
    family for CATEGORICAL columns. One full-data groupBy collapses to
    |status x priority| rows; the rank window and the share join run on
    that tiny table — nothing after the first aggregate scales with the
    fact table."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # total via a second frame over the SAME tiny collapsed table —
    # a separate aggregate would re-scan the fact table (plan_report
    # showed 2 source scans before this)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    tw = Window.partitionBy("o_orderstatus")
    return (
        c.withColumn("t", F.sum("n").over(tw))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_value"),
            "n",
            F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch estimates (extension, r9): bounded-memory counting
# ---------------------------------------------------------------------------

_CMS_ORACLE = """
WITH vals AS (
  SELECT CAST(user_id AS VARCHAR) AS v FROM events WHERE user_id IS NOT NULL
),
cells AS (
  SELECT d,
         CAST(concat('0x', substr(md5(v || ':cms:' || d), 1, 8)) AS BIGINT)
           % 64 AS bucket,
         COUNT(*) AS cnt
  FROM vals, UNNEST(generate_series(0, 2)) AS s(d)
  GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT user_id FROM events
  WHERE user_id IS NOT NULL AND user_id < 100
),
probes AS (
  SELECT user_id, d,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)
                                       || ':cms:' || d), 1, 8)) AS BIGINT)
           % 64 AS bucket
  FROM cand, UNNEST(generate_series(0, 2)) AS s(d)
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est
FROM probes LEFT JOIN cells USING (d, bucket)
GROUP BY 1
"""


@register(
    "cms_estimate_events",
    oracle=_CMS_ORACLE,
    tags=("agg", "sketch", "incremental"),
    late=True,  # rotated out of hard window r14 (tenure since <=r10)
)
def cms_estimate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (width 64, depth 3) over event user ids, point-
    queried for users < 100 (``operators/incremental.py:cms_sketch`` /
    ``cms_estimate``) — the bounded-memory counting state for value
    domains too large for the exact ``incremental_topk`` rollup:
    O(width x depth) counters total, merged across batches by plain
    addition, sketch-sized shuffle (map-side combine collapses every
    partition to <= width x depth rows). The deliberately small width
    forces real collisions at this SF, so the MATCH certifies the
    one-sided over-estimates cell by cell — possible only because the
    md5 hash rows make an approximate structure deterministic
    cross-engine."""
    from ghcn_d_etl_project_spark.operators.incremental import (
        cms_estimate,
        cms_sketch,
    )

    e = t(spark, sf_dir, "events")
    sketch = cms_sketch(e, "user_id", width=64, depth=3)
    cand = e.filter(F.col("user_id") < 100).select("user_id")
    out = cms_estimate(sketch, cand, "user_id", width=64, depth=3)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"), "est"
    )


# ---------------------------------------------------------------------------
# Business-day fulfillment latency (extension, r9)
# ---------------------------------------------------------------------------

_BDAYS_ORACLE = """
WITH ls AS (
  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS last_ship
  FROM lineitem GROUP BY 1
),
j AS (
  -- floored division + floored (positive) modulus, mirroring the
  -- engine's floor()/pmod() pair so the formula holds for pre-anchor
  -- dates too (DuckDB's bare % is a signed remainder like Spark's)
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE), last_ship) AS cal,
         (5 * CAST(floor(date_diff('day', DATE '1969-12-29',
                                   last_ship) / 7.0) AS BIGINT)
            + LEAST(((date_diff('day', DATE '1969-12-29', last_ship)
                      % 7) + 7) % 7, 5))
         - (5 * CAST(floor(date_diff('day', DATE '1969-12-29',
                           CAST(o_orderdate AS DATE)) / 7.0) AS BIGINT)
            + LEAST(((date_diff('day', DATE '1969-12-29',
                              CAST(o_orderdate AS DATE)) % 7) + 7) % 7,
                    5)) AS bd
  FROM orders JOIN ls ON o_orderkey = l_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       round(CAST(SUM(cal) AS DOUBLE) / COUNT(*), 6) AS avg_cal_days,
       round(CAST(SUM(bd) AS DOUBLE) / COUNT(*), 6) AS avg_business_days
FROM j GROUP BY 1
"""


@register(
    "fulfillment_bdays_orders",
    oracle=_BDAYS_ORACLE,
    tags=("agg", "temporal"),
    late=True,
)
def fulfillment_bdays_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average order-to-last-shipment latency per priority, in calendar
    AND business days (``operators/timeseries.py:
    business_days_between`` — the Mon-Fri working-duration arithmetic
    Spark's calendar datediff doesn't provide). The closed form is one
    integer expression per row (prefix-difference over a Monday-anchor
    weekday count): no calendar-table join, no generate-and-filter
    explode — at 100 TB the latency column costs the same as datediff.
    Averages are exact BIGINT sums over one double division."""
    from ghcn_d_etl_project_spark.operators.timeseries import (
        business_days_between,
    )

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    ls = li.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("last_ship")
    )
    j = o.join(ls, o["o_orderkey"] == ls["l_orderkey"]).select(
        "o_orderpriority",
        F.datediff("last_ship", F.col("o_orderdate").cast("date")).alias(
            "cal"
        ),
        business_days_between(
            F.col("o_orderdate").cast("date"), F.col("last_ship")
        ).alias("bd"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(
            F.sum(F.col("cal").cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_cal_days"),
        F.round(
            F.sum("bd").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_business_days"),
    )
