"""Data-quality queries (SURVEY.md §2.12) wired to operators/quality.py.

The NULL-bearing input is the pivoted events table (one row per
user x day, one column per event type — absent combinations are NULL),
standing in for the reference's silver element columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.quality import (
    column_stats_with_outliers,
    completeness,
    quality_score,
)
from ghcn_d_etl_project_spark.operators.reshape import pivot_wide
from ghcn_d_etl_project_spark.plans._util import as_date_str, t
from ghcn_d_etl_project_spark.plans.registry import register

_EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]

_PIVOT_CTE = """
WITH pivoted AS (
  SELECT user_id,
         strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
         MAX(CASE WHEN event_type = 'click' THEN value END) AS click,
         MAX(CASE WHEN event_type = 'view' THEN value END) AS view,
         MAX(CASE WHEN event_type = 'signup' THEN value END) AS signup,
         MAX(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
         MAX(CASE WHEN event_type = 'error' THEN value END) AS error
  FROM events
  GROUP BY user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d')
)
"""


def _pivoted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
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


# ---------------------------------------------------------------------------
# Q1: row-level quality score with consistency penalty
# ---------------------------------------------------------------------------

_SCORE_ORACLE = (
    _PIVOT_CTE
    + """
SELECT user_id, event_date,
       CASE WHEN error IS NOT NULL AND purchase IS NOT NULL THEN
         (CAST(click IS NOT NULL AS INTEGER) + CAST(view IS NOT NULL AS INTEGER)
          + CAST(signup IS NOT NULL AS INTEGER) + CAST(purchase IS NOT NULL AS INTEGER)
          + CAST(error IS NOT NULL AS INTEGER)) / 5.0 * 0.8
       ELSE
         (CAST(click IS NOT NULL AS INTEGER) + CAST(view IS NOT NULL AS INTEGER)
          + CAST(signup IS NOT NULL AS INTEGER) + CAST(purchase IS NOT NULL AS INTEGER)
          + CAST(error IS NOT NULL AS INTEGER)) / 5.0
       END AS data_quality_score
FROM pivoted
"""
)


@register(
    "quality_score_rows",
    oracle=_SCORE_ORACLE,
    tags=("quality",),
    late=True,  # r11 rotation: 7 rounds green in the hard window
)
def quality_score_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quality score (Q1): non-null fraction of the 5 pivoted
    event columns, x0.8 penalty when an error coexists with a purchase —
    the analog of the reference's TMAX<TMIN penalty
    (``silver_processor.py:121-142``)."""
    pv = _pivoted_events(spark, sf_dir)
    penalty = F.col("error").isNotNull() & F.col("purchase").isNotNull()
    return pv.select(
        "user_id",
        "event_date",
        quality_score(_EVENT_TYPES, penalty_cond=penalty).alias(
            "data_quality_score"
        ),
    )


# ---------------------------------------------------------------------------
# Q4/A12: fused single-pass completeness
# ---------------------------------------------------------------------------

_COMPLETENESS_ORACLE = (
    _PIVOT_CTE
    + """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(click) AS BIGINT) AS click_nonnull,
       CAST(COUNT(view) AS BIGINT) AS view_nonnull,
       CAST(COUNT(signup) AS BIGINT) AS signup_nonnull,
       CAST(COUNT(purchase) AS BIGINT) AS purchase_nonnull,
       CAST(COUNT(error) AS BIGINT) AS error_nonnull,
       CAST(COUNT(click) AS DOUBLE) / COUNT(*) * 100 AS click_pct,
       CAST(COUNT(view) AS DOUBLE) / COUNT(*) * 100 AS view_pct,
       CAST(COUNT(signup) AS DOUBLE) / COUNT(*) * 100 AS signup_pct,
       CAST(COUNT(purchase) AS DOUBLE) / COUNT(*) * 100 AS purchase_pct,
       CAST(COUNT(error) AS DOUBLE) / COUNT(*) * 100 AS error_pct
FROM pivoted
"""
)


@register("completeness_single_pass", oracle=_COMPLETENESS_ORACLE, tags=("quality",),
          late=True)  # r12 rotation: 7-round green, demoted to sim coverage
def completeness_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column completeness % in ONE aggregate job (Q4/A12) — the fused
    replacement for the reference's per-column count() loop
    (``data_validator.py:86-97``): at scale, 1 job instead of N."""
    return completeness(_pivoted_events(spark, sf_dir), _EVENT_TYPES)


# ---------------------------------------------------------------------------
# A13 describe()-stats + Q5/A14 exact-quantile IQR outliers, fused into one
# two-scan query (was summary_stats + iqr_outliers in rounds 1-2 — merged in
# round 3 to free a driver correctness slot; COVERAGE.md records the mapping)
# ---------------------------------------------------------------------------

_STATS_OUTLIER_ORACLE = """
WITH wide AS (
  SELECT
    CAST(COUNT(o_totalprice) AS BIGINT) AS p__n,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS p__s,
    CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS p__ssq,
    MIN(o_totalprice) AS p__min, MAX(o_totalprice) AS p__max,
    round(quantile_cont(o_totalprice, 0.25), 6) AS p__q1,
    round(quantile_cont(o_totalprice, 0.75), 6) AS p__q3,
    CAST(COUNT(o_custkey) AS BIGINT) AS c__n,
    CAST(SUM(CAST(o_custkey AS DECIMAL(28,4))) AS DOUBLE) AS c__s,
    CAST(SUM(CAST(o_custkey * o_custkey AS DECIMAL(30,6))) AS DOUBLE) AS c__ssq,
    CAST(MIN(o_custkey) AS DOUBLE) AS c__min, CAST(MAX(o_custkey) AS DOUBLE) AS c__max,
    round(quantile_cont(CAST(o_custkey AS DOUBLE), 0.25), 6) AS c__q1,
    round(quantile_cont(CAST(o_custkey AS DOUBLE), 0.75), 6) AS c__q3
  FROM orders
), oc AS (
  SELECT
    CAST(SUM(CASE WHEN o.o_totalprice < w.p__q1 - 1.5 * (w.p__q3 - w.p__q1)
                    OR o.o_totalprice > w.p__q3 + 1.5 * (w.p__q3 - w.p__q1)
                  THEN 1 ELSE 0 END) AS BIGINT) AS p__out,
    CAST(SUM(CASE WHEN o.o_custkey < w.c__q1 - 1.5 * (w.c__q3 - w.c__q1)
                    OR o.o_custkey > w.c__q3 + 1.5 * (w.c__q3 - w.c__q1)
                  THEN 1 ELSE 0 END) AS BIGINT) AS c__out
  FROM orders o CROSS JOIN wide w
)
SELECT 'o_totalprice' AS column_name, p__n AS n, p__s / p__n AS mean,
       CASE WHEN p__n > 1
            THEN round(sqrt((p__ssq - p__s * p__s / p__n) / (p__n - 1)), 6) END AS stddev,
       p__min AS min_val, p__max AS max_val,
       p__q1 AS q1, p__q3 AS q3, p__q3 - p__q1 AS iqr,
       p__q1 - 1.5 * (p__q3 - p__q1) AS lower_bound,
       p__q3 + 1.5 * (p__q3 - p__q1) AS upper_bound,
       p__out AS n_outliers
FROM wide, oc
UNION ALL
SELECT 'o_custkey', c__n, c__s / c__n,
       CASE WHEN c__n > 1
            THEN round(sqrt((c__ssq - c__s * c__s / c__n) / (c__n - 1)), 6) END,
       c__min, c__max, c__q1, c__q3, c__q3 - c__q1,
       c__q1 - 1.5 * (c__q3 - c__q1), c__q3 + 1.5 * (c__q3 - c__q1), c__out
FROM wide, oc
"""


@register("column_stats_outliers", oracle=_STATS_OUTLIER_ORACLE, tags=("quality", "agg"),
          late=True)  # r12 rotation: 7-round green, demoted to sim coverage
def column_stats_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()-stats (A13, ``03_silver_processing.py:64-88``) + exact
    IQR outlier counts (Q5, ``data_validator.py:99-115``) for every
    column in two scans total: one moments+quantiles aggregate, one
    outlier-count aggregate against the broadcast 1-row bounds. stddev
    from exact decimal moments (deterministic, unlike order-dependent
    streaming variance). Exact percentile is the ORACLE ANCHOR; the
    production scale path is ``iqr_outliers_approx``."""
    o = t(spark, sf_dir, "orders").select(
        "o_totalprice", F.col("o_custkey").cast("double").alias("o_custkey")
    )
    return column_stats_with_outliers(o, ["o_totalprice", "o_custkey"])


# r12 (VERDICT directive #5): the sketch output itself can never
# value-hash cross-engine, but its RANK-ERROR CERTIFICATE can — the
# Spark side exactly counts where the sketch's q1/q3 land in the data
# and checks the target rank sits within a ±1% band (100x the sketch's
# own n/10000 guarantee); the oracle pins n and the TRUE verdicts. A
# sketch regression (wrong p, broken accuracy, swapped bound) flips a
# boolean and the hash mismatches.
_APPROX_CERT_ORACLE = """
SELECT CAST(COUNT(o_totalprice) AS BIGINT) AS n,
       TRUE AS q1_in_band,
       TRUE AS q3_in_band
FROM orders
"""


@register("iqr_outliers_approx", oracle=_APPROX_CERT_ORACLE,
          tags=("quality",))  # promoted to the hard window in the r13 rotation
def iqr_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based IQR quantiles via percentile_approx (A14) — the
    100 TB path (mergeable single-pass sketch, no sort; the reference's
    approxQuantile(…, 0.05) shape, ``operators/quality.py:
    approx_quantile_bounds``). Since r12 the registered form is the
    rank-error CERTIFICATE (``approx_quantile_certificate``): exact
    integer rank counts of the sketch's q1/q3 against a ±1% tolerance
    band, hash-checked against the oracle's pinned verdicts — the
    'oracle the exact anchor with a tolerance band' recipe for
    approximate operators."""
    from ghcn_d_etl_project_spark.operators.quality import (
        approx_quantile_certificate,
    )

    return approx_quantile_certificate(
        t(spark, sf_dir, "orders"), "o_totalprice"
    )


# ---------------------------------------------------------------------------
# Bivariate profiling (extension): exact-moment correlation + histogram —
# the two profile shapes the univariate A13 family doesn't cover
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
WITH m AS (
  SELECT
    COUNT(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
               THEN 1 END) AS n1,
    CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx1,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sy1,
    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sxx1,
    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS syy1,
    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sxy1,
    CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) AS sy2,
    CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS syy2,
    CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS sxy2,
    CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS sxy3
  FROM lineitem
),
pairs AS (
  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
         n1 AS n, sx1 AS sx, sy1 AS sy, sxx1 AS sxx, syy1 AS syy, sxy1 AS sxy
  FROM m
  UNION ALL
  SELECT 'l_quantity', 'l_discount', n1, sx1, sy2, sxx1, syy2, sxy2 FROM m
  UNION ALL
  SELECT 'l_extendedprice', 'l_discount', n1, sy1, sy2, syy1, syy2, sxy3 FROM m
)
SELECT col_x, col_y, CAST(n AS BIGINT) AS n,
       round((sxy - sx * sy / n) / n, 6) AS covar_pop,
       CASE WHEN sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0
            THEN round((n * sxy - sx * sy)
                       / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
       END AS corr
FROM pairs
"""


@register("corr_matrix", oracle=_CORR_ORACLE, tags=("quality", "agg"), late=True)
def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation + population covariance over the three
    lineitem measures, all pairs in ONE scan
    (``operators/quality.py:corr_pairs``). Correlations come from exact
    DECIMAL co-moments folded into one double expression — deterministic
    under any partitioning, where ``F.corr``'s streaming accumulation is
    order-dependent and could never hash-match an oracle. lineitem has no
    NULLs, so the three pairs share one n; the operator still computes
    per-pair conditional moments (two-sided NULL semantics), and the
    oracle mirrors that with a CASE-counted n."""
    from ghcn_d_etl_project_spark.operators.quality import corr_pairs

    li = t(spark, sf_dir, "lineitem")
    return corr_pairs(
        li,
        [
            ("l_quantity", "l_extendedprice"),
            ("l_quantity", "l_discount"),
            ("l_extendedprice", "l_discount"),
        ],
    )


_HISTOGRAM_ORACLE = """
WITH binned AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((o_totalprice - 0.0) / 25000.0) AS BIGINT),
                        0), 19) AS bin,
         COUNT(*) AS n
  FROM orders
  WHERE o_totalprice IS NOT NULL
  GROUP BY 1
),
tot AS (SELECT SUM(n) AS total FROM binned)
SELECT CAST(bin AS BIGINT) AS bin,
       0.0 + CAST(bin AS DOUBLE) * 25000.0 AS bin_lo,
       0.0 + (CAST(bin AS DOUBLE) + 1) * 25000.0 AS bin_hi,
       CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
FROM binned, tot
"""


@register(
    "histogram_bins", oracle=_HISTOGRAM_ORACLE, tags=("quality", "agg"), late=True
)
def histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin fixed-width histogram of o_totalprice over [0, 500k)
    (``operators/quality.py:histogram_fixed_width``): one groupBy on a
    derived integer key — map-side partials collapse every partition to
    <= 20 rows before the shuffle, so the plan is scan-bound at any
    scale; share via broadcast 1-row total, no single-partition
    window."""
    from ghcn_d_etl_project_spark.operators.quality import (
        histogram_fixed_width,
    )

    return histogram_fixed_width(
        t(spark, sf_dir, "orders"), "o_totalprice", lo=0.0, hi=500_000.0, n_bins=20
    )


_SPEARMAN_RANK_CTES = """
qv AS (SELECT l_quantity AS v, COUNT(*) AS c FROM lineitem GROUP BY 1),
qr AS (
  SELECT v,
         CAST(COALESCE(SUM(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS DOUBLE) + (CAST(c AS DOUBLE) + 1) / 2 AS r
  FROM qv
),
dv AS (SELECT l_discount AS v, COUNT(*) AS c FROM lineitem GROUP BY 1),
dr AS (
  SELECT v,
         CAST(COALESCE(SUM(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS DOUBLE) + (CAST(c AS DOUBLE) + 1) / 2 AS r
  FROM dv
),
tv AS (SELECT l_tax AS v, COUNT(*) AS c FROM lineitem GROUP BY 1),
tr AS (
  SELECT v,
         CAST(COALESCE(SUM(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS DOUBLE) + (CAST(c AS DOUBLE) + 1) / 2 AS r
  FROM tv
),
ranked AS (
  SELECT qr.r AS rq, dr.r AS rd, tr.r AS rt
  FROM lineitem l
  JOIN qr ON l.l_quantity = qr.v
  JOIN dr ON l.l_discount = dr.v
  JOIN tr ON l.l_tax = tr.v
),
m AS (
  SELECT COUNT(*) AS n,
    CAST(SUM(CAST(rq AS DECIMAL(28,4))) AS DOUBLE) AS sq,
    CAST(SUM(CAST(rd AS DECIMAL(28,4))) AS DOUBLE) AS sd,
    CAST(SUM(CAST(rt AS DECIMAL(28,4))) AS DOUBLE) AS st,
    CAST(SUM(CAST(rq * rq AS DECIMAL(30,6))) AS DOUBLE) AS sqq,
    CAST(SUM(CAST(rd * rd AS DECIMAL(30,6))) AS DOUBLE) AS sdd,
    CAST(SUM(CAST(rt * rt AS DECIMAL(30,6))) AS DOUBLE) AS stt,
    CAST(SUM(CAST(rq * rd AS DECIMAL(30,6))) AS DOUBLE) AS sqd,
    CAST(SUM(CAST(rq * rt AS DECIMAL(30,6))) AS DOUBLE) AS sqt,
    CAST(SUM(CAST(rd * rt AS DECIMAL(30,6))) AS DOUBLE) AS sdt
  FROM ranked
)
"""

_SPEARMAN_ORACLE = f"""
WITH {_SPEARMAN_RANK_CTES},
pairs AS (
  SELECT 'l_quantity' AS col_x, 'l_discount' AS col_y,
         n, sq AS sx, sd AS sy, sqq AS sxx, sdd AS syy, sqd AS sxy FROM m
  UNION ALL
  SELECT 'l_quantity', 'l_tax', n, sq, st, sqq, stt, sqt FROM m
  UNION ALL
  SELECT 'l_discount', 'l_tax', n, sd, st, sdd, stt, sdt FROM m
)
SELECT col_x, col_y, CAST(n AS BIGINT) AS n,
       CASE WHEN sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0
            THEN round((n * sxy - sx * sy)
                       / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
       END AS spearman_rho
FROM pairs
"""


@register(
    "spearman_matrix", oracle=_SPEARMAN_ORACLE, tags=("quality", "agg"), late=True
)
def spearman_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation over the three low-cardinality lineitem
    measures (``operators/quality.py:spearman_pairs``): average ranks are
    a function of the VALUE, so they are computed on each column's
    distinct-value table (50/11/9 rows) and broadcast back — the fact
    table never globally sorts or shuffles for ranking, which is what
    makes rank statistics feasible at 100 TB. Pearson on the ranks then
    reuses corr_pairs' exact DECIMAL co-moments (ranks are exact k/2
    halves), so the whole statistic is deterministic — no approximation
    — and the oracle restates both stages exactly."""
    from ghcn_d_etl_project_spark.operators.quality import spearman_pairs

    li = t(spark, sf_dir, "lineitem")
    return spearman_pairs(
        li,
        [
            ("l_quantity", "l_discount"),
            ("l_quantity", "l_tax"),
            ("l_discount", "l_tax"),
        ],
    )


_CAT_ASSOC_ORACLE = """
WITH cells AS (
  SELECT lang AS x, source AS y, COUNT(*) AS o FROM documents GROUP BY 1, 2
),
rx AS (SELECT x, SUM(o) AS r FROM cells GROUP BY 1),
cy AS (SELECT y, SUM(o) AS c FROM cells GROUP BY 1),
tot AS (SELECT SUM(o) AS n, COUNT(*) AS cells,
               (SELECT COUNT(*) FROM rx) AS nx,
               (SELECT COUNT(*) FROM cy) AS ny
        FROM cells),
parts AS (
  SELECT
    CAST(SUM(CAST(
      (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
      * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
      / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
      - (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
      AS DECIMAL(28,12))) AS DOUBLE) AS chi_part,
    CAST(SUM(CAST(
      (CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
      * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE)) / CAST(r * c AS DOUBLE))
      AS DECIMAL(28,12))) AS DOUBLE) AS mi,
    CAST(SUM(CAST(
      -(CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
      * ln(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
      AS DECIMAL(28,12))) AS DOUBLE) AS h_x,
    CAST(SUM(CAST(
      -(CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
      * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
      AS DECIMAL(28,12))) AS DOUBLE) AS h_y
  FROM cells JOIN rx USING (x) JOIN cy USING (y) CROSS JOIN tot
)
SELECT 'lang' AS col_x, 'source' AS col_y,
       CAST(n AS BIGINT) AS n,
       CAST((nx - 1) * (ny - 1) AS BIGINT) AS dof,
       round(chi_part + CAST(n AS DOUBLE), 6) AS chi2,
       CASE WHEN LEAST(nx, ny) > 1 AND n > 0
            THEN round(sqrt((chi_part + CAST(n AS DOUBLE))
                            / (CAST(n AS DOUBLE) * (LEAST(nx, ny) - 1))), 6)
       END AS cramers_v,
       round(mi, 6) AS mutual_info,
       round(h_x, 6) AS h_x,
       round(h_y, 6) AS h_y
FROM parts, tot
"""


@register(
    "categorical_association",
    oracle=_CAT_ASSOC_ORACLE,
    tags=("quality", "agg"),
    late=True,
)
def categorical_association_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square, Cramer's V, mutual information, and margin entropies
    for documents (lang x source) in one contingency scan
    (``operators/quality.py:categorical_association``) — the
    feature-selection / drift-detection primitive. Everything past the
    groupBy runs on the <= |X|*|Y| cell table; zero cells fold in
    algebraically (sum over all cells of (o-e)^2/e == observed-cell sum
    of ((o-e)^2/e - e) + n); per-cell contributions quantize to DECIMAL
    before the final sum so the statistic is accumulation-order-free on
    both engines. Since r13 the margin entropies fold into the same
    single aggregate (sum_cells -(o/n)ln(margin/n) == the margin sum),
    so the one-row totals broadcast attaches exactly once."""
    from ghcn_d_etl_project_spark.operators.quality import (
        categorical_association,
    )

    return categorical_association(
        t(spark, sf_dir, "documents"), "lang", "source"
    )


# ---------------------------------------------------------------------------
# Robust (median/MAD) outliers — the breakdown-resistant A13/A14 twin
# ---------------------------------------------------------------------------

_ROBUST_ORACLE = """
WITH med AS (
  SELECT o_orderpriority AS g, quantile_cont(o_totalprice, 0.5) AS med
  FROM orders GROUP BY 1
), j AS (
  SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice, m.med,
         ABS(o.o_totalprice - m.med) AS dev
  FROM orders o JOIN med m ON o.o_orderpriority = m.g
), mad AS (
  SELECT o_orderpriority AS g, quantile_cont(dev, 0.5) AS mad
  FROM j GROUP BY 1
)
SELECT CAST(j.o_orderkey AS BIGINT) AS o_orderkey,
       j.o_orderpriority, j.o_totalprice,
       ROUND(j.med, 6) AS med,
       ROUND(m2.mad, 6) AS mad,
       CASE WHEN m2.mad > 0
            THEN ROUND(0.6745 * j.dev / m2.mad, 6) END AS robust_z,
       CAST(CASE WHEN m2.mad > 0 AND j.dev > 3.0 * m2.mad
                 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
FROM j JOIN mad m2 ON j.o_orderpriority = m2.g
"""


@register(
    "robust_outliers_orders",
    oracle=_ROBUST_ORACLE,
    tags=("quality", "stats"),
    late=True,
)
def robust_outliers_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier flags per order priority
    (``operators/quality.py:robust_outliers``): the 50%-breakdown twin
    of the mean/stddev and IQR families — contamination can't move the
    fence it's measured against. Two percentile aggregates + two
    broadcast joins back; the exact form is the oracle anchor, the
    percentile_approx twin is the 100 TB path."""
    from ghcn_d_etl_project_spark.operators.quality import robust_outliers

    return robust_outliers(
        t(spark, sf_dir, "orders").select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_orderpriority",
            "o_totalprice",
        ),
        "o_totalprice",
        group_cols=["o_orderpriority"],
    )


# ---------------------------------------------------------------------------
# Shannon entropy profiling — information-theoretic column profile
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH stacked AS (
  SELECT 'o_orderstatus' AS col,
         COALESCE(CAST(o_orderstatus AS VARCHAR), '__null') AS val FROM orders
  UNION ALL
  SELECT 'o_orderpriority',
         COALESCE(CAST(o_orderpriority AS VARCHAR), '__null') FROM orders
  UNION ALL
  SELECT 'order_year',
         COALESCE(CAST(year(o_orderdate) AS VARCHAR), '__null') FROM orders
  UNION ALL
  SELECT 'o_custkey',
         COALESCE(CAST(o_custkey AS VARCHAR), '__null') FROM orders
), counts AS (
  SELECT col, val, COUNT(*) AS c FROM stacked GROUP BY 1, 2
), terms AS (
  SELECT col,
         SUM(c) OVER (PARTITION BY col) AS n,
         CAST(ROUND(-((CAST(c AS DOUBLE) / (SUM(c) OVER (PARTITION BY col)))
                      * log2(CAST(c AS DOUBLE)
                             / (SUM(c) OVER (PARTITION BY col)))), 9)
              AS DECIMAL(18,9)) AS t
  FROM counts
)
SELECT col,
       CAST(MAX(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(CAST(SUM(t) AS DOUBLE), 6) AS entropy_bits,
       ROUND(log2(CAST(COUNT(*) AS DOUBLE)), 6) AS max_entropy_bits,
       CASE WHEN COUNT(*) > 1
            THEN ROUND(CAST(SUM(t) AS DOUBLE)
                       / log2(CAST(COUNT(*) AS DOUBLE)), 6)
       END AS norm_entropy
FROM terms GROUP BY col
"""


@register(
    "entropy_profile_orders",
    oracle=_ENTROPY_ORACLE,
    tags=("quality", "profile"),
    late=True,
)
def entropy_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy per column over four orders columns spanning the
    cardinality spectrum (``operators/quality.py:entropy_profile``):
    status (3 values), priority (5), year (7), custkey (~n/10).
    One stacked pass + one hash aggregate for all columns; p*log2(p)
    terms quantized to DECIMAL before the per-column sum (the
    charlm/corr parity convention)."""
    from ghcn_d_etl_project_spark.operators.quality import entropy_profile

    o = t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderpriority",
        F.year("o_orderdate").alias("order_year"),
        "o_custkey",
    )
    return entropy_profile(
        o, ["o_orderstatus", "o_orderpriority", "order_year", "o_custkey"]
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

import math as _math

_BENFORD_PS = ", ".join(
    f"({d}, CAST({_math.log10(1 + 1 / d)!r} AS DOUBLE))" for d in range(1, 10)
)

_BENFORD_ORACLE = f"""
WITH base AS (
  SELECT CAST(regexp_extract(CAST(abs(o_totalprice) AS VARCHAR),
                             '([1-9])', 1) AS INT) AS digit
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_totalprice <> 0
), counts AS (
  SELECT digit, COUNT(*) AS n FROM base WHERE digit IS NOT NULL GROUP BY 1
), bp(digit, p) AS (VALUES {_BENFORD_PS}),
dense AS (
  SELECT bp.digit, COALESCE(counts.n, 0) AS n, bp.p
  FROM bp LEFT JOIN counts ON bp.digit = counts.digit
), staged AS (
  SELECT digit, n, p,
         SUM(n) OVER () AS n_used,
         CAST(n AS DOUBLE) / (SUM(n) OVER ()) AS share,
         ROUND(p, 6) AS bp6,
         CAST(ROUND((CAST(n AS DOUBLE) / (SUM(n) OVER ()) - ROUND(p, 6))
                    * (CAST(n AS DOUBLE) / (SUM(n) OVER ()) - ROUND(p, 6))
                    / ROUND(p, 6) * (SUM(n) OVER ()), 9)
              AS DECIMAL(18,9)) AS chi2_t
  FROM dense
)
SELECT digit, CAST(n AS BIGINT) AS n,
       ROUND(share, 6) AS share,
       bp6 AS benford_p,
       ROUND(share - bp6, 6) AS deviation,
       CAST(chi2_t AS DOUBLE) AS chi2_term,
       ROUND(CAST(SUM(chi2_t) OVER () AS DOUBLE), 6) AS chi2,
       CAST(n_used AS BIGINT) AS n_used
FROM staged
"""


@register(
    "benford_audit_orders",
    oracle=_BENFORD_ORACLE,
    tags=("quality", "audit"),
    late=True,
)
def benford_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order values
    (``operators/quality.py:benford_audit``): the fabricated-numbers
    screen — one hash aggregate to nine rows, chi-square and
    deviations on the constant-size frame, digit extracted from the
    plain string form (magnitude-determined, cross-engine-stable).
    Note the TPC-H-ish price generator is roughly uniform in a band,
    NOT Benford — the audit correctly reports a large chi2 on it,
    which is exactly the point of having the audit."""
    from ghcn_d_etl_project_spark.operators.quality import benford_audit

    return benford_audit(t(spark, sf_dir, "orders"), "o_totalprice")


# ---------------------------------------------------------------------------
# Weighted median (extension, r9): the weighted robust center
# ---------------------------------------------------------------------------

_WMEDIAN_ORACLE = """
WITH base AS (
  SELECT l_returnflag, l_extendedprice AS v,
         CAST(l_quantity AS DECIMAL(28,4)) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
),
collapsed AS (
  SELECT l_returnflag, v, SUM(w) AS wsum FROM base GROUP BY 1, 2
),
marked AS (
  SELECT l_returnflag, v,
         SUM(wsum) OVER (PARTITION BY l_returnflag ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         SUM(wsum) OVER (PARTITION BY l_returnflag) AS tw
  FROM collapsed
)
SELECT l_returnflag,
       CAST(MIN(v) AS DOUBLE) AS weighted_median,
       CAST(MAX(tw) AS DOUBLE) AS total_weight
FROM marked WHERE cw * 2 >= tw
GROUP BY 1
"""


@register(
    "weighted_median_lineitem",
    oracle=_WMEDIAN_ORACLE,
    tags=("quality", "stats"),
    late=True,  # rotated out of hard window r14 (tenure since <=r10)
)
def weighted_median_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag
    (``operators/quality.py:weighted_median``): the LOWER weighted
    median — smallest value whose cumulative weight reaches half the
    group total; always an observed value, so exactly restatable in
    SQL where interpolating variants are not. The facts collapse to
    distinct (group, value) rows with exact-DECIMAL weight sums in one
    map-side-combined groupBy; the cumulative and total sums are two
    frames over one window on the collapsed table."""
    from ghcn_d_etl_project_spark.operators.quality import weighted_median

    return weighted_median(
        t(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        "l_extendedprice",
        "l_quantity",
    )


# ---------------------------------------------------------------------------
# Winsorized / trimmed mean (r10): bounded-influence robust metrics
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH b AS (
  SELECT o_orderpriority AS g,
         ROUND(quantile_cont(o_totalprice, 0.05), 6) AS lo,
         ROUND(quantile_cont(o_totalprice, 0.95), 6) AS hi
  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
), j AS (
  SELECT o.o_orderpriority AS g, o.o_totalprice AS v, b.lo, b.hi
  FROM orders o JOIN b ON o.o_orderpriority = b.g
  WHERE o.o_totalprice IS NOT NULL
)
SELECT g AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(v AS DECIMAL(24,2))) AS DOUBLE) / COUNT(*), 6)
         AS mean_value,
       ROUND(CAST(SUM(CAST(LEAST(GREATEST(v, lo), hi) AS DECIMAL(24,2)))
                  AS DOUBLE) / COUNT(*), 6) AS winsorized_mean,
       CASE WHEN COUNT(CASE WHEN v >= lo AND v <= hi THEN 1 END) > 0 THEN
         ROUND(CAST(SUM(CASE WHEN v >= lo AND v <= hi
                             THEN CAST(v AS DECIMAL(24,2)) END) AS DOUBLE)
               / CAST(COUNT(CASE WHEN v >= lo AND v <= hi THEN 1 END)
                      AS DOUBLE), 6) END AS trimmed_mean,
       CAST(COUNT(CASE WHEN v < lo THEN 1 END) AS BIGINT) AS n_clamped_lo,
       CAST(COUNT(CASE WHEN v > hi THEN 1 END) AS BIGINT) AS n_clamped_hi
FROM j GROUP BY 1
"""


@register(
    "winsorized_mean_orders",
    oracle=_WINSOR_ORACLE,
    tags=("quality", "stats", "robust"),
)
def winsorized_mean_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%/95% winsorized and trimmed mean order price per priority
    (``operators/quality.py:winsorized_mean``) — the bounded-influence
    metric family: one whale order moves the plain mean arbitrarily,
    the winsorized mean boundedly, the trimmed mean not at all. Bounds
    are per-group percentile aggregates broadcast back (fact never
    shuffles), ROUNDED before clamping so the clamp decision is
    engine-identical and the exact-DECIMAL means value-hash. Exact
    percentile here is the oracle anchor; ``exact=False`` routes the
    100 TB path through the mergeable percentile_approx sketch."""
    from ghcn_d_etl_project_spark.operators.quality import winsorized_mean

    return winsorized_mean(
        t(spark, sf_dir, "orders"),
        "o_totalprice",
        group_cols=["o_orderpriority"],
    )
