"""Join + set-operation queries (SURVEY.md §2.4, §2.8).

J1 broadcast dimension enrichment, J2 aggregate-enrichment (anomaly
pattern), semi/anti joins and exceptAll for lineage reconciliation (the
distributed fix for the reference's driver-side set diffs), union append,
and a multi-join star query as the bench headline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.joins import aggregate_enrich, enrich
from ghcn_d_etl_project_spark.plans._util import count_if, davg, dsum, t
from ghcn_d_etl_project_spark.plans.registry import register

# ---------------------------------------------------------------------------
# J1: broadcast dim enrichment (customer -> nation -> region)
# ---------------------------------------------------------------------------

_DIM_ENRICH_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
       n.n_name AS nation_name, r.r_name AS region_name
FROM customer c
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@register(
    "dim_enrich_join",
    oracle=_DIM_ENRICH_ORACLE,
    tags=("join",),
    late=True,  # r11 rotation: 7 rounds green in the hard window
)
def dim_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop broadcast dimension enrichment (J1): the reference's
    stations join (``silver_processor.py:116-119``) generalized. Both dims
    broadcast — the fact side never shuffles."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation_name"), "n_regionkey"
    )
    r = t(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region_name")
    )
    out = enrich(c, n, on=[c.c_nationkey == n.n_nationkey])
    out = enrich(out, r, on=[out.n_regionkey == r.r_regionkey])
    return out.select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment", "nation_name", "region_name"
    )


# ---------------------------------------------------------------------------
# J2: aggregate-enrichment / anomaly-vs-group-normal pattern
# ---------------------------------------------------------------------------

_ANOMALY_ORACLE = """
WITH normals AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2))) AS DOUBLE) / COUNT(o_totalprice)
           AS cust_avg_price,
         CAST(COUNT(*) AS BIGINT) AS cust_n_orders
  FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
       n.cust_avg_price, n.cust_n_orders,
       o.o_totalprice - n.cust_avg_price AS price_anomaly
FROM orders o
LEFT JOIN normals n ON o.o_custkey = n.o_custkey
"""


@register("agg_enrich_anomaly", oracle=_ANOMALY_ORACLE, tags=("join",), bench=True, late=True)
def agg_enrich_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-enrichment (J2): join per-customer normals back onto each
    order and compute the deviation — the reference's monthly-normals
    anomaly pattern (``gold_processor.py:211-225``). The normals side is
    broadcast back (one row per key)."""
    o = t(spark, sf_dir, "orders")
    out = aggregate_enrich(
        o,
        keys=["o_custkey"],
        aggs=[
            davg("o_totalprice").alias("cust_avg_price"),
            F.count(F.lit(1)).alias("cust_n_orders"),
        ],
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "cust_avg_price",
        "cust_n_orders",
        (F.col("o_totalprice") - F.col("cust_avg_price")).alias("price_anomaly"),
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS) + exceptAll reconciliation (U2)
# ---------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


@register("semi_join", oracle=_SEMI_ORACLE, tags=("join",), late=True)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join = EXISTS: customers having at least one big order.
    SURVEY §2.4 notes the reference lacks semi/anti but needs them for its
    reconciliation checks."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@register("anti_join", oracle=_ANTI_ORACLE, tags=("join",), late=True)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join = NOT EXISTS: customers with no orders — the
    distributed replacement for the reference's driver-side station-set
    diff (U2, ``05_data_validation.py:183-187``)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


_EXCEPT_ORACLE = """
SELECT c_custkey AS key FROM customer
EXCEPT
SELECT o_custkey FROM orders
"""


@register("except_recon", oracle=_EXCEPT_ORACLE, tags=("join", "setop"), late=True)
def except_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) set reconciliation: customer keys never seen in
    orders. Same answer as anti_join but via the set-operator plan."""
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    return c.exceptAll(o.distinct()).distinct()


_UNION_ORACLE = """
SELECT o_orderkey, o_totalprice, 'high' AS tier FROM orders WHERE o_totalprice > 250000
UNION ALL
SELECT o_orderkey, o_totalprice, 'low' AS tier FROM orders WHERE o_totalprice < 50000
"""


@register("union_append", oracle=_UNION_ORACLE, tags=("setop",), late=True)
def union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union append (U1) — ``unionByName`` of tagged
    slices; the scale-safe form of the reference's 913-way union loop
    (``bronze_processor.py:35-38``), which is instead ONE multi-path scan
    in this engine's sources."""
    o = t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 250000).select(
        "o_orderkey", "o_totalprice", F.lit("high").alias("tier")
    )
    lo = o.filter(F.col("o_totalprice") < 50000).select(
        "o_orderkey", "o_totalprice", F.lit("low").alias("tier")
    )
    return hi.unionByName(lo)


# ---------------------------------------------------------------------------
# Bench headline: 5-table star join with agg (TPC-H Q5 shape)
# ---------------------------------------------------------------------------

_STAR_ORACLE = """
SELECT r.r_name AS region_name,
       CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, year(o.o_orderdate)
"""


@register("star_join_revenue", oracle=_STAR_ORACLE, tags=("join", "agg"), bench=True,
          late=True)  # r13 rotation: 12-round green, demoted to sim coverage
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join + aggregate (TPC-H Q5 shape): revenue by region
    and year. customer/nation/region broadcast; lineitem-orders is the one
    real shuffle join — at 100 TB both sides hash-partition on orderkey
    and AQE handles skew."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = t(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region_name")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(
        "region_name", F.year("o_orderdate").cast("long").alias("order_year")
    ).agg(
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
        count_if(F.col("l_returnflag") == "R").alias("n_returned"),
    )


# ---------------------------------------------------------------------------
# Temporal joins (extension): as-of and range — operators Spark lacks,
# composed from shuffle-friendly primitives (operators/joins.py)
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
SELECT l.event_id, l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       CAST(epoch_us(l.ts) AS BIGINT) AS ts_epoch_us,
       strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       r.event_id AS purchase_event_id,
       r.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


@register(
    "asof_join_events",
    oracle=_ASOF_ORACLE,
    tags=("join", "temporal"),
    bench=True,
    late=True,  # r11 rotation: 7 rounds green in the hard window
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each error event picks the latest preceding
    purchase by the same user. Implemented as the union-and-fill pattern
    (one shuffle + per-key sort, linear — no range explosion); the oracle
    is DuckDB's native ASOF JOIN.

    ``ts_epoch_us`` is the timestamp-drift tripwire (round-4 postmortem):
    an ABSOLUTE ``unix_micros`` value, unlike the tz-invariant epoch
    DIFFERENCES elsewhere in the oracle set, hash-mismatches the moment
    the loader mis-normalizes a new physical timestamp encoding or the
    session timezone unpins from UTC — the drift class that silently
    passed 49/50 in round 4 now turns a row red by name."""
    from ghcn_d_etl_project_spark.operators.joins import asof_join

    e = t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error")
    purchases = e.filter(F.col("event_type") == "purchase")
    joined = asof_join(
        errors, purchases, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["ts", "event_id", "value"],
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", fmt).alias("ts"),
        F.unix_micros(F.col("ts")).alias("ts_epoch_us"),
        F.date_format("asof_ts", fmt).alias("purchase_ts"),
        F.col("asof_event_id").alias("purchase_event_id"),
        F.col("asof_value").alias("purchase_value"),
    )


_RANGE_JOIN_ORACLE = """
SELECT a.user_id, a.event_id AS id1, b.event_id AS id2,
       strftime(a.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts1,
       strftime(b.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts2,
       CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS gap_micros
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 300000000
 AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
"""


@register("range_join_events", oracle=_RANGE_JOIN_ORACLE, tags=("join", "temporal"), bench=True,
          late=True)  # r13 rotation: 12-round green, demoted to sim coverage
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-key temporal range join: ordered same-user event pairs at
    most 5 minutes apart, via gap-width timestamp bucketing (each probe
    hits exactly 2 buckets) so the theta condition becomes an equi-join
    plus post-filter; the oracle is DuckDB's native inequality join."""
    from ghcn_d_etl_project_spark.operators.joins import range_join_pairs

    e = t(spark, sf_dir, "events")
    pairs = range_join_pairs(e, key="user_id", ts_col="ts", id_col="event_id",
                             max_gap_seconds=300)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return pairs.select(
        "user_id",
        "id1",
        "id2",
        F.date_format("ts1", fmt).alias("ts1"),
        F.date_format("ts2", fmt).alias("ts2"),
        F.col("gap_micros").cast("long").alias("gap_micros"),
    )


# ---------------------------------------------------------------------------
# Skewed-join posture (extension): hot fact key joined via salt-and-explode
# ---------------------------------------------------------------------------

_SKEW_JOIN_ORACLE = """
WITH f AS (
  SELECT CASE WHEN l_orderkey % 10 < 9 THEN 1
              ELSE 1 + (l_suppkey % 50) END AS skew_key,
         l_extendedprice, l_discount
  FROM lineitem
)
SELECT CAST(s.s_suppkey AS BIGINT) AS supp_key,
       s.s_name AS supp_name,
       CAST(SUM(CAST(f.l_extendedprice * (1 - f.l_discount) AS DECIMAL(24,6)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM f JOIN supplier s ON f.skew_key = s.s_suppkey
GROUP BY s.s_suppkey, s.s_name
"""


@register(
    "skew_salted_join",
    oracle=_SKEW_JOIN_ORACLE,
    tags=("join", "skew"),
    late=True,
    bench=True,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key JOIN survival (SURVEY §7.4.3): ~90% of lineitem rows are
    remapped onto ONE supplier key, then joined to supplier via
    ``salted_join`` — fact rows take a uniform salt, the dim is
    replicated per salt, and the join runs on (key, salt) so the whale
    key spreads over 16 reducers instead of funneling through one. The
    oracle is the plain unsalted join: salting changes only the shuffle
    shape, never the result. The plan shape (shuffled join keyed on the
    salt, no broadcast) is pinned in tests/test_plans.py."""
    from ghcn_d_etl_project_spark.operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(1))
        .otherwise(1 + F.col("l_suppkey") % 50)
        .alias("skew_key"),
        "l_extendedprice",
        "l_discount",
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = salted_join(li, s, "skew_key", "s_suppkey", n_salts=16)
    return joined.groupBy(
        F.col("s_suppkey").cast("long").alias("supp_key"),
        F.col("s_name").alias("supp_name"),
    ).agg(
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# CDC merge-upsert (extension): apply a change batch onto a dim snapshot
# ---------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH latest AS (
  SELECT o_custkey AS c_custkey, o_totalprice AS new_bal,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
), src AS (
  SELECT c_custkey, new_bal, (c_custkey % 10 = 0) AS is_delete
  FROM latest WHERE rn = 1
  UNION ALL
  SELECT c_custkey + 100000 AS c_custkey, 100.0 AS new_bal, FALSE AS is_delete
  FROM latest WHERE rn = 1 AND c_custkey % 7 = 3
)
SELECT CAST(COALESCE(t.c_custkey, s.c_custkey) AS BIGINT) AS c_custkey,
       t.c_name AS c_name,
       CAST(t.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(CASE WHEN s.c_custkey IS NOT NULL THEN s.new_bal
                 ELSE t.c_acctbal END AS DOUBLE) AS c_acctbal,
       t.c_mktsegment AS c_mktsegment
FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
WHERE NOT (s.c_custkey IS NOT NULL AND s.is_delete)
"""


@register(
    "merge_upsert_customers",
    oracle=_MERGE_ORACLE,
    tags=("join", "cdc", "merge"),
    late=True,
    bench=True,
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on DataFrames (``operators/cdc.py``): a
    deterministic change batch — each customer's latest order re-prices
    their account balance; every 10th key is a delete; keys ``%7==3``
    re-appear shifted by 100000 as brand-new customers — applied onto the
    ``customer`` snapshot with the standard three-arm semantics
    (matched+flag → delete, matched → update, unmatched source → insert,
    unmatched target → carry). The oracle is the same merge written as a
    full-outer-join in SQL. At scale the change batch broadcasts and the
    snapshot is never shuffled — the operator leaves strategy to
    Catalyst/AQE on purpose."""
    from ghcn_d_etl_project_spark.operators.cdc import merge_upsert
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_totalprice").alias("new_bal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    changes = latest.select(
        "c_custkey", "new_bal", (F.col("c_custkey") % 10 == 0).alias("is_delete")
    ).unionByName(
        latest.filter(F.col("c_custkey") % 7 == 3).select(
            (F.col("c_custkey") + 100000).alias("c_custkey"),
            F.lit(100.0).alias("new_bal"),
            F.lit(False).alias("is_delete"),
        )
    )
    cust = t(spark, sf_dir, "customer")
    merged = merge_upsert(
        cust,
        changes,
        key="c_custkey",
        set_cols={"c_acctbal": "new_bal"},
        delete_col="is_delete",
    )
    return merged.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_name",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        "c_mktsegment",
    )


# ---------------------------------------------------------------------------
# SCD2 history application (extension): close/open dimension history rows
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH latest AS (
  SELECT o_custkey, o_totalprice, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
), ch AS (
  SELECT l.o_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment,
         l.o_totalprice AS c_acctbal, l.o_orderdate AS eff
  FROM latest l LEFT JOIN customer c ON l.o_custkey = c.c_custkey
  WHERE l.rn = 1
)
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
       c.c_mktsegment AS c_mktsegment,
       c.c_acctbal AS c_acctbal,
       '2024-01-01 00:00:00' AS valid_from,
       CASE WHEN ch.c_custkey IS NOT NULL AND ch.c_acctbal <> c.c_acctbal
            THEN strftime(ch.eff, '%Y-%m-%d %H:%M:%S') ELSE NULL
       END AS valid_to
FROM customer c LEFT JOIN ch ON c.c_custkey = ch.c_custkey
UNION ALL
SELECT CAST(ch.c_custkey AS BIGINT) AS c_custkey,
       ch.c_mktsegment AS c_mktsegment,
       ch.c_acctbal AS c_acctbal,
       strftime(ch.eff, '%Y-%m-%d %H:%M:%S') AS valid_from,
       NULL AS valid_to
FROM ch LEFT JOIN customer c ON ch.c_custkey = c.c_custkey
WHERE c.c_custkey IS NULL OR ch.c_acctbal <> c.c_acctbal
"""


@register(
    "scd2_customers",
    oracle=_SCD2_ORACLE,
    tags=("join", "cdc", "scd2"),
    late=True,
    bench=True,
)
def scd2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history application (``operators/cdc.py:scd2_apply``): the
    customer snapshot becomes a one-current-row-per-key history (opened
    2024-01-01); each customer's latest order re-prices the balance at
    its order date. Rows whose balance actually changes are CLOSED at
    the change timestamp and a new current row opens; identical values
    are no-ops; keys appearing only in orders open fresh rows. The
    oracle writes the same close/open logic as two SQL join arms. The
    replace-in-place overwrite this upgrades is the reference's only
    dimension-maintenance strategy (``src/utils/spark_utils.py:38-40``).
    """
    from pyspark.sql import Window
    from ghcn_d_etl_project_spark.operators.cdc import scd2_apply

    cust = t(spark, sf_dir, "customer")
    history = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        o.select("o_custkey", "o_totalprice", "o_orderdate",
                 F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    changes = latest.join(
        cust.select("c_custkey", "c_mktsegment"),
        latest.o_custkey == cust.c_custkey,
        "left",
    ).select(
        F.col("o_custkey").alias("c_custkey"),
        "c_mktsegment",
        F.col("o_totalprice").alias("c_acctbal"),
        F.col("o_orderdate").alias("eff_ts"),
    )
    out = scd2_apply(
        history,
        changes,
        key="c_custkey",
        attrs=["c_mktsegment", "c_acctbal"],
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return out.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
    )


# ---------------------------------------------------------------------------
# Snapshot diff (extension): two snapshot versions -> CDC change set
# ---------------------------------------------------------------------------

_DIFF_ORACLE = """
WITH neww AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 7 = 3 THEN c_acctbal + 1000
              ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 10 <> 0
  UNION ALL
  SELECT c_custkey + 200000, 'NEW ' || c_name,
         CAST(100.0 AS DOUBLE), c_mktsegment
  FROM customer WHERE c_custkey % 13 = 5
), oldd AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
), j AS (
  SELECT o.c_custkey AS ok, n.c_custkey AS nk,
         o.c_name AS o_name, n.c_name AS n_name,
         o.c_acctbal AS o_bal, n.c_acctbal AS n_bal,
         o.c_mktsegment AS o_seg, n.c_mktsegment AS n_seg,
         CASE WHEN o.c_custkey IS NULL THEN 'I'
              WHEN n.c_custkey IS NULL THEN 'D'
              WHEN o.c_name IS DISTINCT FROM n.c_name
                OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
                OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment THEN 'U'
         END AS op
  FROM oldd o FULL OUTER JOIN neww n ON o.c_custkey = n.c_custkey
)
SELECT CAST(COALESCE(ok, nk) AS BIGINT) AS c_custkey, op,
       CASE WHEN op = 'D' THEN o_name ELSE n_name END AS c_name,
       CASE WHEN op = 'D' THEN o_bal ELSE n_bal END AS c_acctbal,
       CASE WHEN op = 'D' THEN o_seg ELSE n_seg END AS c_mktsegment
FROM j WHERE op IS NOT NULL
"""


@register(
    "snapshot_diff_customers",
    oracle=_DIFF_ORACLE,
    tags=("join", "cdc", "diff"),
    late=True,
    bench=True,
)
def snapshot_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (``operators/cdc.py:snapshot_diff``) — the inverse
    of MERGE, i.e. the change-data-feed a table format derives: two
    versions of the customer snapshot (every 10th key deleted, keys
    %7==3 re-priced +1000, keys %13==5 re-inserted shifted by 200000)
    are diffed into one I/U/D row per differing key, null-safe on every
    tracked attribute, identical rows absent. The round-trip law —
    ``merge_upsert(old, diff(old, new)) == new`` — is property-tested in
    ``tests/test_cdc.py``. The oracle constructs the same second version
    and writes the diff as a full-outer join in SQL."""
    from ghcn_d_etl_project_spark.operators.cdc import snapshot_diff

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    new = cust.filter(F.col("c_custkey") % 10 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 7 == 3, F.col("c_acctbal") + 1000
        ).otherwise(F.col("c_acctbal")),
    ).unionByName(
        cust.filter(F.col("c_custkey") % 13 == 5).select(
            (F.col("c_custkey") + 200000).alias("c_custkey"),
            F.concat(F.lit("NEW "), F.col("c_name")).alias("c_name"),
            F.lit(100.0).alias("c_acctbal"),
            "c_mktsegment",
        )
    )
    out = snapshot_diff(cust, new, key="c_custkey")
    return out.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "op",
        "c_name",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        "c_mktsegment",
    )


# ---------------------------------------------------------------------------
# Edit-distance record linkage (extension, r8): symmetric-delete blocking
# ---------------------------------------------------------------------------

_FUZZY_ORACLE = """
SELECT CAST(a.c_custkey AS BIGINT) AS id_a,
       CAST(b.c_custkey AS BIGINT) AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a
JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) <= 1
"""


@register(
    "fuzzy_name_pairs",
    oracle=_FUZZY_ORACLE,
    tags=("join", "linkage"),
    late=True,  # r13 rotation: 4-round green, demoted to sim coverage
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 record linkage over customer names
    (``operators/linkage.py:fuzzy_pairs``): symmetric-delete blocking —
    each name emits its 1-deletion neighborhood, candidates come from a
    plain variant EQUI-JOIN (provably complete for ed <= 1 by the
    pigeonhole argument in the module docstring), exact JVM-side
    levenshtein verifies last. The oracle is deliberately the
    brute-force N^2 formulation this operator exists to avoid — the
    completeness proof is what makes the two hash-match. Variant
    equi-join + one pair-dedup exchange, explode factor len+1, no
    cartesian product."""
    from ghcn_d_etl_project_spark.operators.linkage import fuzzy_pairs

    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    out = fuzzy_pairs(c, "c_custkey", "c_name")
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "dist",
    )
