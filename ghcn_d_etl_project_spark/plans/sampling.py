"""Sampling and sketching queries — training-data-pipeline staples the
reference lacks (its only sampling is display limits, SURVEY.md §2.7).

Both are engine-specific by nature (Bernoulli draws from Spark's seeded
XORShift; HLL++ sketch registers), so they register rows-only and get
their statistical contracts verified in tests/test_sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.plans._util import t
from ghcn_d_etl_project_spark.plans.registry import register

STRATA_FRACTIONS = {"en": 0.5, "es": 0.5, "fr": 0.5, "de": 0.5, "zh": 0.1}


@register("approx_distinct", oracle=None, tags=("sampling", "sketch"))
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type, with the
    exact count alongside. At 100 TB the sketch is the only affordable
    option for high-cardinality keys: fixed-size registers merge
    associatively (map-side partials), vs exact distinct's full shuffle
    of every key. rsd=0.01 ≈ 1% standard error."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


_SPLIT_ORACLE = """
WITH b AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS INTEGER) % 100 AS bucket,
         CAST(concat('0x', substr(md5(concat(coalesce(CAST(doc_id AS VARCHAR), ''), ':sample')), 1, 4))
              AS INTEGER) % 100 AS sbucket
  FROM documents
)
SELECT doc_id, lang, CAST(bucket AS BIGINT) AS bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(sbucket < CASE lang WHEN 'en' THEN 50 WHEN 'es' THEN 50
                                WHEN 'fr' THEN 50 WHEN 'de' THEN 50
                                WHEN 'zh' THEN 10 ELSE 0 END
            AS BIGINT) AS sampled
FROM b
"""


@register("dataset_split", oracle=_SPLIT_ORACLE, tags=("sampling", "split"), late=True)
def dataset_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment
    (``operators/common.py:hash_split_bucket``) + per-stratum sampling
    keep-flag (``stratified_keep``, fractions from STRATA_FRACTIONS;
    merged from round 2's sampleBy-based ``stratified_sample`` — now
    md5-threshold, so it's reproducible on ANY engine). Both columns are
    md5-derived from doc_id (the sample bucket salted so the two
    decisions are uncorrelated): the SAME row gets the SAME split and
    sample fate on any engine, partitioning, or re-run — unlike
    randomSplit/sampleBy (partition-order / Spark-RNG-sensitive). Pure
    projection, no shuffle; the DuckDB oracle reproduces both
    assignments bit-for-bit."""
    from ghcn_d_etl_project_spark.operators.common import (
        dataset_split,
        hash_split_bucket,
        stratified_keep,
    )

    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        hash_split_bucket("doc_id").alias("bucket"),
        dataset_split("doc_id").alias("split"),
        stratified_keep("doc_id", "lang", STRATA_FRACTIONS).alias("sampled"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (extension): Efraimidis-Spirakis
# ---------------------------------------------------------------------------

_WEIGHTED_ORACLE = """
WITH keyed AS (
  SELECT doc_id, lang,
         GREATEST(length(text), 1) AS w,
         ln((CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
                                                 ':espick')), 1, 13))
                  AS BIGINT) + 0.5) / 4503599627370496.0)
           / GREATEST(length(text), 1) AS es_key
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       lang,
       CAST(w AS BIGINT) AS w,
       round(es_key, 6) AS es_key
FROM keyed
ORDER BY es_key DESC, doc_id
LIMIT 200
"""


@register(
    "weighted_sample",
    oracle=_WEIGHTED_ORACLE,
    tags=("sampling", "weighted"),
    late=True,
)
def weighted_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement
    (``operators/common.py:weighted_top_k``): 200 documents drawn with
    probability proportional to text length via the Efraimidis-Spirakis
    top-k-by-``ln(u)/w`` construction, ``u`` being the engine-portable
    md5-derived uniform (the data-mixing primitive: upweight long/high-
    quality docs reproducibly on any engine). Plans
    TakeOrderedAndProject — per-task top-k, no global sort shuffle. The
    DuckDB oracle reproduces the identical keys and selection."""
    from ghcn_d_etl_project_spark.operators.common import weighted_top_k

    d = t(spark, sf_dir, "documents")
    out = weighted_top_k(
        d.select(
            "doc_id",
            "lang",
            F.greatest(F.length("text"), F.lit(1)).alias("w"),
        ),
        id_col="doc_id",
        weight_col="w",
        k=200,
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.col("w").cast("long").alias("w"),
        F.round("es_key", 6).alias("es_key"),
    )


# ---------------------------------------------------------------------------
# Leakage-safe split (extension): split keyed on CONTENT, not id — exact
# and formatting-only duplicates can never straddle train/test
# ---------------------------------------------------------------------------

_LEAKAGE_SPLIT_ORACLE = r"""
WITH f AS (
  SELECT doc_id, lang,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                                 '\s+', ' ', 'g'))) AS fp
  FROM documents
),
b AS (
  SELECT doc_id, lang, fp,
         CAST(concat('0x', substr(md5(fp), 1, 4)) AS INTEGER) % 100 AS bucket
  FROM f
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, fp,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS n_dups
FROM b
"""


@register(
    "leakage_safe_split",
    oracle=_LEAKAGE_SPLIT_ORACLE,
    tags=("sampling", "split", "dedup"),
    late=True,
)
def leakage_safe_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment keyed on the CONTENT fingerprint instead
    of the row id: ``dataset_split(fingerprint(text))``. An id-keyed
    split hashes each copy of a duplicated document independently, so
    ~28% of dup groups straddle splits under 80/10/10 — silent
    train-test contamination; hashing the fingerprint sends every exact
    or formatting-only copy to the same side by construction (pinned on
    planted dups in tests/test_sampling.py, including a demonstration
    that the id-keyed split DOES straddle the same fixture). ``n_dups``
    (one window on fp — the only shuffle; the split itself is a pure
    projection) sizes each group for audit. For NEAR-duplicate safety,
    key the same primitive on the dedup cluster representative instead
    (``dedup_clusters``'s keep-min id) — hash-defined, so that
    composition is pytest-checked rather than oracle-checked."""
    from ghcn_d_etl_project_spark.operators.common import dataset_split
    from ghcn_d_etl_project_spark.operators.textops import fingerprint
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    fp = fingerprint("text").alias("fp")
    return (
        d.select(F.col("doc_id").cast("long").alias("doc_id"), "lang", fp)
        .withColumn("split", dataset_split("fp"))
        .withColumn(
            "n_dups", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding
# ---------------------------------------------------------------------------

_TE_LOO_ORACLE = """
WITH s AS (
  SELECT o_orderpriority AS cat,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2))) AS DOUBLE) AS st,
         COUNT(o_totalprice) AS cnt
  FROM orders GROUP BY 1
)
SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       o.o_orderpriority,
       o.o_totalprice,
       ROUND(CASE WHEN o.o_totalprice IS NULL THEN st / cnt
                  WHEN cnt > 1 THEN (st - o.o_totalprice) / (cnt - 1)
             END, 6) AS te_loo
FROM orders o JOIN s ON o.o_orderpriority = s.cat
"""


@register(
    "target_encode_orders",
    oracle=_TE_LOO_ORACLE,
    tags=("sampling", "encoding", "ml"),
    late=True,  # r13 rotation: 4-round green, demoted to sim coverage
)
def target_encode_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    value (``operators/encoding.py:target_encode_loo``): the leakage-
    safe mean encoding every tabular trainer wants. One category-grain
    hash aggregate (map-side partials) + a broadcast join back — the
    fact never shuffles, vs the window formulation's full sort on a
    skewed low-cardinality key. Exact DECIMAL category sums make the
    per-row subtraction engine-reproducible."""
    from ghcn_d_etl_project_spark.operators.encoding import target_encode_loo

    return target_encode_loo(
        t(spark, sf_dir, "orders").select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_orderpriority",
            "o_totalprice",
        ),
        cat_col="o_orderpriority",
        target_col="o_totalprice",
    ).select("o_orderkey", "o_orderpriority", "o_totalprice", "te_loo")


# ---------------------------------------------------------------------------
# Global percentile features without a global sort
# ---------------------------------------------------------------------------

_PCTRANK_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_totalprice,
       ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice), 6) AS pct_rank,
       ROUND(CUME_DIST() OVER (ORDER BY o_totalprice), 6) AS cume_dist
FROM orders
"""


@register(
    "percentile_feature_orders",
    oracle=_PCTRANK_ORACLE,
    tags=("sampling", "encoding", "ml"),
    late=True,
)
def percentile_feature_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global percent_rank + cume_dist of order value for every order
    (``operators/encoding.py:percentile_features``): quantile
    normalization computed by COUNTING instead of ORDERING — distinct-
    value counts, one bucketed global_cumsum prefix, broadcast total,
    equi-join back. The oracle is deliberately the single-partition
    window formulation this construction replaces; the numbers are
    identical because both reduce to integer ratios below/(N-1) and
    cum/N."""
    from ghcn_d_etl_project_spark.operators.encoding import percentile_features

    return percentile_features(
        t(spark, sf_dir, "orders").select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_totalprice",
        ),
        "o_totalprice",
    ).select("o_orderkey", "o_totalprice", "pct_rank", "cume_dist")


# ---------------------------------------------------------------------------
# Group-wise standardization (z-score features)
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
WITH s AS (
  SELECT l_returnflag AS g,
         CAST(SUM(CAST(l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS sx_q,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,4))) AS DOUBLE)
           AS sxx_q,
         COUNT(l_quantity) AS n_q,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sx_p,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,4)))
              AS DOUBLE) AS sxx_p,
         COUNT(l_extendedprice) AS n_p
  FROM lineitem GROUP BY 1
)
SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey,
       CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
       l.l_returnflag, l.l_quantity, l.l_extendedprice,
       CASE WHEN s.n_q >= 2
             AND (s.sxx_q - s.sx_q * s.sx_q / s.n_q) / (s.n_q - 1) > 0
            THEN ROUND((l.l_quantity - s.sx_q / s.n_q)
                       / SQRT((s.sxx_q - s.sx_q * s.sx_q / s.n_q)
                              / (s.n_q - 1)), 6)
       END AS l_quantity_z,
       CASE WHEN s.n_p >= 2
             AND (s.sxx_p - s.sx_p * s.sx_p / s.n_p) / (s.n_p - 1) > 0
            THEN ROUND((l.l_extendedprice - s.sx_p / s.n_p)
                       / SQRT((s.sxx_p - s.sx_p * s.sx_p / s.n_p)
                              / (s.n_p - 1)), 6)
       END AS l_extendedprice_z
FROM lineitem l JOIN s ON l.l_returnflag = s.g
"""


@register(
    "zscore_lineitem",
    oracle=_ZSCORE_ORACLE,
    tags=("sampling", "encoding", "ml"),
    late=True,
)
def zscore_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise standardization of two lineitem measures per return
    flag (``operators/encoding.py:standardize``): both columns' exact
    DECIMAL moments in ONE group-grain aggregate, broadcast back, fact
    never shuffles. Degenerate groups (n < 2 or zero variance) yield
    NULL z rather than infinities."""
    from ghcn_d_etl_project_spark.operators.encoding import standardize

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_returnflag",
        "l_quantity",
        "l_extendedprice",
    )
    return standardize(
        li,
        ["l_quantity", "l_extendedprice"],
        group_cols=["l_returnflag"],
    )


# ---------------------------------------------------------------------------
# Feature hashing (extension, r9): the vocabulary-free encoder
# ---------------------------------------------------------------------------

_FEATURE_HASH_ORACLE = """
WITH base AS (
  SELECT o_orderkey,
         unnest(['o_orderstatus=' || o_orderstatus || ':fh',
                 'o_orderpriority=' || o_orderpriority || ':fh']) AS t
  FROM orders
),
grid AS (
  SELECT o_orderkey, j, t
  FROM base, UNNEST(generate_series(1, 16)) AS s(j)
),
vals AS (
  SELECT o_orderkey, j,
         SUM(CASE WHEN CAST(concat('0x', substr(md5(t), 1, 4)) AS INTEGER)
                       % 16 = j - 1
                  THEN CASE WHEN CAST(concat('0x', substr(md5(t), 5, 1))
                                 AS INTEGER) % 2 = 0
                            THEN 1.0 ELSE -1.0 END
                  ELSE 0.0 END)::DOUBLE AS v
  FROM grid GROUP BY 1, 2
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       array_to_string(list(CAST(v AS BIGINT) ORDER BY j), ',') AS features
FROM vals GROUP BY 1
"""


@register(
    "feature_hash_orders",
    oracle=_FEATURE_HASH_ORACLE,
    tags=("sampling", "ml", "encoding"),
    late=True,  # rotated out of hard window r14 (tenure since <=r10)
)
def feature_hash_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bucket hashing-trick features from the two categorical order
    columns (``operators/encoding.py:feature_hash``): col=value md5
    bucket + sign-bit parity, collisions sum, NULLs skip. ZERO
    shuffles — the vector is built per row with higher-order functions
    (transform + aggregate over a (bucket, sign) struct array), a pure
    projection that pipelines inside the scan stage at any scale. The
    md5 recipe is engine-portable, so the oracle restates the entire
    construction and the hash MATCH certifies it bit-for-bit. Weights
    are integers by construction, so the array is emitted as
    comma-joined BIGINTs — the house format-to-string convention for
    array-valued result columns (the driver comparator hashes arrays
    by engine-specific repr; see ``embedding_project``)."""
    from ghcn_d_etl_project_spark.operators.encoding import feature_hash

    out = feature_hash(
        t(spark, sf_dir, "orders"),
        "o_orderkey",
        ["o_orderstatus", "o_orderpriority"],
        n_buckets=16,
    )
    joined = F.concat_ws(
        ",", F.transform("features", lambda x: x.cast("long").cast("string"))
    )
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        joined.alias("features"),
    )


# ---------------------------------------------------------------------------
# Online (Poisson) bootstrap CI (r10): deterministic resampling-free CIs
# ---------------------------------------------------------------------------


def _bootstrap_oracle(replicates: int = 24, alpha: float = 0.05) -> str:
    """Generate the SQL twin of poisson_bootstrap_ci over order prices
    per priority. Built programmatically so the Poisson(1) CDF
    thresholds and the percentile-interpolation constants are the
    repr() of the EXACT double literals the Spark expression uses —
    the md5 recipe makes an approximate method value-hashable, but
    only if both engines state identical constants."""
    from ghcn_d_etl_project_spark.operators.common import POISSON1_CDF

    us = ",\n         ".join(
        "(CAST(concat('0x', substr(md5(concat(coalesce(CAST(o_orderkey AS "
        f"VARCHAR), ''), ':boot:{b}')), 1, 8)) AS BIGINT) / 4294967296.0) "
        f"AS u{b}"
        for b in range(replicates)
    )
    ws = ",\n         ".join(
        "("
        + " + ".join(
            f"(CASE WHEN u{b} >= {f!r} THEN 1 ELSE 0 END)"
            for f in POISSON1_CDF
        )
        + f") AS w{b}"
        for b in range(replicates)
    )
    sums = ",\n         ".join(
        f"SUM(w{b} * x) AS s{b}, SUM(w{b}) AS n{b}"
        for b in range(replicates)
    )
    means = ", ".join(
        f"CAST(s{b} AS DOUBLE) / CAST(n{b} AS DOUBLE)"
        for b in range(replicates)
    )
    least = ", ".join(f"n{b}" for b in range(replicates))

    def interp(p: float) -> str:
        i = p * (replicates - 1)
        lo, frac = int(i), i - int(i)
        if lo + 1 >= replicates:
            return f"arr[{lo + 1}]"
        return f"(arr[{lo + 1}] + (arr[{lo + 2}] - arr[{lo + 1}]) * {frac!r})"

    return f"""
WITH r AS (
  SELECT o_orderpriority AS g, CAST(o_totalprice AS DECIMAL(24,2)) AS x,
         {us}
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL
), w AS (
  SELECT g, x,
         {ws}
  FROM r
), s AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx,
         {sums}
  FROM w GROUP BY g
), f AS (
  SELECT g, n, sx, LEAST({least}) AS minn,
         list_sort(list_value({means})) AS arr
  FROM s
)
SELECT g AS o_orderpriority, n,
       ROUND(CAST(sx AS DOUBLE) / n, 6) AS point_est,
       CASE WHEN minn > 0 THEN ROUND({interp(alpha / 2)}, 6) END AS ci_lo,
       CASE WHEN minn > 0 THEN ROUND({interp(1 - alpha / 2)}, 6) END AS ci_hi,
       CAST({replicates} AS BIGINT) AS replicates
FROM f
"""


@register(
    "bootstrap_ci_orders",
    oracle=_bootstrap_oracle(),
    tags=("sampling", "stats", "experiment"),
    late=True,
)
def bootstrap_ci_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% percentile-bootstrap CI for mean order price per priority
    (``operators/common.py:poisson_bootstrap_ci``): the ONLINE Poisson
    bootstrap [Chamandy et al. 2012] — each row joins replicate b with
    a deterministic md5-derived Poisson(1) weight, so the whole
    B-replicate bootstrap is ONE groupBy with 2B+2 map-side-combined
    aggregates and ZERO resampling passes (a classical bootstrap at
    100 TB is B full shuffles). The md5 recipe makes a RESAMPLING
    method value-hashable: the oracle replays the identical draws,
    sums, sort and interpolation in SQL."""
    from ghcn_d_etl_project_spark.operators.common import poisson_bootstrap_ci

    return poisson_bootstrap_ci(
        t(spark, sf_dir, "orders"),
        "o_totalprice",
        "o_orderkey",
        group_cols=["o_orderpriority"],
    )


# ---------------------------------------------------------------------------
# Temperature-smoothed domain mixing (r10): the pre-training data mix
# ---------------------------------------------------------------------------

_MIX_ORACLE = """
WITH base AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS w
  FROM documents
  WHERE lang IS NOT NULL AND n_chars IS NOT NULL AND doc_id IS NOT NULL
), d AS (
  SELECT lang, SUM(w) AS c FROM base GROUP BY 1
), t AS (
  SELECT lang, c,
         CAST(POW(CAST(c AS DOUBLE), 0.5) AS DECIMAL(28,12)) AS term
  FROM d
), tot AS (
  SELECT SUM(term) AS tt FROM t
), p AS (
  SELECT lang, c,
         CAST(term AS DOUBLE) / CAST(tt AS DOUBLE) AS share,
         LEAST(1.0, (CAST(term AS DOUBLE) / CAST(tt AS DOUBLE)) * 60000.0
                    / CAST(c AS DOUBLE)) AS rate
  FROM t, tot
), k AS (
  SELECT b.lang, b.w, p.share, p.rate,
         CASE WHEN (CAST(concat('0x', substr(md5(concat(
                      CAST(b.doc_id AS VARCHAR), ':mix')), 1, 8))
                    AS BIGINT) % 10000)
                   < CAST(FLOOR(p.rate * 10000) AS BIGINT)
              THEN 1 ELSE 0 END AS keep
  FROM base b JOIN p ON b.lang = p.lang
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS total_chars,
       ROUND(share, 6) AS mix_share,
       ROUND(rate, 6) AS rate,
       CAST(SUM(keep) AS BIGINT) AS kept_docs,
       CAST(SUM(w * keep) AS BIGINT) AS kept_chars
FROM k GROUP BY lang, share, rate
"""


@register(
    "temperature_mix_docs",
    oracle=_MIX_ORACLE,
    tags=("sampling", "llm", "mixing"),
)
def temperature_mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T=0.5 temperature mix of the document corpus by language toward
    a 60k-char budget (``operators/common.py:temperature_mix``) — the
    pre-training data-mix step that upsamples tail languages without
    drowning the head. One per-domain aggregate, DECIMAL-quantized
    smoothed terms (float sum order never leaks into the shares),
    broadcast rate plan, md5 keep decision per row with zero fact
    shuffle — and the deterministic draws are what let a SAMPLING
    policy carry a full value-hash oracle, kept counts and all."""
    from ghcn_d_etl_project_spark.operators.common import temperature_mix

    out = temperature_mix(
        t(spark, sf_dir, "documents"),
        "lang",
        "n_chars",
        "doc_id",
        target_total=60_000,
        temperature=0.5,
    )
    return out.groupBy(
        F.col("domain").alias("lang"), "mix_share", "rate"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("weight").cast("long").alias("total_chars"),
        F.sum("keep").cast("long").alias("kept_docs"),
        F.sum(F.col("weight") * F.col("keep")).cast("long").alias(
            "kept_chars"
        ),
    ).select(
        "lang", "n_docs", "total_chars", "mix_share", "rate",
        "kept_docs", "kept_chars",
    )


# ---------------------------------------------------------------------------
# Effective sample size per domain under length weighting (r11)
# ---------------------------------------------------------------------------

_ESS_ORACLE = """
WITH d AS (
  SELECT lang, CAST(n_chars AS DECIMAL(38,0)) AS w
  FROM documents
  WHERE lang IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
),
per AS (
  SELECT lang, COUNT(*) AS n_docs, SUM(w) AS sw, SUM(w * w) AS sw2
  FROM d GROUP BY 1
)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(sw AS BIGINT) AS total_chars,
       round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE), 4)
         AS ess,
       round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE)
             / n_docs, 6) AS ess_ratio
FROM per
"""


@register(
    "ess_balance_docs",
    oracle=_ESS_ORACLE,
    tags=("sampling", "llm", "mixing"),
    late=True,  # new in r11
)
def ess_balance_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size per language under length (char)
    weighting: ESS = (sum w)^2 / sum(w^2) — the diagnostic that tells a
    mixing pipeline how many EFFECTIVE documents a domain contributes
    when examples are token-weighted (a domain of one giant doc has
    ESS ~ 1 however many bytes it brings; ess_ratio = ESS/n flags
    domains whose weight mass is concentrated). ONE map-side-combined
    aggregate; weights cast to DECIMAL(38,0) BEFORE squaring so the
    sums are exact at any corpus size (BIGINT w^2 wraps past ~3e9-char
    docs x many rows), division in double rounded on both engines."""
    d = t(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull()
        & F.col("n_chars").isNotNull()
        & (F.col("n_chars") > 0)
    )
    w = F.col("n_chars").cast("decimal(38,0)")
    per = d.select("lang", w.alias("w")).groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("w")).alias("sw2"),
    )
    swd = F.col("sw").cast("double")
    ess = swd * swd / F.col("sw2").cast("double")
    return per.select(
        "lang",
        "n_docs",
        F.col("sw").cast("long").alias("total_chars"),
        F.round(ess, 4).alias("ess"),
        F.round(ess / F.col("n_docs").cast("double"), 6).alias("ess_ratio"),
    )


# ---------------------------------------------------------------------------
# Epoch upsampling (r11): the duplication half of the data-mix contract
# ---------------------------------------------------------------------------

_EPOCH_ORACLE = """
WITH base AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS w
  FROM documents
  WHERE lang IS NOT NULL AND n_chars IS NOT NULL AND doc_id IS NOT NULL
), d AS (
  SELECT lang, SUM(w) AS c FROM base GROUP BY 1
), t AS (
  SELECT lang, c,
         CAST(POW(CAST(c AS DOUBLE), 0.5) AS DECIMAL(28,12)) AS term
  FROM d
), tot AS (
  SELECT SUM(term) AS tt FROM t
), p AS (
  SELECT lang,
         ROUND((CAST(term AS DOUBLE) / CAST(tt AS DOUBLE)) * 250000.0
               / CAST(c AS DOUBLE), 6) AS rate
  FROM t, tot
), j AS (
  SELECT b.doc_id, b.lang, p.rate,
         CAST(FLOOR(p.rate) AS BIGINT) AS n_full,
         CAST(FLOOR((p.rate - FLOOR(p.rate)) * 10000) AS BIGINT) AS thr,
         CAST(concat('0x', substr(md5(concat(CAST(b.doc_id AS VARCHAR),
                                             ':epoch')), 1, 8))
              AS BIGINT) % 10000 AS bucket
  FROM base b JOIN p USING (lang)
), e AS (
  SELECT doc_id, lang, rate,
         n_full + CASE WHEN bucket < thr THEN 1 ELSE 0 END AS n_copies
  FROM j
)
SELECT doc_id, lang, rate,
       CAST(n_copies AS BIGINT) AS n_copies,
       CAST(i AS BIGINT) AS copy_idx
FROM e, UNNEST(generate_series(1, n_copies)) s(i)
WHERE n_copies > 0
"""


@register(
    "epoch_upsample_docs",
    oracle=_EPOCH_ORACLE,
    tags=("sampling", "llm", "mixing"),
    # promoted to the 50-slot hard window in the r12 rotation
)
def epoch_upsample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-level corpus expansion under an UNCAPPED T=0.5 mix toward
    a 250k-char budget (``operators/common.py:epoch_upsample``): tail
    languages get rate > 1 — guaranteed floor(rate) epochs plus an
    md5-decided fractional epoch per doc — completing the data-mix
    contract temperature_mix deliberately halves (it never duplicates;
    this is the duplication side, salt-decorrelated from the mix's
    keep decision). Rates derive from the same DECIMAL-quantized
    smoothed terms as the mix (ROUNDED before the expansion decisions
    so both engines floor the identical double); expansion is a pure
    projection + explode — zero shuffles, fan-out exactly rate per
    row. Output grain = one row per epoch COPY."""
    from ghcn_d_etl_project_spark.operators.common import epoch_upsample

    base = t(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull()
        & F.col("n_chars").isNotNull()
        & F.col("doc_id").isNotNull()
    )
    per_dom = base.groupBy("lang").agg(
        F.sum(F.col("n_chars").cast("long")).cast("long").alias("__c")
    )
    term = F.pow(F.col("__c").cast("double"), F.lit(0.5)).cast(
        "decimal(28,12)"
    )
    terms = per_dom.select("lang", "__c", term.alias("__t"))
    total = terms.agg(F.sum("__t").alias("__tt"))
    rate = (
        F.col("__t").cast("double") / F.col("__tt").cast("double")
    ) * F.lit(250_000.0) / F.col("__c").cast("double")
    plan = terms.crossJoin(F.broadcast(total)).select(
        "lang", F.round(rate, 6).alias("rate")
    )
    joined = base.select("doc_id", "lang").join(F.broadcast(plan), "lang")
    out = epoch_upsample(joined, "doc_id", "rate", salt="epoch")
    return out.select(
        "doc_id",
        "lang",
        "rate",
        "n_copies",
        "copy_idx",
    )
