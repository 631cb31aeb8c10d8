"""Graph & mining extensions (round 8, wave 4): exact set-similarity
join, co-purchase graph analytics, RFM segmentation, negative sampling.

The affinity/mining family a retail- or training-corpus pipeline runs
after the curation queries: which baskets are near-identical (exact
similarity join — the lossless counterpart of the MinHash ladder), how
clustered the co-purchase graph is (triangles), which items are central
(PageRank), which customers matter (RFM), and which corpus rows make
good contrastive negatives. New queries register ``late=True`` until a
window rotation promotes them (VERDICT r6 discipline: graceful
degradation under a fixed driver correctness budget; the r10 rotation
promoted the r9 wave — gini/lorenz/bfs — into the hard window).

Oracle notes: every query here is engineered bit-exact cross-engine —
integer counts/ratios for the joins and triangles, FIXED-POINT integer
arithmetic for PageRank (see ``operators/graphalgo.py``), the
house round-to-6 integer-ratio recipe for RFM quantile scores, and the
md5 recipes shared with ``plans/sampling.py`` for negatives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.plans._util import dsum, t
from ghcn_d_etl_project_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Exact set-similarity join with prefix + length filtering (PPJoin-lite)
# ---------------------------------------------------------------------------

# The oracle is deliberately the BRUTE-FORCE shared-token formulation:
# prefix/length filtering is lossless, so a hash MATCH is a machine-
# checked completeness proof for the pruning rules.
_BASKET_JACCARD_ORACLE = """
WITH b AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS tok FROM lineitem),
sz AS (SELECT k, COUNT(*) AS n FROM b GROUP BY k),
inter AS (
  SELECT a.k AS k1, c.k AS k2, COUNT(*) AS n_common
  FROM b a JOIN b c ON a.tok = c.tok AND a.k < c.k
  GROUP BY 1, 2
)
SELECT CAST(i.k1 AS BIGINT) AS k1, CAST(i.k2 AS BIGINT) AS k2,
       CAST(s1.n AS BIGINT) AS n1, CAST(s2.n AS BIGINT) AS n2,
       CAST(i.n_common AS BIGINT) AS n_common,
       round(CAST(i.n_common AS DOUBLE) / (s1.n + s2.n - i.n_common), 6)
         AS jaccard
FROM inter i
JOIN sz s1 ON i.k1 = s1.k
JOIN sz s2 ON i.k2 = s2.k
WHERE CAST(i.n_common AS DOUBLE) / (s1.n + s2.n - i.n_common) >= 0.5
"""


@register(
    "basket_jaccard_pairs",
    oracle=_BASKET_JACCARD_ORACLE,
    tags=("mining", "dedup", "similarity", "persists"),
    late=True,  # rotated out of hard window r14 (tenure since <=r10)
)
def basket_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order pairs whose part-baskets have Jaccard >= 0.5, via the
    prefix-filtered exact set-similarity join
    (``operators/setjoin.py`` — PPJoin-lite: rarest-first prefix
    tokens bound the inverted-index self-join, the t-length band is
    checked inside the join condition, exact verification runs only on
    survivors). The oracle is the brute-force all-shared-token join the
    filters replace, so the MATCH doubles as the losslessness proof.
    Measured pruning at this SF (``candidate_reduction_report``): 894k
    brute candidates -> 353k at t=0.5 (2.5x; baskets of 1-13 tokens at
    a low threshold are near-worst-case — prefixes cover most of each
    set) and -> 51k at t=0.8 (17x; the filters sharpen exactly where a
    dedup pipeline runs them)."""
    from ghcn_d_etl_project_spark.operators.setjoin import (
        prefix_filtered_jaccard_join,
    )

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return prefix_filtered_jaccard_join(
        li, "l_orderkey", "l_partkey", threshold=0.5
    )


# ---------------------------------------------------------------------------
# Co-purchase graph: per-node triangle counts (degree orientation)
# ---------------------------------------------------------------------------

# Edge set shared by the two graph queries: parts co-purchased in >= 2
# distinct orders (weight filter keeps the graph sparse + meaningful).
_COPURCHASE_EDGES = """
  WITH bb AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem)
  SELECT a.p AS u, c.p AS v
  FROM bb a JOIN bb c ON a.k = c.k AND a.p < c.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""

_TRIANGLES_ORACLE = f"""
WITH e AS ({_COPURCHASE_EDGES}),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT CAST(node AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY 1
"""


@register(
    "copurchase_triangles",
    oracle=_TRIANGLES_ORACLE,
    tags=("mining", "graph", "persists"),
    late=True,  # rotated out of hard window r14 (tenure since <=r10)
)
def copurchase_triangles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph (parts
    sharing >= 2 orders), by degree-oriented wedge counting
    (``operators/graphalgo.py:triangle_counts``): edges oriented
    low-degree -> high-degree bound the wedge intermediate to
    sum(outdeg^2) with outdeg <= O(sqrt(m)) — hub-proof at 100 TB. The
    oracle counts ordered triples on the raw undirected edge list, so
    the MATCH also validates the orientation trick end-to-end."""
    from ghcn_d_etl_project_spark.operators.graphalgo import triangle_counts

    li = t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    a, c = b.alias("a"), b.alias("c")
    edges = (
        a.join(c, (F.col("a.k") == F.col("c.k")) & (F.col("a.p") < F.col("c.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("c.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
    )
    out = triangle_counts(edges, "u", "v")
    return out.select(F.col("node").cast("long").alias("node"), "n_triangles")


# ---------------------------------------------------------------------------
# Co-purchase graph: local clustering coefficient (r11)
# ---------------------------------------------------------------------------

_LCC_ORACLE = f"""
WITH e AS ({_COPURCHASE_EDGES}),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e
  ) GROUP BY 1
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
tcount AS (SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY 1)
SELECT CAST(d.node AS BIGINT) AS node, CAST(d.deg AS BIGINT) AS deg,
       CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.deg >= 2 THEN
         round(2.0 * CAST(COALESCE(t.n_triangles, 0) AS DOUBLE)
               / (CAST(d.deg AS DOUBLE) * (CAST(d.deg AS DOUBLE) - 1.0)), 6)
       ELSE 0.0 END AS lcc
FROM deg d LEFT JOIN tcount t USING (node)
"""


@register(
    "clustering_coeff_parts",
    oracle=_LCC_ORACLE,
    tags=("mining", "graph", "persists"),
    # promoted to the 50-slot hard window in the r12 rotation
)
def clustering_coeff_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient of every part in the co-purchase
    graph (``operators/graphalgo.py:clustering_coefficients``):
    2T/(deg*(deg-1)), zero-triangle nodes included — the per-node
    "how clique-like" readout that complements the raw triangle
    counts. One persisted canonical edge substrate feeds both the
    degree aggregate and the triangle core; the triangle close is the
    r11 canonical-key equi-join (no cartesian — the plan gate pins
    it)."""
    from ghcn_d_etl_project_spark.operators.graphalgo import (
        clustering_coefficients,
    )

    li = t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    a, c = b.alias("a"), b.alias("c")
    edges = (
        a.join(c, (F.col("a.k") == F.col("c.k")) & (F.col("a.p") < F.col("c.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("c.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
    )
    out = clustering_coefficients(edges, "u", "v")
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("deg").cast("long").alias("deg"),
        "n_triangles",
        "lcc",
    )


# ---------------------------------------------------------------------------
# Co-purchase graph: Adamic-Adar link prediction (r11)
# ---------------------------------------------------------------------------

_AA_ORACLE = f"""
WITH e AS ({_COPURCHASE_EDGES}),
dirs AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
deg AS (SELECT u AS w, COUNT(*) AS deg FROM dirs GROUP BY 1),
wfp AS (
  SELECT w, CAST(FLOOR(1000000000.0 / ln(CAST(deg AS DOUBLE))) AS BIGINT)
         AS inv_ln_fp
  FROM deg
),
wed AS (
  SELECT a.u AS w, a.v AS x, b.v AS y
  FROM dirs a JOIN dirs b ON a.u = b.u AND a.v < b.v
),
sc AS (
  SELECT x AS node1, y AS node2, COUNT(*) AS cn, SUM(inv_ln_fp) AS aa_fp
  FROM wed JOIN wfp USING (w) GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT CAST(node1 AS BIGINT) AS node1, CAST(node2 AS BIGINT) AS node2,
       CAST(cn AS BIGINT) AS common_neighbors,
       CAST(aa_fp AS BIGINT) AS aa_fp,
       CAST(aa_fp AS DOUBLE) / 1000000000.0 AS aa_score
FROM sc s
WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = s.node1 AND e.v = s.node2)
"""


@register(
    "adamic_adar_parts",
    oracle=_AA_ORACLE,
    tags=("mining", "graph", "persists"),
    # promoted to the 50-slot hard window in the r12 rotation
)
def adamic_adar_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the co-purchase graph
    (``operators/graphalgo.py:adamic_adar_scores``): non-adjacent part
    pairs with >= 2 common neighbors, scored by sum(1/ln(deg(w))) over
    common neighbors w — "which co-purchase edge forms next". The
    irrational per-neighbor weight is quantized ONCE at the node-sized
    degree table (floor(1e9/ln(deg)) BIGINT), so pair scores are exact
    integer sums — the PageRank fixed-point convention that lets a
    float-weighted graph score value-hash cross-engine. Adjacent pairs
    are removed by anti-join (the oracle states the NOT EXISTS the
    anti-join replaces)."""
    from ghcn_d_etl_project_spark.operators.graphalgo import adamic_adar_scores

    li = t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    a, c = b.alias("a"), b.alias("c")
    edges = (
        a.join(c, (F.col("a.k") == F.col("c.k")) & (F.col("a.p") < F.col("c.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("c.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
    )
    out = adamic_adar_scores(edges, "u", "v", min_common=2)
    return out.select(
        F.col("node1").cast("long").alias("node1"),
        F.col("node2").cast("long").alias("node2"),
        "common_neighbors",
        "aa_fp",
        "aa_score",
    )


# ---------------------------------------------------------------------------
# Co-purchase graph: deterministic fixed-point PageRank, 3 iterations
# ---------------------------------------------------------------------------

# Unrolled integer recursion — BIGINT micro-units, floor division — so
# the hash matches the Spark loop bit-for-bit (float PageRank could
# never be order-insensitively hashed; see operators/graphalgo.py).
_PAGERANK_ORACLE = f"""
WITH e AS ({_COPURCHASE_EDGES}),
d AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
deg AS (SELECT u, COUNT(*) AS deg FROM d GROUP BY u),
n AS (SELECT COUNT(*) AS nn FROM deg),
r0 AS (
  SELECT deg.u AS node, CAST(1000000000000 // nn AS BIGINT) AS rank_fp
  FROM deg, n
),
c1 AS (
  SELECT d.v AS node, SUM(r.rank_fp // deg.deg) AS m
  FROM d JOIN r0 r ON d.u = r.node JOIN deg ON d.u = deg.u GROUP BY 1
),
r1 AS (
  SELECT node,
         (1000000000000 * 15) // (100 * nn) + (85 * m) // 100 AS rank_fp
  FROM c1, n
),
c2 AS (
  SELECT d.v AS node, SUM(r.rank_fp // deg.deg) AS m
  FROM d JOIN r1 r ON d.u = r.node JOIN deg ON d.u = deg.u GROUP BY 1
),
r2 AS (
  SELECT node,
         (1000000000000 * 15) // (100 * nn) + (85 * m) // 100 AS rank_fp
  FROM c2, n
),
c3 AS (
  SELECT d.v AS node, SUM(r.rank_fp // deg.deg) AS m
  FROM d JOIN r2 r ON d.u = r.node JOIN deg ON d.u = deg.u GROUP BY 1
),
r3 AS (
  SELECT node,
         (1000000000000 * 15) // (100 * nn) + (85 * m) // 100 AS rank_fp
  FROM c3, n
)
SELECT CAST(node AS BIGINT) AS node,
       CAST(rank_fp AS BIGINT) AS rank_fp,
       CAST(rank_fp AS DOUBLE) / 1000000000000.0 AS rank
FROM r3
"""


@register(
    "pagerank_parts",
    oracle=_PAGERANK_ORACLE,
    tags=("mining", "graph", "persists"),
    late=True,  # rotated out of hard window r14 (tenure since <=r10)
)
def pagerank_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank (d=0.85) over the co-purchase part graph via
    deterministic FIXED-POINT integer arithmetic
    (``operators/graphalgo.py:pagerank_fixed_point``): ranks are BIGINT
    units of 1e-12 mass, contributions are exact floor divisions, sums
    are associative — bit-identical on any engine/partitioning, which
    is what lets an iterative algorithm carry a full value-hash oracle
    (the unrolled SQL recursion above) instead of a rows-only check."""
    from ghcn_d_etl_project_spark.operators.graphalgo import pagerank_fixed_point

    li = t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    a, c = b.alias("a"), b.alias("c")
    edges = (
        a.join(c, (F.col("a.k") == F.col("c.k")) & (F.col("a.p") < F.col("c.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("c.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
    )
    out = pagerank_fixed_point(edges, "u", "v", iters=3)
    return out.select(F.col("node").cast("long").alias("node"), "rank_fp", "rank")


# ---------------------------------------------------------------------------
# RFM customer segmentation — quantile scores by counting, not ordering
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH r AS (
  SELECT o_custkey AS custkey,
         date_diff('day', MAX(o_orderdate), (SELECT MAX(o_orderdate) FROM orders))
           AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY 1
),
s AS (
  SELECT custkey, recency_days, frequency, monetary,
         round(CUME_DIST() OVER (ORDER BY recency_days), 6) AS cr,
         round(CUME_DIST() OVER (ORDER BY frequency), 6) AS cf,
         round(CUME_DIST() OVER (ORDER BY monetary), 6) AS cm
  FROM r
)
SELECT CAST(custkey AS BIGINT) AS custkey,
       CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency,
       monetary,
       CAST(6 - CEIL(cr * 5) AS BIGINT) AS r_score,
       CAST(CEIL(cf * 5) AS BIGINT) AS f_score,
       CAST(CEIL(cm * 5) AS BIGINT) AS m_score,
       CAST(6 - CEIL(cr * 5) AS BIGINT) || CAST(CEIL(cf * 5) AS BIGINT)
         || CAST(CEIL(cm * 5) AS BIGINT) AS segment
FROM s
"""


@register(
    "rfm_segments",
    oracle=_RFM_ORACLE,
    tags=("mining", "analytics", "persists"),
    late=True,
)
def rfm_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order vs the
    corpus max date), frequency (order count), monetary (exact decimal
    revenue sum), each scored into quintiles by CUME_DIST — equal
    metric values share a score (tie-stable, unlike NTILE's arbitrary
    tie splitting) and the quantile is computed by the COUNTING recipe
    (``operators/encoding.py:percentile_value_map`` — distinct-value
    counts + bucketed global cumsum + broadcast total), never the
    ``Exchange SinglePartition`` global-sort window the oracle states.
    Score = ceil(5 * cume) (recency inverted: recent = 5).

    Plan shape (r12): each metric's value->cume map is built
    independently from the PERSISTED per-customer base and equi-joined
    on — the r11 form chained three full percentile passes, whose
    three-way self-references re-printed the upstream lineage into 86
    textual copies of the one-row total broadcast (analysis-time
    bloat; VERDICT r11 #2). The base persists WITHOUT any scalar
    broadcast inside (so cached-plan reprints stay BNLJ-free), ONE
    scalar aggregate row carries both N_total and the corpus max date
    into all three maps, and the recency map is keyed on the
    last-order DATE: cume_dist over recency ascending == the inverted
    cumulative count over __last ascending, (N - cum + n) / N, so
    recency never needs the max date attached at row grain. BNLJ
    occurrences: exactly 3 (one per map), identical numbers."""
    from ghcn_d_etl_project_spark.operators.prefix import global_cumsum

    o = t(spark, sf_dir, "orders")
    base = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("__last"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("o_totalprice").alias("monetary"),
        )
        # read by the 3 map builds + the shared totals + the join chain
        .persist()
    )
    totals = base.agg(
        F.count(F.lit(1)).alias("__N_total"),
        F.max("__last").alias("__maxd"),
    )
    big_n = F.col("__N_total").cast("double")

    def vmap(col: str, out_cols: list) -> DataFrame:
        per_val = base.groupBy(F.col(col).alias("__v")).agg(
            F.count(F.lit(1)).alias("__n")
        )
        order = "__v"
        if col == "__last":
            # DATE order key: the cumsum bucketer casts to double, so
            # order on exact epoch-days instead (same total order)
            per_val = per_val.withColumn(
                "__vd", F.datediff(F.col("__v"), F.lit("1970-01-01"))
            )
            order = "__vd"
        cums = global_cumsum(per_val, order, "__n", out_col="__cum")
        return cums.crossJoin(F.broadcast(totals)).select("__v", *out_cols)

    # recency: ties on recency_days == ties on __last (datediff with a
    # fixed max date is injective on dates), and ORDER BY recency asc
    # == ORDER BY __last desc, so the inclusive count is N - cum + n
    rmap = vmap("__last", [
        F.datediff(F.col("__maxd"), F.col("__v")).alias("recency_days"),
        F.round(
            (F.col("__N_total") - F.col("__cum") + F.col("__n")).cast("double")
            / big_n,
            6,
        ).alias("cr"),
    ])
    fmap = vmap("frequency", [
        F.round(F.col("__cum").cast("double") / big_n, 6).alias("cf")
    ])
    mmap = vmap("monetary", [
        F.round(F.col("__cum").cast("double") / big_n, 6).alias("cm")
    ])

    scored = base
    for m, key in ((rmap, "__last"), (fmap, "frequency"), (mmap, "monetary")):
        scored = scored.join(m, on=scored[key] == m["__v"], how="left").drop(
            "__v"
        )
    r_score = (F.lit(6) - F.ceil(F.col("cr") * 5)).cast("long")
    f_score = F.ceil(F.col("cf") * 5).cast("long")
    m_score = F.ceil(F.col("cm") * 5).cast("long")
    return scored.select(
        F.col("custkey").cast("long").alias("custkey"),
        F.col("recency_days").cast("long").alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        "monetary",
        r_score.alias("r_score"),
        f_score.alias("f_score"),
        m_score.alias("m_score"),
        F.concat(
            r_score.cast("string"), f_score.cast("string"), m_score.cast("string")
        ).alias("segment"),
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline): cheapest-and-largest parts per brand
# ---------------------------------------------------------------------------

# The oracle is the quadratic NOT EXISTS dominance join the operator
# replaces (BroadcastNestedLoopJoin death-mode in Spark) — the MATCH
# proves the sort-based distributed construction exact, ties and all.
_SKYLINE_ORACLE = """
SELECT CAST(p.p_partkey AS BIGINT) AS p_partkey, p.p_brand,
       p.p_retailprice, CAST(p.p_size AS BIGINT) AS p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_brand = p.p_brand
    AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""


@register(
    "skyline_parts",
    oracle=_SKYLINE_ORACLE,
    tags=("mining", "analytics"),
    late=True,  # rotated out of hard window r14 (tenure since <=r10)
)
def skyline_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto frontier of parts — cheapest-AND-largest: no
    other same-brand part is both <= on price and >= on size with one
    strict (``operators/skyline.py:pareto_frontier_2d``). Computed as
    the distributed sort-based construction — distinct-price collapse,
    exclusive running max of best-size, strict-improvement filter,
    broadcast join back — never the quadratic NOT EXISTS dominance join
    the oracle states (a non-equi self-join plans
    BroadcastNestedLoopJoin: the N^2 death-mode this operator exists to
    avoid)."""
    from ghcn_d_etl_project_spark.operators.skyline import pareto_frontier_2d

    p = t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        "p_brand",
        "p_retailprice",
        F.col("p_size").cast("long").alias("p_size"),
    )
    return pareto_frontier_2d(
        p, "p_retailprice", "p_size", group_cols=["p_brand"]
    )


# ---------------------------------------------------------------------------
# Deterministic contrastive negative sampling
# ---------------------------------------------------------------------------

_NEGATIVES_ORACLE = """
WITH ids AS (SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id IS NOT NULL),
h AS (
  SELECT id,
         CAST(concat('0x', substr(md5(concat(CAST(id AS VARCHAR), ':neg:b')), 1, 4))
              AS INTEGER) % 32 AS bucket,
         md5(concat(CAST(id AS VARCHAR), ':neg:d')) AS draw
  FROM ids
),
ranked AS (
  SELECT id, bucket, draw,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY draw, id) AS rn,
         COUNT(*) OVER (PARTITION BY bucket) AS bn
  FROM h
),
want AS (
  SELECT bucket, id AS anchor_id, j AS neg_rank,
         ((rn - 1 + j) % bn) + 1 AS neg_rn
  FROM ranked, UNNEST(generate_series(1, LEAST(3, bn - 1))) AS u(j)
)
SELECT CAST(w.anchor_id AS BIGINT) AS anchor_id,
       CAST(r.id AS BIGINT) AS neg_id,
       CAST(w.neg_rank AS BIGINT) AS neg_rank
FROM want w JOIN ranked r ON w.bucket = r.bucket AND w.neg_rn = r.rn
"""


@register(
    "negative_sample_docs",
    oracle=_NEGATIVES_ORACLE,
    tags=("mining", "sampling", "ml"),
    late=True,
)
def negative_sample_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three deterministic contrastive negatives per document
    (``operators/negatives.py:cyclic_negative_sample``): md5 buckets +
    within-bucket hash order + cyclic rank offsets — replayable on any
    engine, parallel windows only (the bucket bounds every partition;
    the global-row_number formulation this replaces is an
    ``Exchange SinglePartition`` at scale), and no candidate cross
    join ever exists."""
    from ghcn_d_etl_project_spark.operators.negatives import cyclic_negative_sample

    return cyclic_negative_sample(
        t(spark, sf_dir, "documents"), "doc_id", k=3, n_buckets=32
    )


# ---------------------------------------------------------------------------
# BFS hop distance (extension, r9): bounded reachability
# ---------------------------------------------------------------------------

# The oracle enumerates (node, dist<=4) pairs with a recursive CTE —
# UNION-dedup bounds it to 5 rows/node at oracle scale, but it is still
# the path-flavored formulation; the engine runs level-synchronous
# frontier BFS (per-level anti-join), so a MATCH cross-checks the two.
_BFS_ORACLE = f"""
WITH RECURSIVE e0 AS ({_COPURCHASE_EDGES}),
d AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
s AS (SELECT MIN(u) AS node FROM d),
w(node, dist) AS (
  SELECT node, 0 FROM s
  UNION
  SELECT d.v, w.dist + 1 FROM w JOIN d ON d.u = w.node WHERE w.dist < 4
)
SELECT CAST(node AS BIGINT) AS node, CAST(MIN(dist) AS BIGINT) AS dist
FROM w GROUP BY 1
"""


@register(
    "bfs_hops_parts",
    oracle=_BFS_ORACLE,
    tags=("mining", "graph", "persists"),
)
def bfs_hops_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance (<= 4) from the lowest-keyed part through the
    co-purchase graph (``operators/graphalgo.py:bfs_hops``):
    level-synchronous frontier BFS — per level ONE frontier-edge
    equi-join + ONE anti-join against the visited set, per-level
    persist with eager release, a bounded ``limit(1)`` empty-probe as
    the only driver action. The seed is computed IN PLAN (a 1-row MIN
    aggregate), no collect. The oracle's recursive CTE enumerates
    (node, dist) pairs instead — two formulations cross-check."""
    from ghcn_d_etl_project_spark.operators.graphalgo import bfs_hops

    li = t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    a, c = b.alias("a"), b.alias("c")
    edges = (
        a.join(c, (F.col("a.k") == F.col("c.k")) & (F.col("a.p") < F.col("c.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("c.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        # r14: materialize the edge derivation ONCE. Both the seed (a
        # 1-row MIN aggregate) and the BFS's doubled edge table consume
        # ``edges``; left lazy, the wedge self-join over lineitem ran
        # twice (once per consumer) — the derivation, not the BFS
        # levels, dominated the query. Eager localCheckpoint (the kcore
        # discipline) also keeps the checkpoint out of the CacheManager,
        # so repeated bench runs stay honestly cold.
        .localCheckpoint(eager=True)
    )
    sources = edges.select(
        F.least(F.min("u"), F.min("v")).alias("node")
    )
    out = bfs_hops(edges, "u", "v", sources, max_hops=4)
    return out.select(F.col("node").cast("long").alias("node"), "dist")


# ---------------------------------------------------------------------------
# k-core decomposition (extension, r9): cohesion filtering
# ---------------------------------------------------------------------------


_KCORE_ORACLE = """
WITH RECURSIVE
b AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
e0 AS (
  SELECT a.p AS u, c.p AS v
  FROM b a JOIN b c ON a.k = c.k AND a.p < c.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
-- peel round r+1 = round-r edges restricted to deg>=3 endpoints; the
-- recursive term fires only while a sub-3 node exists, so the LAST
-- emitted round is the fixpoint (DuckDB's recurring table holds only
-- the previous iteration's rows, which is exactly the current edge set)
peel AS (
  SELECT 0 AS r, u, v FROM e0
  UNION ALL
  SELECT e.r + 1, e.u, e.v
  FROM peel e
  JOIN (SELECT node FROM (SELECT u AS node FROM peel UNION ALL SELECT v FROM peel)
        GROUP BY node HAVING COUNT(*) >= 3) ka ON e.u = ka.node
  JOIN (SELECT node FROM (SELECT u AS node FROM peel UNION ALL SELECT v FROM peel)
        GROUP BY node HAVING COUNT(*) >= 3) kb ON e.v = kb.node
  WHERE EXISTS (
    SELECT 1 FROM (SELECT u AS node FROM peel UNION ALL SELECT v FROM peel)
    GROUP BY node HAVING COUNT(*) < 3)
),
last AS (SELECT u, v FROM peel WHERE r = (SELECT MAX(r) FROM peel)),
degs AS (
  SELECT node, COUNT(*) AS degree
  FROM (SELECT u AS node FROM last UNION ALL SELECT v FROM last)
  GROUP BY node
)
SELECT CAST(node AS BIGINT) AS node, CAST(degree AS BIGINT) AS degree
FROM degs
-- empty-core guard: if the last emitted round is not a true fixpoint
-- (possible only when the k-core is empty and the final filtered set
-- vanished), return nothing — matching the operator's empty return
WHERE NOT EXISTS (SELECT 1 FROM degs WHERE degree < 3)
"""


@register(
    "kcore_parts",
    oracle=_KCORE_ORACLE,
    tags=("mining", "graph", "persists"),
    # promoted to the 50-slot hard window in the r12 rotation
)
def kcore_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-core of the co-purchase part graph
    (``operators/graphalgo.py:kcore``): iterative peeling to the
    fixpoint — per round one degree aggregate + two node-set
    semi-joins (AQE picks broadcast as the survivor set shrinks); the
    driver sees one survivor count per round, never data. FULL
    value-hash oracle since r11: DuckDB 1.0 allows aggregates over the
    recursive reference, so the oracle replays the peel as a recursive
    CTE (round counter + changed-guard — the set-valued fixpoint is
    deterministic, so depth needs no bound) — upgrading the r9
    "aggregates in a recursive term are not SQL-expressible" rows-only
    rationale, which DuckDB 1.0 obsoleted. Cross-checked against a
    pure-python reference peel in ``test_graph.py``."""
    from ghcn_d_etl_project_spark.operators.graphalgo import kcore

    li = t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    a, c = b.alias("a"), b.alias("c")
    edges = (
        a.join(c, (F.col("a.k") == F.col("c.k")) & (F.col("a.p") < F.col("c.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("c.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
    )
    out = kcore(edges, "u", "v", k=3)
    return out.select(F.col("node").cast("long").alias("node"), "degree")


# ---------------------------------------------------------------------------
# Gini concentration (extension, r9): inequality of customer revenue
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
byv AS (SELECT cents AS v, COUNT(*) AS c FROM rev GROUP BY 1),
cumd AS (
  SELECT v, c,
         SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cumc
  FROM byv
),
terms AS (
  SELECT CAST(v AS DECIMAL(38,0))
           * (CAST(cumc - c AS DECIMAL(38,0)) * c + CAST(c AS DECIMAL(38,0))
              * (c + 1) / 2) AS rank_weighted,
         CAST(v AS DECIMAL(38,0)) * c AS total_v,
         c
  FROM cumd
),
s AS (
  SELECT SUM(rank_weighted) AS s1, SUM(total_v) AS sx, SUM(c) AS n
  FROM terms
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(CAST(sx AS DOUBLE) / (100.0 * n) AS DOUBLE) AS mean_revenue,
       round(CAST(2 * s1 - (n + 1) * sx AS DOUBLE)
             / CAST(n * sx AS DOUBLE), 6) AS gini
FROM s
"""


@register(
    "gini_revenue_customers",
    oracle=_GINI_ORACLE,
    tags=("mining", "stats", "analytics"),
)
def gini_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers — the
    standard inequality/concentration metric (whale-dependence audits,
    marketplace health). Computed RANK-FREE: exact integer revenue
    cents collapse to distinct values with counts, the cumulative count
    runs through the bucketed ``global_cumsum`` (never a data-sized
    single-partition rank window), and each tied block contributes
    ``v * (F_v*c + c(c+1)/2)`` — the closed form of its rank-weighted
    sum — in DECIMAL(38,0) exact arithmetic. The oracle states the
    plain window formulation; the MATCH certifies the distributed
    rewrite, ties and all."""
    from ghcn_d_etl_project_spark.operators.prefix import global_cumsum

    o = t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(24,2)")) * 100)
        .cast("long")
        .alias("cents")
    )
    byv = rev.groupBy(F.col("cents").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cumd = global_cumsum(byv, "v", "c", out_col="cumc")
    vdec = F.col("v").cast("decimal(38,0)")
    cdec = F.col("c").cast("decimal(38,0)")
    fv = (F.col("cumc") - F.col("c")).cast("decimal(38,0)")
    terms = cumd.select(
        (vdec * (fv * F.col("c") + cdec * (F.col("c") + 1) / 2)).alias(
            "rank_weighted"
        ),
        (vdec * F.col("c")).alias("total_v"),
        "c",
    )
    s = terms.agg(
        F.sum("rank_weighted").alias("s1"),
        F.sum("total_v").alias("sx"),
        F.sum("c").alias("n"),
    )
    n = F.col("n")
    return s.select(
        n.cast("long").alias("n_customers"),
        (F.col("sx").cast("double") / (F.lit(100.0) * n)).alias(
            "mean_revenue"
        ),
        F.round(
            (2 * F.col("s1") - (n + 1) * F.col("sx")).cast("double")
            / (n * F.col("sx")).cast("double"),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Lorenz curve deciles (extension, r9): the 80/20 concentration readout
# ---------------------------------------------------------------------------

_LORENZ_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
scored AS (
  -- exact integer ceil(10*cum/N) with peers-inclusive cum (see
  -- decile_lift_events) — no float decile boundary
  SELECT cents,
         CAST((10 * (COUNT(*) OVER (ORDER BY cents))
               + (COUNT(*) OVER ()) - 1) // (COUNT(*) OVER ())
              AS BIGINT) AS decile
  FROM rev
),
byd AS (
  SELECT decile, COUNT(*) AS n, SUM(cents) AS s FROM scored GROUP BY 1
),
tot AS (SELECT SUM(s) AS ts FROM byd)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n AS BIGINT) AS n_customers,
       CAST(s AS DOUBLE) / 100.0 AS revenue,
       round(CAST(s AS DOUBLE) / ts, 6) AS revenue_share,
       round(CAST(SUM(s) OVER (ORDER BY decile
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS DOUBLE)
             / ts, 6) AS cum_share
FROM byd, tot
"""


@register(
    "lorenz_deciles_customers",
    oracle=_LORENZ_ORACLE,
    tags=("mining", "stats", "analytics"),
)
def lorenz_deciles_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve deciles of customer revenue — the '80/20' readout
    that pairs with ``gini_revenue_customers`` (Gini = 1 - 2 x the
    area under this curve): customers bucketed into revenue deciles by
    the tie-stable COUNTING percentile recipe (never the oracle's
    global-sort window), per-decile exact-cents revenue, share, and
    the ascending cumulative share. After the per-customer collapse
    everything runs on <= 10 rows."""
    from ghcn_d_etl_project_spark.operators.encoding import (
        percentile_features,
    )
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(24,2)")) * 100)
        .cast("long")
        .alias("cents")
    )
    scored = percentile_features(
        rev, "cents", rank_col="__pr", cume_col="__cume", tile_col="__decile"
    )
    decile = F.col("__decile")
    byd = scored.groupBy(decile.alias("decile")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("s"),
    )
    full = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ts = F.sum("s").over(full)
    return byd.select(
        "decile",
        "n_customers",
        (F.col("s").cast("double") / 100.0).alias("revenue"),
        F.round(F.col("s").cast("double") / ts, 6).alias("revenue_share"),
        F.round(
            F.sum("s").over(cum_w).cast("double") / ts, 6
        ).alias("cum_share"),
    )
