"""Tests for the round-8 wave-4 mining operators: prefix-filtered set
similarity join, triangle counting, fixed-point PageRank, deterministic
negative sampling, and the RFM plan query's invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.graphalgo import (
    pagerank_fixed_point,
    triangle_counts,
)
from ghcn_d_etl_project_spark.operators.negatives import cyclic_negative_sample
from ghcn_d_etl_project_spark.operators.setjoin import (
    candidate_reduction_report,
    prefix_filtered_jaccard_join,
)

# ---------------------------------------------------------------------------
# Set-similarity join
# ---------------------------------------------------------------------------


def _brute_jaccard(rows, threshold):
    """Reference implementation: dict-of-sets, all pairs."""
    sets: dict[int, set] = {}
    for k, tok in rows:
        sets.setdefault(k, set()).add(tok)
    out = set()
    keys = sorted(sets)
    for i, k1 in enumerate(keys):
        for k2 in keys[i + 1 :]:
            inter = len(sets[k1] & sets[k2])
            if inter == 0:
                continue
            j = inter / (len(sets[k1]) + len(sets[k2]) - inter)
            if j >= threshold:
                out.add((k1, k2, len(sets[k1]), len(sets[k2]), inter))
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 1.0])
def test_prefix_join_matches_bruteforce(spark, threshold):
    """Losslessness: the prefix+length-filtered join returns EXACTLY the
    brute-force pair set at several thresholds, on data engineered with
    hot tokens (the case the prefix filter prunes hardest)."""
    rows = []
    # 30 sets over a 12-token vocabulary, sizes 1..6, with token 0 hot
    # (in almost every set) — deterministic construction, no RNG.
    for k in range(30):
        size = (k % 6) + 1
        toks = {(k * 7 + 3 * i) % 12 for i in range(size)}
        if k % 3:
            toks.add(0)
        rows += [(k, t) for t in toks]
    df = spark.createDataFrame(rows, "k int, tok int")
    got = {
        (r.k1, r.k2, r.n1, r.n2, r.n_common)
        for r in prefix_filtered_jaccard_join(df, "k", "tok", threshold).collect()
    }
    assert got == _brute_jaccard(rows, threshold)


def test_prefix_join_epsilon_guard(spark):
    """0.6 * 5 = 3.0000000000000004 in IEEE — a naive ceil() would
    shorten the prefix of a 5-token set and silently drop pairs. Two
    5-token sets sharing 4 (jaccard 4/6 = 0.667 >= 0.6) must survive."""
    rows = [(1, t) for t in [10, 11, 12, 13, 14]] + [
        (2, t) for t in [10, 11, 12, 13, 15]
    ]
    df = spark.createDataFrame(rows, "k int, tok int")
    out = prefix_filtered_jaccard_join(df, "k", "tok", 0.6).collect()
    assert [(r.k1, r.k2, r.n_common) for r in out] == [(1, 2, 4)]


def test_prefix_join_validates_threshold(spark):
    df = spark.createDataFrame([(1, 1)], "k int, tok int")
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="threshold"):
            prefix_filtered_jaccard_join(df, "k", "tok", bad)


def test_candidate_reduction_is_real(spark):
    """The pruning the module docstring promises must be measurable:
    filtered candidates strictly fewer than brute-force candidates on
    hot-token data (and never more — filters only remove)."""
    rows = []
    for k in range(40):
        toks = {0, 1} | {(k * 5 + i) % 17 for i in range((k % 4) + 2)}
        rows += [(k, t) for t in toks]
    df = spark.createDataFrame(rows, "k int, tok int")
    rep = candidate_reduction_report(df, "k", "tok", 0.6).collect()[0]
    assert rep.filtered_pairs < rep.brute_pairs
    assert 0.0 <= rep.ratio < 1.0


def test_prefix_join_no_cartesian(spark):
    """The join must stay an equi-join on the token — never a
    cartesian/broadcast-nested-loop candidate explosion."""
    df = spark.createDataFrame([(1, 1), (2, 1)], "k int, tok int")
    plan = prefix_filtered_jaccard_join(df, "k", "tok", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------


def test_triangles_hand_graph(spark):
    """K4 plus a pendant edge: K4 has 4 triangles; every K4 vertex sits
    in exactly 3 of them; the pendant vertex in none."""
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "u int, v int")
    got = {r.node: r.n_triangles for r in triangle_counts(df, "u", "v").collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_input_normalization(spark):
    """Duplicate edges, reversed duplicates, and self-loops must not
    change the count (canonical undirected edge set)."""
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    df = spark.createDataFrame(edges, "u int, v int")
    got = {r.node: r.n_triangles for r in triangle_counts(df, "u", "v").collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_none_in_tree(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "u int, v int")
    assert triangle_counts(df, "u", "v").count() == 0


# ---------------------------------------------------------------------------
# Fixed-point PageRank
# ---------------------------------------------------------------------------


def test_pagerank_star_center_dominates(spark):
    """On a star graph the hub must out-rank every leaf, and all leaves
    must tie exactly (fixed-point arithmetic: EXACT equality, not
    approximate)."""
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "u int, v int")
    ranks = {r.node: r.rank_fp for r in pagerank_fixed_point(df, "u", "v").collect()}
    leaf_ranks = {v for k, v in ranks.items() if k != 0}
    assert len(leaf_ranks) == 1
    assert ranks[0] > leaf_ranks.pop()


def test_pagerank_mass_conservation_bound(spark):
    """Total fixed-point mass stays within |V| + iters*|V| ulps of the
    scale (floor divisions only ever LOSE mass, never create it)."""
    edges = [(i, (i + 1) % 7) for i in range(7)] + [(0, 3), (2, 5)]
    df = spark.createDataFrame(edges, "u int, v int")
    out = pagerank_fixed_point(df, "u", "v", iters=3)
    total = out.agg(F.sum("rank_fp")).collect()[0][0]
    scale = 10**12
    assert total <= scale
    # 7 nodes, 4 division sites per node per iteration is a loose bound
    assert total >= scale - 7 * (3 + 1) * 10 * 9  # well within a few k ulps
    assert total > scale * 0.999999


def test_pagerank_deterministic_across_partitioning(spark):
    """Same graph, different partition counts -> bit-identical ranks
    (the entire point of fixed-point arithmetic)."""
    edges = [(i % 11, (i * 3 + 1) % 11) for i in range(25)]
    df1 = spark.createDataFrame(edges, "u int, v int").repartition(1)
    df7 = spark.createDataFrame(edges, "u int, v int").repartition(7)
    r1 = sorted(
        (r.node, r.rank_fp) for r in pagerank_fixed_point(df1, "u", "v").collect()
    )
    r7 = sorted(
        (r.node, r.rank_fp) for r in pagerank_fixed_point(df7, "u", "v").collect()
    )
    assert r1 == r7


def test_pagerank_zero_iters_is_uniform(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "u int, v int")
    out = pagerank_fixed_point(df, "u", "v", iters=0).collect()
    assert len({r.rank_fp for r in out}) == 1
    with pytest.raises(ValueError, match="iters"):
        pagerank_fixed_point(df, "u", "v", iters=-1)


# ---------------------------------------------------------------------------
# Negative sampling
# ---------------------------------------------------------------------------


def test_negatives_shape_and_laws(spark):
    """Per anchor: <= k negatives, all distinct, never the anchor
    itself; ranks are 1..k contiguous."""
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = cyclic_negative_sample(df, "doc_id", k=3, n_buckets=8).collect()
    per: dict[int, list] = {}
    for r in out:
        per.setdefault(r.anchor_id, []).append(r)
    assert set(per) == set(range(200))  # every anchor present (buckets of 25)
    for a, rs in per.items():
        negs = [r.neg_id for r in rs]
        assert a not in negs
        assert len(negs) == len(set(negs)) == 3
        assert sorted(r.neg_rank for r in rs) == [1, 2, 3]


def test_negatives_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    a = sorted(map(tuple, cyclic_negative_sample(df, "doc_id", k=2).collect()))
    b = sorted(map(tuple, cyclic_negative_sample(df, "doc_id", k=2).collect()))
    assert a == b
    c = sorted(
        map(tuple, cyclic_negative_sample(df, "doc_id", k=2, salt="other").collect())
    )
    assert a != c  # salt really re-draws


def test_negatives_small_buckets(spark):
    """Buckets smaller than k+1 yield min(k, bn-1) negatives, no
    duplicates (the cyclic offset must never wrap a full cycle);
    singleton corpus yields none."""
    df = spark.createDataFrame([(i,) for i in range(3)], "doc_id long")
    out = cyclic_negative_sample(df, "doc_id", k=5, n_buckets=1).collect()
    per: dict[int, list] = {}
    for r in out:
        per.setdefault(r.anchor_id, []).append(r.neg_id)
    for a, negs in per.items():
        assert len(negs) == len(set(negs)) == 2
        assert a not in negs
    one = spark.createDataFrame([(42,)], "doc_id long")
    assert cyclic_negative_sample(one, "doc_id", k=3).count() == 0


def test_negatives_validation(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="k must"):
        cyclic_negative_sample(df, "doc_id", k=0)
    with pytest.raises(ValueError, match="n_buckets"):
        cyclic_negative_sample(df, "doc_id", n_buckets=0)


# ---------------------------------------------------------------------------
# RFM plan query invariants (oracle covers values; these cover laws)
# ---------------------------------------------------------------------------


def test_rfm_scores_in_range(spark):
    from ghcn_d_etl_project_spark.plans.registry import all_queries

    q = all_queries()["rfm_segments"]
    out = q.fn(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert 1 <= r.r_score <= 5
        assert 1 <= r.f_score <= 5
        assert 1 <= r.m_score <= 5
        assert r.segment == f"{r.r_score}{r.f_score}{r.m_score}"
    # the most recent customer(s) must hold r_score 5
    best = [r for r in out if r.recency_days == min(x.recency_days for x in out)]
    assert all(r.r_score == 5 for r in best)


# ---------------------------------------------------------------------------
# Pareto frontier / global_cummax
# ---------------------------------------------------------------------------


def _brute_skyline(points):
    """Reference dominance check: q dominates p iff q.x <= p.x and
    q.y >= p.y with one strict."""
    out = []
    for p in points:
        if not any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in points
        ):
            out.append(p)
    return sorted(out)


def test_skyline_matches_bruteforce_global(spark):
    from ghcn_d_etl_project_spark.operators.skyline import pareto_frontier_2d

    pts = [((i * 17) % 23 + 0.5 * ((i * 7) % 3), (i * 11) % 19) for i in range(60)]
    df = spark.createDataFrame(pts, "x double, y long")
    got = sorted((r.x, r.y) for r in pareto_frontier_2d(df, "x", "y").collect())
    assert got == _brute_skyline(pts)


def test_skyline_matches_bruteforce_grouped(spark):
    from ghcn_d_etl_project_spark.operators.skyline import pareto_frontier_2d

    rows = [
        ("g" + str(i % 3), float((i * 13) % 29), (i * 5) % 17) for i in range(90)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y long")
    got = sorted(
        (r.g, r.x, r.y)
        for r in pareto_frontier_2d(df, "x", "y", group_cols=["g"]).collect()
    )
    want = []
    for g in ("g0", "g1", "g2"):
        pts = [(x, y) for gg, x, y in rows if gg == g]
        want += [(g, x, y) for x, y in _brute_skyline(pts)]
    assert got == sorted(want)


def test_skyline_ties_and_nulls(spark):
    """Exact coordinate duplicates all survive (neither dominates);
    a same-x lower-y row is dominated; NULL objectives are excluded."""
    from ghcn_d_etl_project_spark.operators.skyline import pareto_frontier_2d

    rows = [
        (1, 5.0, 10),
        (2, 5.0, 10),   # exact duplicate of 1 -> both survive
        (3, 5.0, 9),    # same price, smaller -> dominated
        (4, 4.0, 10),   # cheaper, same size -> dominates 1/2
        (5, None, 99),
        (6, 3.0, None),
    ]
    df = spark.createDataFrame(rows, "id int, x double, y int")
    ids = sorted(r.id for r in pareto_frontier_2d(df, "x", "y").collect())
    assert ids == [4]
    # without row 4, the duplicate pair survives together
    df2 = df.filter("id != 4")
    ids2 = sorted(r.id for r in pareto_frontier_2d(df2, "x", "y").collect())
    assert ids2 == [1, 2]


def test_skyline_no_nested_loop_join(spark):
    """The whole point: no BroadcastNestedLoopJoin / CartesianProduct
    in the physical plan (the NOT EXISTS formulation would plan one)."""
    from ghcn_d_etl_project_spark.operators.skyline import pareto_frontier_2d

    import pytest as _pytest

    df = spark.createDataFrame(
        [("a", 1.0, 1), ("b", 2.0, 2)], "g string, x double, y int"
    )
    for kwargs in ({}, {"group_cols": ["g"]}):
        plan = (
            pareto_frontier_2d(df, "x", "y", **kwargs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
    # objective/group column overlap is refused, not silently ambiguous
    with _pytest.raises(ValueError, match="distinct"):
        pareto_frontier_2d(df, "x", "x")
    with _pytest.raises(ValueError, match="distinct"):
        pareto_frontier_2d(df, "x", "y", group_cols=["y"])


def test_global_cummax_matches_window(spark):
    """Bucketed running max == the single-partition window formulation,
    inclusive and exclusive, on skewed keys (both bucketing shapes)."""
    from pyspark.sql import Window

    from ghcn_d_etl_project_spark.operators.prefix import global_cummax

    rows = [(float(i * i % 97), (i * 31) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "k double, v long").withColumn(
        "k", F.col("k") + F.col("v") / 1000.0  # unique order keys
    )
    for inclusive in (True, False):
        end = 0 if inclusive else -1
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, end)
        want = {
            (r.k, r.m)
            for r in df.withColumn("m", F.max("v").over(w)).collect()
        }
        for kwargs in ({"bucket_width": 7.0}, {"num_partitions": 8}):
            got = {
                (r.cm_k, r.cm_m)
                for r in global_cummax(
                    df, "k", "v", out_col="m", inclusive=inclusive, **kwargs
                )
                .select(F.col("k").alias("cm_k"), F.col("m").alias("cm_m"))
                .collect()
            }
            assert got == want, (inclusive, kwargs)


# ---------------------------------------------------------------------------
# gini (r9) — exercised through the registered query's building blocks
# ---------------------------------------------------------------------------


def _py_gini(values):
    xs = sorted(values)
    n = len(xs)
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    sx = sum(xs)
    return (2 * s1 - (n + 1) * sx) / (n * sx)


def test_gini_closed_form_matches_brute(spark):
    """The rank-free tied-block formulation == the textbook sorted-rank
    formula, on data WITH ties."""
    import random

    from ghcn_d_etl_project_spark.operators.prefix import global_cumsum

    rng = random.Random(9)
    vals = [rng.choice([100, 100, 250, 400, 400, 900, 1500]) for _ in range(80)]
    df = spark.createDataFrame([(v,) for v in vals], "cents long")
    byv = df.groupBy(F.col("cents").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cumd = global_cumsum(byv, "v", "c", out_col="cumc")
    rows = cumd.collect()
    s1 = sum(
        r["v"] * ((r["cumc"] - r["c"]) * r["c"] + r["c"] * (r["c"] + 1) / 2)
        for r in rows
    )
    sx = sum(r["v"] * r["c"] for r in rows)
    n = sum(r["c"] for r in rows)
    got = (2 * s1 - (n + 1) * sx) / (n * sx)
    assert got == pytest.approx(_py_gini(vals), abs=1e-12)


def test_gini_boundary_values(spark):
    """All-equal -> 0; one whale among near-zeros -> close to 1 - 1/n."""
    assert _py_gini([5] * 40) == pytest.approx(0.0, abs=1e-12)
    n = 50
    g = _py_gini([1] * (n - 1) + [10_000_000])
    assert g == pytest.approx(1 - 1 / n, abs=0.01)


# ---------------------------------------------------------------------------
# srm_check_events (r10)
# ---------------------------------------------------------------------------


def test_srm_chi2_recomputes_from_emitted_counts(spark):
    """The emitted chi2/share/flag must equal a direct recomputation
    from the emitted counts. (At sf0.001 there are only 15 distinct
    users and the md5 split happens to give 3/12 — the flag correctly
    FIRES there, which is the statistic doing its job on a tiny
    sample, so split health is asserted separately at real n.)"""
    from ghcn_d_etl_project_spark.plans import all_queries
    from tests.conftest import SF_DIR

    r = all_queries()["srm_check_events"].fn(spark, SF_DIR).collect()[0]
    n_a, n_b = r["n_a"], r["n_b"]
    n = n_a + n_b
    exp = n * 0.5
    chi2 = (n_a - exp) ** 2 / exp + (n_b - exp) ** 2 / exp
    assert r["chi2"] == round(chi2, 6)
    assert r["observed_share"] == round(n_a / n, 6)
    assert r["srm_flag"] == int(chi2 > 3.841459)


def test_srm_md5_split_is_healthy_at_scale(spark):
    """The house md5 50/50 split must NOT trip SRM at real sample
    sizes (a biased assigner would indict every experiment readout
    built on it): 10k sequential ids through the identical arm
    expression."""
    from pyspark.sql import functions as F

    ids = spark.range(1, 10_001)
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("id").cast("string"), F.lit(":ab"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")
        % 2
    )
    r = ids.select(arm.alias("arm")).agg(
        F.count(F.when(F.col("arm") == 0, F.lit(1))).alias("n_a"),
        F.count(F.when(F.col("arm") == 1, F.lit(1))).alias("n_b"),
    ).collect()[0]
    n_a, n_b = r["n_a"], r["n_b"]
    exp = (n_a + n_b) * 0.5
    chi2 = (n_a - exp) ** 2 / exp + (n_b - exp) ** 2 / exp
    assert chi2 <= 3.841459, (n_a, n_b, chi2)


def test_srm_flag_fires_on_planted_imbalance():
    """The decision rule itself: a 60/40 split at n=1000 is far past
    the 0.05 critical value."""
    n_a, n_b = 600, 400
    exp = (n_a + n_b) * 0.5
    chi2 = (n_a - exp) ** 2 / exp + (n_b - exp) ** 2 / exp
    assert chi2 == 40.0 and chi2 > 3.841459


def test_cohens_d_matches_python_reference(spark):
    """Emitted d equals the textbook pooled-SD computation from the
    emitted counts/means, and a hand-built two-group frame gives the
    exact closed-form value."""
    import math

    from ghcn_d_etl_project_spark.plans import all_queries
    from tests.conftest import SF_DIR

    r = all_queries()["cohens_d_events"].fn(spark, SF_DIR).collect()[0]
    assert r["n_a"] + r["n_b"] > 2
    if r["cohens_d"] is not None:
        assert abs(r["cohens_d"]) < 5  # sane magnitude on null-ish split

    # closed-form hand case through the same operator arithmetic:
    # A = [1,2,3] (mean 2, ss 2), B = [4,6] (mean 5, ss 2)
    # pooled_var = (2+2)/3, d = -3/sqrt(4/3)
    from pyspark.sql import functions as F

    rows = [(0, 1.0), (0, 2.0), (0, 3.0), (1, 4.0), (1, 6.0)]
    df = spark.createDataFrame(rows, "arm int, x double")
    s = df.agg(
        F.count(F.when(F.col("arm") == 0, 1)).alias("na"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("nb"),
        F.sum(F.when(F.col("arm") == 0, F.col("x"))).alias("sa"),
        F.sum(F.when(F.col("arm") == 1, F.col("x"))).alias("sb"),
        F.sum(F.when(F.col("arm") == 0, F.col("x") * F.col("x"))).alias("qa"),
        F.sum(F.when(F.col("arm") == 1, F.col("x") * F.col("x"))).alias("qb"),
    ).collect()[0]
    pooled = (
        s["qa"] - s["sa"] ** 2 / s["na"] + s["qb"] - s["sb"] ** 2 / s["nb"]
    ) / (s["na"] + s["nb"] - 2)
    d = (s["sa"] / s["na"] - s["sb"] / s["nb"]) / math.sqrt(pooled)
    assert d == pytest.approx(-3 / math.sqrt(4 / 3), abs=1e-12)


# ---------------------------------------------------------------------------
# Local clustering coefficient (r11)
# ---------------------------------------------------------------------------


def test_lcc_hand_graph(spark):
    """K4 + pendant: K4 vertices 1-3 have deg 3 and 3 triangles ->
    lcc = 2*3/(3*2) = 1.0; vertex 4 has deg 4 (pendant attached), still
    3 triangles -> 2*3/(4*3) = 0.5; pendant vertex 5 has deg 1 ->
    lcc = 0.0 and MUST appear (zeros included, unlike triangle_counts)."""
    from ghcn_d_etl_project_spark.operators.graphalgo import (
        clustering_coefficients,
    )

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "u int, v int")
    got = {
        r.node: (r.deg, r.n_triangles, r.lcc)
        for r in clustering_coefficients(df, "u", "v").collect()
    }
    assert got == {
        1: (3, 3, 1.0),
        2: (3, 3, 1.0),
        3: (3, 3, 1.0),
        4: (4, 3, 0.5),
        5: (1, 0, 0.0),
    }


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction (r11)
# ---------------------------------------------------------------------------


def test_adamic_adar_hand_graph(spark):
    """Square 1-2-3-4-1: the two diagonals (1,3) and (2,4) are the only
    non-adjacent pairs; each has BOTH other vertices as common
    neighbors (cn=2), every node has deg 2, so
    aa_fp = 2 * floor(1e9/ln(2)) exactly."""
    import math

    from ghcn_d_etl_project_spark.operators.graphalgo import adamic_adar_scores

    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    df = spark.createDataFrame(edges, "u int, v int")
    rows = {
        (r.node1, r.node2): (r.common_neighbors, r.aa_fp)
        for r in adamic_adar_scores(df, "u", "v", min_common=2).collect()
    }
    term = math.floor(1e9 / math.log(2.0))
    assert rows == {(1, 3): (2, 2 * term), (2, 4): (2, 2 * term)}


def test_adamic_adar_excludes_adjacent_and_degree_one(spark):
    """Triangle 1-2-3 with pendant 4 on node 1: all triangle pairs are
    adjacent (excluded); (3,4)/(2,4) share only common neighbor 1 ->
    cn=1 < min_common=2 -> empty. Also proves the deg-1 pendant never
    reaches the 1/ln(deg) division (ANSI divide-by-zero guard)."""
    from ghcn_d_etl_project_spark.operators.graphalgo import adamic_adar_scores

    edges = [(1, 2), (2, 3), (3, 1), (1, 4)]
    df = spark.createDataFrame(edges, "u int, v int")
    assert adamic_adar_scores(df, "u", "v", min_common=2).count() == 0
    got = {
        (r.node1, r.node2): r.common_neighbors
        for r in adamic_adar_scores(df, "u", "v", min_common=1).collect()
    }
    assert got == {(2, 4): 1, (3, 4): 1}
