"""Connected-components operator: planted-graph exactness, pointer-jump
convergence depth, string-id fallback path, and the dedup_clusters
invariants (component = min id, sizes consistent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.graph import (
    component_stats,
    connected_components,
)

from tests.conftest import SF_DIR


def test_planted_components(spark):
    """Chain, triangle, pair, and isolated node resolve to min-id labels."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 99]], "node long"
    )
    got = sorted(
        (r.node, r.component)
        for r in connected_components(edges, nodes=nodes).collect()
    )
    assert got == [
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
        (99, 99),
    ]


def test_long_chain_converges(spark):
    """A 64-node path graph (diameter 63) must converge well inside the
    iteration cap — pointer jumping gives O(log diameter) rounds, so a
    pure O(diameter) propagation (which would need 63) fails this."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    out = connected_components(
        edges, max_iter=12, driver_closure_max_edges=0
    ).collect()
    assert len(out) == 64
    assert all(r.component == 0 for r in out)


def test_string_ids_fallback(spark):
    """Non-numeric node ids exercise the join-based convergence check."""
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    got = sorted(
        (r.node, r.component) for r in connected_components(edges).collect()
    )
    assert got == [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")]


def test_component_stats_sizes(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,), (3,), (9,)], "node long")
    out = component_stats(connected_components(edges, nodes=nodes))
    got = {r.node: (r.component, r.component_size) for r in out.collect()}
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3), 9: (9, 1)}


def test_not_converged_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2, driver_closure_max_edges=0)


def test_dedup_clusters_invariants(spark):
    """Every component label is the min vec_id of its members; sizes sum
    to the corpus size; members of one component are mutually reachable
    (spot-checked via the pair list)."""
    from ghcn_d_etl_project_spark.plans import all_queries

    rows = all_queries()["dedup_clusters"].fn(spark, SF_DIR).collect()
    by_comp: dict[int, list[int]] = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r.vec_id)
    assert sum(len(v) for v in by_comp.values()) == len(rows)
    for comp, members in by_comp.items():
        assert comp == min(members)
    sizes = {r.component: r.component_size for r in rows}
    for comp, members in by_comp.items():
        assert sizes[comp] == len(members)


def test_reliable_checkpoint_path(spark, tmp_path):
    """checkpoint_dir= switches lineage truncation to RELIABLE
    df.checkpoint() — blocks written under the given directory (what a
    cluster job needs to survive executor loss), with identical
    results."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    ckpt = tmp_path / "ccckpt"
    got = sorted(
        (r.node, r.component)
        for r in connected_components(
            edges, checkpoint_dir=str(ckpt), driver_closure_max_edges=0
        ).collect()
    )
    assert got == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]
    # reliable checkpoints materialize on disk under the directory
    assert any(ckpt.rglob("*")), "no reliable checkpoint files written"


def test_driver_closure_matches_distributed(spark):
    """The bounded driver-side union-find fast path and the distributed
    pointer-jumping loop must produce IDENTICAL labels — same planted
    graph, both paths, element-for-element."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21),
         (30, 31), (31, 32), (32, 30), (40, 41)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 30, 31, 32, 40, 41, 99]],
        "node long",
    )
    via_driver = sorted(
        (r.node, r.component)
        for r in connected_components(edges, nodes=nodes).collect()
    )
    via_loop = sorted(
        (r.node, r.component)
        for r in connected_components(
            edges, nodes=nodes, driver_closure_max_edges=0
        ).collect()
    )
    assert via_driver == via_loop
    assert via_driver[-1] == (99, 99)  # isolated node labels itself


def test_components_with_drop_set_both_paths(spark):
    """r14: ``components_with_drop_set`` shares one closure and its drop
    set must equal the components frame filtered to component != node —
    on BOTH the bounded driver path and the distributed loop (forced via
    max_edges=0) — and the components frame must match
    ``connected_components`` exactly."""
    from ghcn_d_etl_project_spark.operators.graph import (
        components_with_drop_set,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 20, 21, 22, 99]], "node long"
    )
    want_comps = sorted(
        (r.node, r.component)
        for r in connected_components(edges, nodes=nodes).collect()
    )
    want_drop = sorted(n for n, c in want_comps if n != c)
    for max_edges in (100_000, 0):
        comps, drop = components_with_drop_set(
            edges, nodes=nodes, driver_closure_max_edges=max_edges
        )
        got_comps = sorted((r.node, r.component) for r in comps.collect())
        got_drop = sorted(r.node for r in drop.collect())
        assert got_comps == want_comps, f"max_edges={max_edges}"
        assert got_drop == want_drop == [2, 3, 11, 21, 22], (
            f"max_edges={max_edges}"
        )


def test_driver_closure_respects_bound(spark):
    """A graph just over the bound must return None from the fast path
    (and the public API must still resolve it via the loop)."""
    from ghcn_d_etl_project_spark.operators.graph import _driver_closure

    e = spark.createDataFrame(
        [(i, i + 1000) for i in range(10)], "src long, dst long"
    ).persist()
    assert _driver_closure(e, 9) is None      # 10 edges > bound 9
    assert _driver_closure(e, 0) is None      # 0 disables the path
    small = _driver_closure(e, 10)            # exactly at the bound: taken
    assert small is not None and small.count() == 20
    e.unpersist()
    # over-bound graphs still resolve correctly through the loop
    got = sorted(
        (r.node, r.component)
        for r in connected_components(e, driver_closure_max_edges=9).collect()
    )
    assert got == sorted(
        [(i, i) for i in range(10)] + [(i + 1000, i) for i in range(10)]
    )


def test_driver_closure_string_ids(spark):
    """The fast path is type-generic: string ids close identically."""
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    got = sorted(
        (r.node, r.component) for r in connected_components(edges).collect()
    )
    assert got == [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")]


# ---------------------------------------------------------------------------
# bfs_hops (r9)
# ---------------------------------------------------------------------------


def _src_df(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def test_bfs_hand_graph(spark):
    """Path 1-2-3-4 plus branch 2-5; unreachable 100-101 absent."""
    from ghcn_d_etl_project_spark.operators.graphalgo import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 5), (100, 101)], "u long, v long"
    )
    got = {
        r["node"]: r["dist"]
        for r in bfs_hops(edges, "u", "v", _src_df(spark, [1]), 4).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 2}


def test_bfs_multi_source_takes_min(spark):
    from ghcn_d_etl_project_spark.operators.graphalgo import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "u long, v long"
    )
    got = {
        r["node"]: r["dist"]
        for r in bfs_hops(edges, "u", "v", _src_df(spark, [1, 5]), 4).collect()
    }
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_max_hops_truncates(spark):
    from ghcn_d_etl_project_spark.operators.graphalgo import bfs_hops

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "u long, v long"
    )
    got = {
        r["node"]: r["dist"]
        for r in bfs_hops(edges, "u", "v", _src_df(spark, [0]), 3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    from ghcn_d_etl_project_spark.operators.graphalgo import bfs_hops as bh

    zero = {
        r["node"]: r["dist"]
        for r in bh(edges, "u", "v", _src_df(spark, [0]), 0).collect()
    }
    assert zero == {0: 0}
    with pytest.raises(ValueError):
        bh(edges, "u", "v", _src_df(spark, [0]), -1)


def test_bfs_undirected_and_early_stop(spark):
    """Edges traverse BOTH directions, and a component exhausted before
    max_hops terminates early (same answer at max_hops 2 and 50)."""
    from ghcn_d_etl_project_spark.operators.graphalgo import bfs_hops

    edges = spark.createDataFrame([(3, 1), (2, 1)], "u long, v long")
    a = {
        (r["node"], r["dist"])
        for r in bfs_hops(edges, "u", "v", _src_df(spark, [3]), 2).collect()
    }
    b = {
        (r["node"], r["dist"])
        for r in bfs_hops(edges, "u", "v", _src_df(spark, [3]), 50).collect()
    }
    assert a == b == {(3, 0), (1, 1), (2, 2)}


# ---------------------------------------------------------------------------
# kcore (r9)
# ---------------------------------------------------------------------------


def _py_kcore(edges, k):
    """Reference peel: repeatedly drop nodes with degree < k."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        deg: dict = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        if keep == set(deg):
            return {n: deg[n] for n in keep}
        es = {(u, v) for u, v in es if u in keep and v in keep}
        if not es:
            return {}


def test_kcore_triangle_plus_tail(spark):
    """Triangle (2-core) with a dangling tail: the tail peels away and
    its removal does not shave the triangle."""
    from ghcn_d_etl_project_spark.operators.graphalgo import kcore

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "u long, v long"
    )
    got = {r["node"]: r["degree"] for r in kcore(edges, "u", "v", 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    assert kcore(edges, "u", "v", 3).collect() == []


def test_kcore_matches_reference_peel_random(spark):
    import random

    from ghcn_d_etl_project_spark.operators.graphalgo import kcore

    rng = random.Random(42)
    for trial, k in ((0, 2), (1, 3)):
        edges = list(
            {
                (rng.randrange(30), rng.randrange(30))
                for _ in range(90)
            }
        )
        edges = [e for e in edges if e[0] != e[1]]
        df = spark.createDataFrame(edges, "u long, v long")
        got = {
            r["node"]: r["degree"]
            for r in kcore(df, "u", "v", k).collect()
        }
        assert got == _py_kcore(edges, k), f"trial {trial} k={k}"


def test_kcore_cascading_peel(spark):
    """A chain of triangles sharing single cut vertices: 3-core empty
    (every node has degree <= 4 but peeling cascades), while the
    4-clique survives k=3."""
    from ghcn_d_etl_project_spark.operators.graphalgo import kcore

    clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    tail = [(3, 10), (10, 11), (11, 3)]  # triangle hanging off node 3
    df = spark.createDataFrame(clique + tail, "u long, v long")
    got = {r["node"]: r["degree"] for r in kcore(df, "u", "v", 3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_validation(spark):
    from ghcn_d_etl_project_spark.operators.graphalgo import kcore

    df = spark.createDataFrame([(1, 2)], "u long, v long")
    with pytest.raises(ValueError):
        kcore(df, "u", "v", 0)
