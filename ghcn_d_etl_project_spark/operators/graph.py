"""Distributed connected components — the cluster-forming step of a
dedup pipeline.

Near-dup detection (MinHash-LSH, SimHash, embedding cosine — see
``operators/dedup.py`` / ``operators/similarity.py``) emits PAIRS; an
actual dedup pass needs the transitive closure of those pairs so each
group keeps exactly one canonical document. That closure is connected
components over the pair graph.

Algorithm: iterative min-label propagation with pointer jumping, pure
DataFrame joins + groupBy-min — no GraphX/GraphFrames dependency, no
driver-side graph materialization. Per iteration every node takes the
min of (its label, its neighbors' labels, its label's label). Neighbor
propagation alone converges in O(diameter) rounds; the pointer-jumping
term (label-of-label) halves label-chain depth each round, giving
O(log diameter) total — the standard PRAM shortcut, same spirit as the
large-star/small-star MapReduce formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond").

Scale posture per iteration: two shuffles (the edge join and the
groupBy-min), both on the node key; labels are checkpointed each round
so the plan's lineage stays O(1) instead of O(iterations) (an unbounded
iterative lineage is the classic Spark OOM/stack-overflow trap). Pass
``checkpoint_dir`` for RELIABLE checkpoints on a cluster (survives
executor loss); the default ``localCheckpoint`` is faster but
executor-local — fine for local mode and short jobs. Dedup graphs in
practice have tiny components (diameter <= ~3), so the loop body
executes 2-4 times regardless of corpus size.

Iteration cost is ONE Spark job, not two: the per-round label
checkpoint is LAZY (``localCheckpoint(eager=False)``), so the
convergence-witness aggregate that must run anyway is the action that
materializes it — fusing what used to be separate checkpoint and
metric jobs. With dedup-shaped graphs converging in 2-4 rounds, the
fixed per-job cost (scheduling, shuffle setup) dominates the tiny
label tables, so halving the job count nearly halves the closure's
wall-clock (measured: the `components` stage of ``corpus_prep_staged``).
Round 1 also skips the pointer-jump self-join outright — labels start
as the identity assignment, making label-of-label a no-op — and each
round unpersists the previous round's checkpoint blocks once the new
labels are materialized, so cache usage stays O(1) in iterations.
The reliable-checkpoint path keeps eager semantics: a lazy reliable
checkpoint re-runs the plan in a second job to write files, which
would undo the fusion, and durability is the point of that path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_closure(und: DataFrame, max_edges: int) -> DataFrame | None:
    """Bounded small-graph fast path: if the 2-column edge list has at
    most ``max_edges`` rows — established by a ``limit(k+1)`` probe, so
    the check never scans past the bound — collect it and run union-find
    with path compression on the driver, returning a
    ``(node, component)`` map for the nodes that appear in edges (the
    caller extends it to isolated nodes with a broadcast join). Returns
    None when the graph exceeds the bound and the distributed loop must
    run. Duplicate edges and either/both directions are fine (union-find
    is idempotent), so callers can pass the RAW pair list and keep the
    probe plan narrow — no distinct shuffle, no persist.

    Rationale: after LSH banding the near-dup PAIR graph is typically
    orders of magnitude smaller than the corpus (the whole point of
    blocking), while the distributed loop pays 2-4 rounds of shuffle
    scheduling no matter how tiny the graph is. Same bounded-driver-work
    pattern as the IVF quantizer fit (``operators/ivf.py``): O(max_edges)
    memory, never O(data), and the 100 TB path (a genuinely huge edge
    set) is untouched.
    """
    if max_edges <= 0:
        return None
    # One bounded action doubling as probe AND fetch: pull at most
    # max_edges+1 rows; an overfull result proves the graph exceeds the
    # bound (the partial fetch is discarded), otherwise we already hold
    # the whole edge list. Driver memory stays O(max_edges) either way.
    rows = und.limit(max_edges + 1).collect()
    if len(rows) > max_edges:
        return None
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = find(r[0]), find(r[1])
        if a != b:
            parent[max(a, b)] = min(a, b)
    members: dict = {}
    for n in {v for r in rows for v in (r[0], r[1])}:
        members.setdefault(find(n), []).append(n)
    mapping = [
        (n, min(ms)) for root, ms in members.items() for n in ms
    ]
    spark = und.sparkSession
    node_type = und.schema[0].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("node", node_type), StructField("component", node_type)]
    )
    return spark.createDataFrame(mapping, schema)


def _extend_driver_closure(
    small: DataFrame, nodes: DataFrame | None, node_col: str
) -> DataFrame:
    """Extend a bounded driver-closure mapping to the full
    ``(node, component)`` assignment: union in the caller-supplied
    vertex set (isolated nodes label themselves) and broadcast-join the
    mapping over it. small's node column is exactly the endpoints of
    non-self-loop edges — the same vertex set the loop path derives
    from ``und`` (both drop nodes appearing only in self-loops), so no
    extra endpoint union is needed when ``nodes`` is absent."""
    n_fast = small.select(F.col("node"))
    if nodes is not None:
        n_fast = n_fast.union(nodes.select(F.col(node_col).alias("node")))
    return (
        n_fast.distinct()
        .join(F.broadcast(small), "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )


def components_with_drop_set(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    driver_closure_max_edges: int = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """``(components, drop_set)`` sharing ONE closure computation — the
    keep-one-per-component dedup consumer's shape (r14).

    ``drop_set`` is the single-column ``(node)`` set of nodes that LOSE
    the dedup: ``component != node``. A dedup pass only needs this set
    (survivors = base ANTI-JOIN drop_set); deriving it by filtering the
    full components frame pays that frame's whole plan — in the bounded
    driver path a union + distinct + broadcast-join chain whose
    statistics are opaque to the planner (measured at sf0.1: the
    survivors semi-join against the canonical side planned a
    SortMergeJoin over it, ~1.2s for 4.5k rows of work). Here the
    driver path emits the drop set STRAIGHT off the driver-side
    union-find mapping — a LocalRelation of at most
    ``2 * |closed edges|`` rows with exact size stats, so the anti-join
    broadcasts and adds zero exchanges; every dropped node is an edge
    endpoint, so the mapping already contains all of them. The
    distributed path (edge set past the bound) filters the label table
    — one scan, same cost as before. The components frame itself stays
    available (lazily) for closure audits either way.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    small = _driver_closure(
        e.filter(F.col("src") != F.col("dst")), driver_closure_max_edges
    )
    if small is not None:
        comps = _extend_driver_closure(small, nodes, node_col)
        # explicit broadcast hint: the mapping is a driver-local frame
        # whose LogicalRDD plan carries NO size statistics (the planner
        # assumes worst case and picks a sort-merge join without the
        # hint), while its true size is bounded by construction at
        # 2 * driver_closure_max_edges rows of ids — the same
        # justification as _extend_driver_closure's broadcast of the
        # full mapping.
        drop = F.broadcast(
            small.filter(F.col("node") != F.col("component")).select("node")
        )
        return comps, drop
    comps = connected_components(
        edges,
        src,
        dst,
        nodes=nodes,
        node_col=node_col,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        driver_closure_max_edges=0,
    )
    return comps, comps.filter(F.col("node") != F.col("component")).select("node")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    driver_closure_max_edges: int = 100_000,
) -> DataFrame:
    """Label each node with the minimum node id reachable from it.

    ``edges`` is an undirected edge list (each pair listed once in either
    direction). ``nodes`` optionally supplies the full vertex set (column
    ``node_col``) so isolated nodes appear as singleton components.
    Returns ``(node, component)`` where ``component`` is the minimum id
    in the node's component. Raises if not converged within
    ``max_iter`` rounds (log2 of the largest component diameter).

    ``driver_closure_max_edges`` bounds the small-graph fast path: an
    edge set at most this large (checked with a ``limit(k+1)`` probe, so
    the probe cost is itself bounded) is closed with driver-side
    union-find and broadcast back — skipping the iterative loop's fixed
    per-round scheduling entirely. Set 0 to force the distributed loop
    (both paths produce identical labels; pinned in tests).

    ``checkpoint_dir`` selects the lineage-truncation strategy:
    when set, per-round labels use RELIABLE ``df.checkpoint()`` into
    that directory (HDFS/object-store path on a cluster) — blocks
    survive executor loss, the right choice for a multi-hour 100 TB
    job. When None (default), the faster ``localCheckpoint`` is used:
    blocks live on executors, so an executor loss mid-iteration kills
    the job — acceptable on local[...] or short-running jobs only.
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def truncate(df: DataFrame, eager: bool = True) -> DataFrame:
        # Lazy local checkpoint (eager=False): lineage is truncated, but
        # materialization is deferred to the convergence-witness action —
        # one job per round instead of two. Only sound when the witness
        # computes EVERY partition (the full-scan numeric aggregate); the
        # non-numeric witness is a limit(1) probe that may touch a subset,
        # which would leave the checkpoint unfinalized and lineage growing,
        # so that path stays eager. Reliable checkpoints also stay eager (a
        # lazy reliable checkpoint re-runs the plan to write files).
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=eager)

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))

    # Small-graph fast path: bounded union-find on the driver, label map
    # broadcast back onto the (distributed) node set. Probes the RAW
    # single-direction edge list — union-find needs neither the doubled
    # directions nor dedup, so the probe's plan is a NARROW scan+limit
    # (no distinct shuffle, no persist churn); the shuffled `und` below
    # is built only when the loop actually runs. See _driver_closure.
    small = _driver_closure(
        e.filter(F.col("src") != F.col("dst")), driver_closure_max_edges
    )
    if small is not None:
        return _extend_driver_closure(small, nodes, node_col)

    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )

    n = und.select(F.col("src").alias("node"))
    if nodes is not None:
        n = n.union(nodes.select(F.col(node_col).alias("node")))

    # Convergence witness: labels only ever decrease, so for numeric ids
    # sum(component) strictly decreases until the fixed point — one
    # narrow aggregate per round instead of a join+count. (decimal(38,0)
    # so an ANSI-mode long sum can't overflow.) Non-numeric ids fall back
    # to the changed-rows join. The numeric witness scans every partition,
    # so it doubles as the materializer for the lazy checkpoints above.
    from pyspark.sql.types import NumericType

    numeric = isinstance(n.schema[0].dataType, NumericType)

    labels = truncate(
        n.distinct().select("node", F.col("node").alias("component")),
        eager=not numeric,
    )

    def metric(df: DataFrame):
        return df.agg(F.sum(F.col("component").cast("decimal(38,0)"))).first()[0]

    prev = metric(labels) if numeric else None

    for it in range(max_iter):
        neighbor = und.join(labels, und.src == labels.node).select(
            F.col("dst").alias("node"), "component"
        )
        candidates = labels.union(neighbor)
        if it > 0:
            # Pointer jumping (label-of-label) is the identity map on
            # round 1 — labels start as node→node — so the self-join is
            # pure overhead there and only joins from round 2 on.
            jump = (
                labels.alias("l1")
                .join(labels.alias("l2"), F.col("l1.component") == F.col("l2.node"))
                .select(
                    F.col("l1.node").alias("node"),
                    F.col("l2.component").alias("component"),
                )
            )
            candidates = candidates.union(jump)
        new_labels = truncate(
            candidates.groupBy("node").agg(F.min("component").alias("component")),
            eager=not numeric,
        )
        if numeric:
            # This action materializes the lazy checkpoint AND computes
            # the witness — the round's single job.
            cur = metric(new_labels)
            converged = cur == prev
            prev = cur
        else:
            converged = (
                new_labels.alias("a")
                .join(labels.alias("b"), "node")
                .filter(F.col("a.component") != F.col("b.component"))
                .limit(1)
                .count()
                == 0
            )
        # new_labels is materialized now; the previous round's checkpoint
        # blocks are dead weight — drop them so cache stays O(1) rounds.
        labels.unpersist()
        labels = new_labels
        if converged:
            und.unpersist()
            return labels
    und.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def component_stats(components: DataFrame) -> DataFrame:
    """Attach per-component size to a ``(node, component)`` assignment.
    One extra shuffle on the component key."""
    sizes = components.groupBy("component").agg(
        F.count(F.lit(1)).alias("component_size")
    )
    return components.join(sizes, "component").select(
        "node", "component", "component_size"
    )
