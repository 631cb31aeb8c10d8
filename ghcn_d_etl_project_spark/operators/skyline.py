"""Pareto frontier (skyline) over two conflicting objectives.

"Cheapest AND largest" / "freshest AND highest-quality" questions have
no single winner — the answer is the dominance frontier: rows no other
row beats on both axes at once. ``q`` dominates ``p`` iff
``q.x <= p.x AND q.y >= p.y`` with at least one strict (``x``
minimized, ``y`` maximized).

The textbook formulation is a quadratic NOT EXISTS self-join — in Spark
a non-equi condition plans ``BroadcastNestedLoopJoin``, the N^2
death-mode. This operator is the sort-based O(n log n) shape made
distributed, and NEVER materializes a dominance pair:

1. collapse to the per-distinct-x best y (one hash aggregate,
   map-side partials — the same distinct-value-collapse argument as
   ``encoding.percentile_features``);
2. exclusive running max of best-y in ascending-x order over that
   summary. Grouped frontiers partition the window by the group
   (parallel); the GLOBAL frontier uses
   ``prefix.global_cummax(inclusive=False)`` — the bucketed one-shuffle
   machinery, not an ``Exchange SinglePartition`` sort;
3. a distinct x-value is on the frontier iff its best y STRICTLY
   exceeds every strictly-cheaper x's best y (`>` prev-max; ties with a
   cheaper row are dominated — the cheaper row wins on x);
4. equi-join the surviving (x, best_y) pairs back: original rows
   tied on BOTH coordinates all survive (neither dominates the other).

Correctness of the collapse: within one x, only max-y rows can be
non-dominated (any lower y is dominated by the max-y row at the same
x, strict in y). Across x the exclusive prefix max is exactly
"the best y among all strictly-cheaper rows".

Reference parity: no skyline analog in the reference; extension surface
for the multi-objective-selection family. The registered query's oracle
IS the quadratic NOT EXISTS formulation this replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def pareto_frontier_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    group_cols: list[str] | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """Rows on the (min ``minimize_col``, max ``maximize_col``) Pareto
    frontier — per group when ``group_cols`` is given, else globally.
    Rows with a NULL in either objective are excluded (dominance is
    undefined for them). Output: the input columns, frontier rows only,
    duplicates on both coordinates all retained.

    ``bucket_width`` tunes the global path's prefix buckets (see
    ``operators/prefix.py``); ignored for grouped frontiers.
    """
    groups = list(group_cols or [])
    if minimize_col == maximize_col or {minimize_col, maximize_col} & set(groups):
        raise ValueError(
            "minimize_col, maximize_col, and group_cols must be distinct "
            f"(got {minimize_col!r}, {maximize_col!r}, groups {groups!r})"
        )
    base = df.filter(
        F.col(minimize_col).isNotNull() & F.col(maximize_col).isNotNull()
    )
    per_x = base.groupBy(*groups, minimize_col).agg(
        F.max(maximize_col).alias("__best_y")
    )

    if groups:
        # Parallel windows: one partition per group, scale-safe as long
        # as single groups stay window-sized (same posture as every
        # per-key window in plans/windows.py).
        w = (
            Window.partitionBy(*groups)
            .orderBy(minimize_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        marked = per_x.withColumn("__prev_max", F.max("__best_y").over(w))
    else:
        from ghcn_d_etl_project_spark.operators.prefix import global_cummax

        marked = global_cummax(
            per_x,
            minimize_col,
            "__best_y",
            out_col="__prev_max",
            inclusive=False,
            bucket_width=bucket_width,
        )

    survivors = marked.filter(
        F.col("__prev_max").isNull() | (F.col("__best_y") > F.col("__prev_max"))
    ).select(*groups, minimize_col, F.col("__best_y").alias(maximize_col))

    # Survivor table is frontier-sized (tiny): broadcast the join back.
    return base.join(
        F.broadcast(survivors), [*groups, minimize_col, maximize_col]
    ).select(*base.columns)
