"""Physical-plan inspection: the engine's plan-audit discipline as a
public API.

Every operator family in this engine carries plan pins in its tests
(shuffle counts, broadcast vs shuffled joins, pushed filters, pruned
scans, no-cartesian guards). Users composing their own queries on the
engine need the same leverage without parsing ``explain()`` output by
hand — at 100 TB the difference between "filter reached the parquet
scan" and "filter runs after a full-table read" is the whole job. This
module turns the executed plan into a structured report and provides the
assertion helpers the engine's own test suite patterns are built from.

Driver-side string analysis of the already-built plan: zero effect on
execution, no data movement, safe to call in production logging.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = [
    "plan_report",
    "plan_string",
    "assert_no_cartesian",
    "assert_max_shuffles",
    "assert_scan_pruned",
]


def plan_string(df: DataFrame, max_metadata: int = 10000) -> str:
    """The executed plan as text, with metadata truncation lifted so
    ``PushedFilters`` / ``ReadSchema`` lists are never cut mid-entry
    (Spark's 100-char default silently truncates them)."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key, "100")
    try:
        spark.conf.set(key, str(max_metadata))
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, old)


@dataclass
class PlanReport:
    """Structured summary of one executed plan."""

    shuffles: int = 0  # Exchange hashpartitioning
    single_partition_exchanges: int = 0
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    shuffled_hash_joins: int = 0
    cartesian_products: int = 0
    nested_loop_joins: int = 0
    sorts: int = 0
    window_ops: int = 0
    python_evals: int = 0  # row-at-a-time or Arrow-batched UDF nodes
    pandas_group_ops: int = 0  # FlatMapGroupsInPandas etc.
    cold_scans: int = 0  # FileScans NOT inside a cached (InMemoryRelation) subtree
    cached_refs: int = 0  # InMemoryTableScan references (served from cache)
    scans: list[dict] = field(default_factory=list)

    def as_dict(self) -> dict:
        return {
            "shuffles": self.shuffles,
            "single_partition_exchanges": self.single_partition_exchanges,
            "broadcast_joins": self.broadcast_joins,
            "sortmerge_joins": self.sortmerge_joins,
            "shuffled_hash_joins": self.shuffled_hash_joins,
            "cartesian_products": self.cartesian_products,
            "nested_loop_joins": self.nested_loop_joins,
            "sorts": self.sorts,
            "window_ops": self.window_ops,
            "python_evals": self.python_evals,
            "pandas_group_ops": self.pandas_group_ops,
            "cold_scans": self.cold_scans,
            "cached_refs": self.cached_refs,
            "scans": self.scans,
        }


def plan_report(df: DataFrame) -> PlanReport:
    """Parse the executed plan into counts + per-scan detail.

    Scans carry ``columns`` (the pruned output list), ``pushed_filters``
    and the raw ``read_schema`` — enough to answer "did my filter and
    projection reach the file format" without eyeballing explain()."""
    p = plan_string(df)
    r = PlanReport(
        shuffles=p.count("Exchange hashpartitioning")
        + p.count("Exchange rangepartitioning"),
        single_partition_exchanges=p.count("Exchange SinglePartition"),
        broadcast_joins=p.count("BroadcastHashJoin"),
        sortmerge_joins=p.count("SortMergeJoin"),
        shuffled_hash_joins=p.count("ShuffledHashJoin"),
        cartesian_products=p.count("CartesianProduct"),
        nested_loop_joins=p.count("BroadcastNestedLoopJoin"),
        sorts=len(re.findall(r"\bSort \[", p)),
        window_ops=len(re.findall(r"\bWindow \[|\bWindowExec\b", p)),
        python_evals=p.count("BatchEvalPython") + p.count("ArrowEvalPython"),
        pandas_group_ops=p.count("FlatMapGroupsInPandas")
        + p.count("FlatMapGroupsWithStateInPandas")
        + p.count("MapInPandas"),
    )
    r.cached_refs = p.count("InMemoryTableScan")
    # cold_scans: FileScans NOT nested inside an InMemoryRelation
    # subtree. toString prints each cached reference WITH its full
    # recompute plan, so a persisted substrate referenced k times shows
    # k textual FileScans that execution serves from cache — counting
    # them as rescans misread e.g. the (fixed) PMI query as still
    # scanning its source 11x. Tree depth = length of the `:  `/`+- `
    # glyph prefix, monotone in nesting; a stack of active
    # InMemoryRelation depths tells whether a scan line is inside one.
    imr_depths: list[int] = []
    for line in p.splitlines():
        depth = len(line) - len(line.lstrip(" :+-*(0123456789)"))
        while imr_depths and depth <= imr_depths[-1]:
            imr_depths.pop()
        if "InMemoryRelation" in line:
            imr_depths.append(depth)
            continue
        if "FileScan" not in line:
            continue
        if not imr_depths:
            r.cold_scans += 1
        cols = re.search(r"FileScan \w+ \[([^\]]*)\]", line)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", line)
        schema = re.search(r"ReadSchema: (struct<.*?>)(?:,|$)", line)
        r.scans.append(
            {
                "columns": [
                    c.strip().split("#")[0]
                    for c in (cols.group(1).split(",") if cols else [])
                    if c.strip()
                ],
                "pushed_filters": (
                    [f.strip() for f in pushed.group(1).split(",") if f.strip()]
                    if pushed
                    else []
                ),
                "read_schema": schema.group(1) if schema else None,
            }
        )
    return r


def assert_no_cartesian(df: DataFrame) -> None:
    """Raise if the plan contains a CartesianProduct or
    BroadcastNestedLoopJoin — the two pair-explosion shapes that turn a
    100 TB join into an unfinishable job."""
    r = plan_report(df)
    if r.cartesian_products or r.nested_loop_joins:
        raise AssertionError(
            f"plan contains pair-explosion joins: "
            f"cartesian={r.cartesian_products} "
            f"nested_loop={r.nested_loop_joins}\n{plan_string(df)[:2000]}"
        )


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    """Raise if the plan hash/range-shuffles more than ``n`` times."""
    r = plan_report(df)
    if r.shuffles > n:
        raise AssertionError(
            f"plan has {r.shuffles} shuffles, budget {n}\n"
            f"{plan_string(df)[:2000]}"
        )


def assert_scan_pruned(
    df: DataFrame, max_columns: int, require_pushed: bool = False
) -> None:
    """Raise if any file scan reads more than ``max_columns`` columns
    (projection did not prune) or, with ``require_pushed``, if a scan
    carries no pushed filters at all."""
    r = plan_report(df)
    if not r.scans:
        raise AssertionError("plan has no file scans to check")
    for s in r.scans:
        if len(s["columns"]) > max_columns:
            raise AssertionError(
                f"scan reads {len(s['columns'])} columns "
                f"({s['columns']}), budget {max_columns}"
            )
        if require_pushed and not s["pushed_filters"]:
            raise AssertionError(f"scan has no pushed filters: {s}")
