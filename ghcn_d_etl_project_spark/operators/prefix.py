"""Distributed global prefix sum (running total) over a total order.

The naive formulation — ``Window.orderBy(k)`` with no ``partitionBy`` —
plans an ``Exchange SinglePartition``: every row funnels through ONE task,
the canonical 100 TB death-mode (a global running total is however exactly
what training-shard packing, offset assignment, and cursorless pagination
need). No reference analog — the reference's windowing is per-station
(``gold_processor.py``); this is new scale surface.

Both shapes assign every row a VALUE-DERIVED, order-monotone bucket id,
then: per-bucket totals partial-aggregate map-side (the agg shuffle moves
one row per bucket per map partition, not data), the exclusive prefix
over bucket totals runs single-partition over a BOUNDED summary
(#buckets rows), and the offsets broadcast-join back onto the per-bucket
local cumsum — whose hash exchange is the operator's only full shuffle.
All pure DataFrame ops: UDF-free, codegen-friendly, AQE-skew-splittable.

* **fixed-width buckets** (``bucket_width`` given; dense roughly-uniform
  keys — surrogate ids, epoch timestamps): bucket = ``floor(k/width)``,
  zero extra passes. The same gap-bucketing idea as ``range_join_pairs``.
* **quantile buckets** (default; any numeric key, any skew): bucket
  boundaries come from ONE bounded ``approxQuantile`` pass (driver gets
  ``num_partitions - 1`` doubles — the same bounded-collect legitimacy
  as ``ivf.kmeans_fit``), and bucket = #boundaries ≤ key, a deterministic
  monotone expression. Sketch error only skews bucket BALANCE, never
  correctness. Honest cost note: the sketch is a separate ACTION — an
  extra full scan of the fact table before the main job (its driver-side
  result is bounded, the scan is not). Callers with dense, roughly
  uniform keys (surrogate ids, epoch micros) should prefer
  ``bucket_width``, which derives buckets from the value alone with zero
  extra passes.

Why not ``repartitionByRange`` + ``spark_partition_id()``: the offsets
branch and the fact branch would evaluate the range exchange separately
(exchange reuse is not guaranteed under AQE, verified), and each
evaluation samples its own boundaries — rows near a boundary can land in
DIFFERENT partitions per branch, silently corrupting offsets. Buckets
derived from the row's own value cannot disagree between branches.

A mapInPandas carry-across-batches variant exists in theory, but this
engine pins its hot-path queries UDF-free
(``tests/test_plans.py::test_hot_path_queries_are_udf_free``) — an Arrow
round-trip of the full corpus buys nothing the declarative shape doesn't
already deliver in one shuffle.

Ties in ``order_col`` make per-row running totals ambiguous (same as any
ROWS-frame SQL window); use a unique key. NULL order keys are excluded.
Non-numeric order keys: cast to a numeric total order first (e.g.
``unix_micros(ts)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__cumsum_bucket"
_OFFSET = "__cumsum_offset"


def _shuffle_partitions(spark, df: DataFrame) -> int:
    """``spark.sql.shuffle.partitions`` as an int, robust to platforms
    where the conf is non-numeric (``"auto"`` under some AQE setups):
    fall back to the input's current partition count, then 200."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (ValueError, TypeError):
        try:
            return df.rdd.getNumPartitions() or 200
        except Exception:  # noqa: BLE001 — conf probe must never fail
            return 200


def _monotone_bucket(
    df: DataFrame,
    order_col: str,
    bucket_width: float | None,
    num_partitions: int | None,
):
    """Value-derived, order-monotone bucket id Column (the module
    docstring's two shapes) — shared by the running-sum and running-max
    operators so both inherit the same branch-consistency guarantee."""
    key = F.col(order_col).cast("double")
    if bucket_width is not None:
        # floor-div on DOUBLE (not a long pre-cast, which would collapse
        # fractional keys onto integer buckets; not `div`, which
        # truncates toward 0) so fractional and negative keys both
        # bucket monotonically
        return F.floor(key / F.lit(float(bucket_width))).cast("long")
    spark = df.sparkSession
    n = num_partitions or _shuffle_partitions(spark, df)
    probs = [i / n for i in range(1, n)]
    # one bounded sketch pass; n-1 doubles to the driver
    cuts = (
        df.select(key.alias("__k")).approxQuantile("__k", probs, 0.001)
        if probs
        else []
    )
    cuts = sorted(set(cuts))
    if cuts:
        return F.size(
            F.filter(F.lit(cuts).cast("array<double>"), lambda b: b <= key)
        ).cast("long")
    # degenerate: one bucket (empty input or num_partitions=1)
    return F.lit(0).cast("long")


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str | list[str],
    out_col: str | list[str] = "cum",
    bucket_width: float | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = running total of ``value_col`` in ``order_col``
    order, computed distributively (see module docstring for the two
    bucketing shapes). Output columns: input columns + ``out_col``.
    Lists run SEVERAL running totals over the same order in the SAME
    single pass (same buckets, same shuffle, same windows — the
    per-column cost is one extra sum in each of the two aggregates);
    ``value_col`` and ``out_col`` lists must zip.

    ``bucket_width``: fixed-width buckets, ``floor(key/width)`` — choose
    it so #buckets ≈ rows/width stays comfortably bounded (the exclusive
    prefix over bucket totals is a single-partition window over #buckets
    SUMMARY rows — e.g. width 1e6 over 1e11 rows → 100k summary rows).
    ``num_partitions``: quantile-bucket count for the default shape
    (default: ``spark.sql.shuffle.partitions``).
    """
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(value_cols) != len(out_cols):
        raise ValueError("value_col and out_col lists must zip")
    df = df.filter(F.col(order_col).isNotNull())
    base = df.withColumn(
        _PID, _monotone_bucket(df, order_col, bucket_width, num_partitions)
    )

    # Exclusive prefix over per-bucket totals: the groupBy partial-
    # aggregates map-side (tiny shuffle), and the orderBy window runs
    # single-partition over #buckets SUMMARY rows — bounded by
    # construction, not by data size.
    w_prefix = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        base.groupBy(_PID)
        .agg(*[F.sum(v).alias(f"__bsum{i}") for i, v in enumerate(value_cols)])
        .select(
            _PID,
            *[
                F.coalesce(F.sum(f"__bsum{i}").over(w_prefix), F.lit(0)).alias(
                    f"{_OFFSET}{i}"
                )
                for i in range(len(value_cols))
            ],
        )
    )

    # Local cumsum per bucket (parallel window) + broadcast offsets back:
    # BroadcastHashJoin streams the fact side with NO exchange, so the
    # window's hash shuffle is the operator's only full shuffle.
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = base.join(F.broadcast(offsets), _PID)
    for i, (v, o) in enumerate(zip(value_cols, out_cols)):
        out = out.withColumn(
            o, F.sum(F.col(v)).over(w_local) + F.col(f"{_OFFSET}{i}")
        )
    return out.drop(_PID, *[f"{_OFFSET}{i}" for i in range(len(value_cols))])


def global_cummax(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cummax",
    inclusive: bool = True,
    bucket_width: float | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = running MAX of ``value_col`` in ``order_col``
    order — the max-monoid twin of :func:`global_cumsum`, same
    value-derived monotone buckets, same one-full-shuffle shape, same
    bounded single-partition summary window (see module docstring).

    ``inclusive=False`` gives the EXCLUSIVE prefix max (strictly
    preceding rows only): NULL when no predecessor exists — the shape a
    sort-based Pareto frontier needs (``operators/skyline.py``). Ties in
    ``order_col`` make per-row EXCLUSIVE prefixes ambiguous, exactly as
    the module docstring warns for cumsum; use a unique order key.
    """
    df = df.filter(F.col(order_col).isNotNull())
    base = df.withColumn(
        _PID, _monotone_bucket(df, order_col, bucket_width, num_partitions)
    )
    # Exclusive prefix max over per-bucket maxes (NULL for the first
    # bucket — max has no identity element the way sum has 0, so the
    # no-predecessor state is an honest NULL, not a sentinel).
    w_prefix = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        base.groupBy(_PID)
        .agg(F.max(value_col).alias("__bmax"))
        .select(_PID, F.max("__bmax").over(w_prefix).alias(_OFFSET))
    )
    end = 0 if inclusive else -1
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    # greatest() ignores NULL unless all args are NULL — exactly the
    # semantics both the first-bucket and first-row-in-bucket edges need.
    return (
        base.join(F.broadcast(offsets), _PID)
        .withColumn(
            out_col,
            F.greatest(F.max(F.col(value_col)).over(w_local), F.col(_OFFSET)),
        )
        .drop(_PID, _OFFSET)
    )
