"""Distributed global prefix sum (running total) over a total order.

The naive formulation — ``Window.orderBy(k)`` with no ``partitionBy`` —
plans an ``Exchange SinglePartition``: every row funnels through ONE task,
the canonical 100 TB death-mode (a global running total is however exactly
what training-shard packing, offset assignment, and cursorless pagination
need). No reference analog — the reference's windowing is per-station
(``gold_processor.py``); this is new scale surface.

Two scalable shapes, both pure DataFrame ops (UDF-free, codegen-friendly):

* **value-bucketed** (``bucket_width`` given; order key numeric and
  roughly uniform — dense surrogate ids, epoch timestamps): bucket id is
  derived from the VALUE (``k div width``), so the per-bucket local
  cumsum needs only ONE full shuffle (hash on bucket). Per-bucket totals
  partial-aggregate map-side (the agg shuffle moves one row per bucket
  per map partition, not data), the exclusive prefix over bucket totals
  runs on a BOUNDED summary (#buckets rows — size it with
  ``bucket_width``), and the offsets broadcast-join back WITHOUT
  re-shuffling the fact side. The same gap-bucketing idea as
  ``range_join_pairs``, applied to prefix aggregation.

* **generic** (no ``bucket_width``; any orderable key, any skew):
  ``repartitionByRange`` assigns order-respecting partitions, the
  partition id becomes the bucket, and the per-bucket window then
  hash-shuffles on it — two full shuffles total. Still linear, still
  parallel; the price of not assuming key geometry.

A mapInPandas carry-across-batches variant would reach one shuffle in the
generic case too, but this engine pins its hot-path queries UDF-free
(``tests/test_plans.py::test_hot_path_queries_are_udf_free``) — an Arrow
round-trip of the full corpus buys back one exchange at the cost of
leaving whole-stage codegen; the declarative shape wins at both test and
cluster scale.

Ties in ``order_col`` make per-row running totals ambiguous (same as any
ROWS-frame SQL window); use a unique key. NULL order keys are excluded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__cumsum_bucket"
_OFFSET = "__cumsum_offset"


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    bucket_width: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = running total of ``value_col`` in ``order_col``
    order, computed distributively (see module docstring for the two
    plan shapes). Output columns: input columns + ``out_col``.

    ``bucket_width``: enables the 1-shuffle value-bucketed shape; choose
    it so #buckets ≈ rows/width stays comfortably bounded (the exclusive
    prefix over bucket totals is a single-partition window over #buckets
    SUMMARY rows — e.g. width 1e6 over 1e11 rows → 100k summary rows).
    ``num_partitions``: generic-shape range partition count (default:
    ``spark.sql.shuffle.partitions``).
    """
    df = df.filter(F.col(order_col).isNotNull())
    if bucket_width is not None:
        # floor-div (not `div`, which truncates toward 0) so negative
        # keys still bucket monotonically
        base = df.withColumn(
            _PID,
            F.floor(F.col(order_col).cast("long") / F.lit(int(bucket_width))).cast(
                "long"
            ),
        )
    else:
        spark = df.sparkSession
        n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
        base = df.repartitionByRange(n, F.col(order_col)).withColumn(
            _PID, F.spark_partition_id().cast("long")
        )

    # Exclusive prefix over per-bucket totals: the groupBy partial-
    # aggregates map-side (tiny shuffle), and the orderBy window runs
    # single-partition over #buckets SUMMARY rows — bounded by
    # construction, not by data size.
    w_prefix = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        base.groupBy(_PID)
        .agg(F.sum(value_col).alias("__bsum"))
        .select(
            _PID,
            F.coalesce(F.sum("__bsum").over(w_prefix), F.lit(0)).alias(_OFFSET),
        )
    )

    # Local cumsum per bucket (parallel window) + broadcast offsets back:
    # BroadcastHashJoin streams the fact side with NO exchange, so the
    # value-bucketed shape's only full shuffle is the window's.
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.sum(F.col(value_col)).over(w_local) + F.col(_OFFSET))
        .drop(_PID, _OFFSET)
    )
