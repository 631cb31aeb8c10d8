"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input is under-partitioned for the cluster.

    Expression-heavy operators (minhash signatures, all-pairs cosine) are
    CPU-bound maps/joins: a single-file local scan gives them ONE input
    partition and therefore one core, regardless of cluster size. On a
    real 100 TB layout the scan arrives in thousands of splits and this
    is a no-op (getNumPartitions >= parallelism → returned unchanged);
    it only pays one narrow shuffle when the source is pathologically
    under-split relative to the session's default parallelism.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
