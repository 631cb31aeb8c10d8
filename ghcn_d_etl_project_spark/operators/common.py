"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input is under-partitioned for the cluster.

    Expression-heavy operators (minhash signatures, all-pairs cosine) are
    CPU-bound maps/joins: a single-file local scan gives them ONE input
    partition and therefore one core, regardless of cluster size. On a
    real 100 TB layout the scan arrives in thousands of splits and this
    is a no-op (file count >= parallelism → returned unchanged);
    it only pays one narrow shuffle when the source is pathologically
    under-split relative to the session's default parallelism.

    The under-split probe uses ``df.inputFiles()`` (a metadata walk) rather
    than ``df.rdd.getNumPartitions()`` — the RDD conversion forces a full
    physical re-plan per call, which dominates small-SF driver runs. File
    count under-counts partitions for one giant splittable file, but that
    shape doesn't occur in either regime we care about (test data: small
    single files; 100 TB layouts: many files).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file-backed plan (e.g. createDataFrame input)
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df
