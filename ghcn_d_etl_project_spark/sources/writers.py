"""Writers: partitioned parquet sinks with file-count / file-size control.

Reference analogs:
  * partitioned Delta overwrite with ``optimizeWrite``/``autoCompact``
    (``src/transform/bronze_processor.py:126-142``,
    ``src/utils/spark_utils.py:36-50``) — vanilla-Spark equivalent is a
    pre-write ``repartition(partition_cols)`` plus
    ``spark.sql.files.maxRecordsPerFile``.
  * dynamic partition-column choice (``gold_processor.py:240-266``).
  * file-count control via ``coalesce(n)`` before write
    (``notebooks/04_gold_processing.py:148-154``).

Scale notes: repartitioning BY the partition columns before a partitioned
write is the difference between (tasks x partitions) small files and one
file per partition-value per bucket — at 100 TB the former melts the
namenode. ``max_records_per_file`` bounds individual file size without a
second compaction pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    target_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Partitioned columnar write with small-file mitigation.

    If ``partition_by`` is given, rows are shuffled onto their partition
    values first so each hive directory receives a bounded file count. If
    ``target_files`` is given (non-partitioned exports), ``coalesce``
    avoids a shuffle while capping output files.
    """
    if partition_by:
        out = df.repartition(*partition_by)
    elif target_files:
        out = df.coalesce(target_files)
    else:
        out = df
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def pick_partition_columns(
    columns: list[str], candidates: tuple[tuple[str, ...], ...] = (("year", "month"), ("year",))
) -> list[str]:
    """Dynamic partition choice: first candidate fully present in ``columns``.

    Mirrors the reference's gold-writer logic (``gold_processor.py:240-266``)
    which picks ``[year, month]`` / ``[year]`` / none based on the mart's
    schema.
    """
    colset = set(columns)
    for cand in candidates:
        if set(cand) <= colset:
            return list(cand)
    return []
