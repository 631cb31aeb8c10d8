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

    ``fmt="delta"`` mirrors the reference's persistent layer
    (``bronze_processor.py:126-142``): the writer passes Delta's
    ``optimizeWrite``/``autoCompact`` options through. Requires the
    delta-spark package on the cluster — use ``delta_available`` to probe;
    on parquet those jobs are done by the repartition/maxRecordsPerFile
    combination instead.
    """
    if partition_by:
        out = df.repartition(*partition_by)
    elif target_files:
        out = df.coalesce(target_files)
    else:
        out = df
    writer = out.write.mode(mode)
    if fmt == "delta":
        writer = writer.option("optimizeWrite", "true").option("autoCompact", "true")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def delta_available() -> bool:
    """True when the delta-spark package is importable.

    Import-try gate (SURVEY: Delta is the reference's table format but is
    an optional extra here; everything falls back to parquet)."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


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


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    target_files: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Range-clustered layout for min/max data skipping.

    ``repartitionByRange`` + ``sortWithinPartitions`` on the cluster
    keys gives every output file a narrow, DISJOINT key range, so
    parquet footer min/max statistics let any reader prune most files
    for point and range predicates — the dominant scan-cost lever for a
    100 TB time- or key-filtered table, and the vanilla-Spark analog of
    Delta ``OPTIMIZE ... ZORDER BY`` for single-dimension keys (the
    reference leaves its Delta tables unclustered,
    ``bronze_processor.py:126-142``). Disjointness is pinned by
    ``tests/test_writers.py::test_clustered_layout_disjoint_ranges``.

    Range boundaries are computed by sampling (one extra job); equal
    keys always land in the same file.
    """
    n = target_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )


def _morton16(a, b):
    """Interleave the low 16 bits of two long columns (Morton / Z-order
    code). Statically unrolled shift/or chain — pure codegen, 16 steps."""
    from pyspark.sql import functions as F

    code = F.lit(0).cast("long")
    for i in range(16):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        code = (
            code
            .bitwiseOR(F.shiftleft(bit_a, 2 * i))
            .bitwiseOR(F.shiftleft(bit_b, 2 * i + 1))
        )
    return code


def zorder_key(a, b):
    """Public Morton-code surface: interleave the low 16 bits of two
    long columns into one Z-order key (``z = ...b1a1b0a0``). Pure
    whole-stage-codegen bit arithmetic — usable as a clustering key
    (``write_zordered``), a range-bucketing key, or a sort key; points
    close in (a, b) space land close on the curve, so any downstream
    range grouping bounds BOTH dimensions per group. Bits above 15 are
    ignored — scale or modulo keys into [0, 65536) first."""
    return _morton16(a, b)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    target_files: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Two-dimensional Z-order clustering for min/max data skipping.

    ``write_clustered`` on one key leaves the OTHER dimension spread
    across the full range in every file, so predicates on it prune
    nothing. Z-ordering interleaves the bits of both (rank-normalized)
    keys into a Morton code and range-clusters on that — each file then
    covers a small bounding BOX in (a, b) space, so min/max footer stats
    prune scans for predicates on EITHER column — what Delta's
    ``OPTIMIZE ... ZORDER BY`` does, built from vanilla Spark ops.

    Keys are min/max-scaled to 16 bits with ONE distributed aggregate
    (the constants ride along as literals — no window, no global sort;
    a global ``ntile`` rank would funnel every row through a single
    task). Heavily skewed value distributions would crowd the curve —
    the production upgrade is equi-depth boundaries from
    ``df.stat.approxQuantile`` instead of linear scaling, same Morton
    step. Pinned by
    ``tests/test_writers.py::test_zorder_files_bound_both_dims``.

    Cluster keys must be numeric, date, or timestamp (date/timestamp are
    rank-scaled through their epoch values); other types raise
    ``TypeError`` up front rather than failing mid-job. An empty input
    (or all-NULL keys — no min/max to scale by) short-circuits to a
    plain write: there is nothing to cluster.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dtypes = {f.name: f.dataType for f in df.schema.fields}

    def numeric_key(name: str):
        dt = dtypes.get(name)
        if isinstance(dt, T.NumericType):
            return F.col(name)
        if isinstance(dt, T.DateType):
            return F.unix_date(F.col(name))
        if isinstance(dt, T.TimestampType):
            return F.col(name).cast("double")
        if isinstance(dt, T.TimestampNTZType):
            # NTZ has no direct numeric cast; routing through TIMESTAMP
            # (session tz) is monotonic, which is all scaling needs.
            return F.col(name).cast("timestamp").cast("double")
        raise TypeError(
            f"write_zordered cluster key {name!r} must be numeric/date/"
            f"timestamp, got {dt.simpleString() if dt else 'missing column'}"
        )

    key_a, key_b = numeric_key(col_a), numeric_key(col_b)
    n = target_files or df.sparkSession.sparkContext.defaultParallelism
    top = (1 << 16) - 1
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(key_a), F.max(key_a), F.min(key_b), F.max(key_b)
    ).first()
    if lo_a is None or lo_b is None:
        df.write.mode(mode).format(fmt).save(path)
        return

    def scaled(c, lo, hi):
        span = float(hi - lo) or 1.0
        return F.least(
            F.lit(top),
            ((c - F.lit(lo)).cast("double") / span * top).cast("long"),
        )

    coded = df.withColumn(
        "__z", _morton16(scaled(key_a, lo_a, hi_a), scaled(key_b, lo_b, hi_b))
    )
    (
        coded.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Bucketed (hash-clustered) table write — the co-located-join layout.

    Both sides of a recurring equi-join written with the same
    ``bucket_by``/``num_buckets`` join WITHOUT a shuffle: the scan's
    bucketing satisfies the join's required distribution, so the
    exchange (the dominant cost of a 100 TB x 100 TB join) disappears
    from the plan entirely — pinned by
    ``tests/test_writers.py::test_bucketed_join_is_shuffle_free``.
    ``sort_by`` additionally pre-sorts within buckets, removing the
    sort-merge join's per-task sort. Bucketing requires the table
    catalog (``saveAsTable``), not a bare path write; pass ``path`` to
    control the physical location (external table).

    The reference stores layers as plain Delta paths and re-shuffles on
    every join (``bronze_processor.py:126-142``); bucketing is the
    vanilla-Spark upgrade for join-heavy marts.
    """
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
