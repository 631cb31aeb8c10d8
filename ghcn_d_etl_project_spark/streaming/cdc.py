"""Streaming CDC apply: maintain a dimension snapshot from a change
stream via ``foreachBatch`` + :func:`operators.cdc.merge_upsert`.

The reference's only maintenance strategy is the full overwrite
(``src/utils/spark_utils.py:38-40`` — every layer rewrites its output
wholesale); its README lists incremental processing as future work
(reference README.md:309). This module is the always-on form of that
capability: each micro-batch of change rows is collapsed to the latest
change per key and MERGEd onto the current snapshot with the broadcast
arm-split (the snapshot is scanned, never shuffled — the batch is small
by construction).

Snapshot storage is a VERSIONED directory — copy-on-write parquet under
``v=N`` subdirectories with a ``_CURRENT`` pointer file — because plain
parquet cannot be overwritten while it is being read within the same
job. This is deliberately the format-agnostic core of what Delta/Iceberg
MERGE INTO does (new files + atomic metadata pointer swap); on a real
lakehouse deployment :func:`cdc_apply_batch` body becomes a one-line
``MERGE INTO`` and everything else here (pre-collapse, strategy, trigger
cadence) is unchanged.

Delivery semantics: Structured Streaming replays a micro-batch after a
crash (at-least-once into ``foreachBatch``), and the merge is IDEMPOTENT
for a replayed batch — re-updating a key to the same values, re-deleting
an absent key, and re-inserting a now-present key (which the merge turns
into an update to the same values) are all no-ops — so the snapshot
state is effectively exactly-once.

Scale notes: cost per batch is O(snapshot scan + |batch|), never a
snapshot shuffle (strategy="broadcast" default); state on the streaming
side is only the source offsets in the checkpoint. Old versions are
pruned down to ``keep_versions`` at each apply — bounded storage.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.cdc import merge_upsert

_POINTER = "_CURRENT"


def latest_change_per_key(
    changes: DataFrame, key: str | list[str], seq_col: str
) -> DataFrame:
    """Collapse a change batch to the LAST change per key (by ``seq_col``
    — a source offset / LSN / event timestamp). ``merge_upsert``'s
    contract is one change per key per batch; a CDC micro-batch can
    carry several. A ``seq_col`` TIE breaks via a monotonic id — stable
    within one execution but NOT across re-runs with a different
    partitioning, so sources that can emit equal sequence values for the
    same key should supply a genuinely total order (offset, LSN) rather
    than a coarse timestamp. One shuffle over the (small) batch only."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.monotonically_increasing_id().desc()
    )
    return (
        changes.withColumn("__cdc_rn", F.row_number().over(w))
        .filter(F.col("__cdc_rn") == 1)
        .drop("__cdc_rn")
    )


def _current_version(root: Path) -> int:
    return int((root / _POINTER).read_text().strip().split("=")[1])


def _commit_version(
    df: DataFrame, root: Path, version: int, keep_versions: int
) -> None:
    """Write ``df`` as ``v=version+1``, swap the pointer, prune old
    versions down to ``keep_versions``. Overwrite (not errorifexists):
    a replayed micro-batch that crashed between write and pointer swap
    must be able to rewrite its version."""
    new = f"v={version + 1}"
    df.write.mode("overwrite").parquet(str(root / new))
    (root / _POINTER).write_text(new)
    for old in sorted(
        (p for p in root.glob("v=*") if p.is_dir()),
        key=lambda p: int(p.name.split("=")[1]),
    )[: -keep_versions if keep_versions > 0 else None]:
        shutil.rmtree(old, ignore_errors=True)


def init_snapshot(df: DataFrame, snapshot_dir: str) -> None:
    """Materialize version 0 of a snapshot directory."""
    root = Path(snapshot_dir)
    df.write.mode("errorifexists").parquet(str(root / "v=0"))
    (root / _POINTER).write_text("v=0")


def read_snapshot(
    spark: SparkSession, snapshot_dir: str, version: int | None = None
) -> DataFrame:
    """Read the snapshot version the pointer currently names, or — time
    travel — an explicit retained ``version`` (bounded by
    ``keep_versions`` at apply time; asking for a pruned version raises
    with the retained list, not a bare path error)."""
    root = Path(snapshot_dir)
    if version is None:
        current = (root / _POINTER).read_text().strip()
        return spark.read.parquet(str(root / current))
    target = root / f"v={version}"
    if not target.is_dir():
        retained = sorted(
            int(p.name.split("=")[1]) for p in root.glob("v=*") if p.is_dir()
        )
        raise ValueError(
            f"snapshot version {version} not retained (have {retained}; "
            f"raise keep_versions to retain more)"
        )
    return spark.read.parquet(str(target))


def compact_snapshot(
    spark: SparkSession,
    snapshot_dir: str,
    num_files: int = 1,
    keep_versions: int = 2,
) -> None:
    """Rewrite the CURRENT version into ``num_files`` files as a new
    version (pointer-swapped like any apply). Every merge writes
    shuffle-partition-many files, so a long-lived snapshot accumulates
    small files that tax the scan side of every subsequent merge — the
    standard lakehouse OPTIMIZE/compact step, expressed on the same
    copy-on-write versioning. ``coalesce`` (not repartition): narrowing
    the file count must not shuffle the data it is trying to tidy."""
    root = Path(snapshot_dir)
    version = _current_version(root)
    df = spark.read.parquet(str(root / f"v={version}")).coalesce(num_files)
    _commit_version(df, root, version, keep_versions)


def cdc_apply_batch(
    batch: DataFrame,
    snapshot_dir: str,
    key: str | list[str],
    seq_col: str,
    set_cols: dict[str, str] | None = None,
    insert_defaults: dict[str, Column] | None = None,
    delete_col: str | None = None,
    strategy: str = "broadcast",
    keep_versions: int = 2,
) -> None:
    """Apply ONE batch of change rows onto the versioned snapshot:
    collapse to latest-per-key, merge (snapshot never shuffled under the
    default broadcast strategy), write ``v=N+1``, swap the pointer,
    prune old versions. Also usable directly from a batch job — the
    streaming entry point below is this function per micro-batch."""
    spark = batch.sparkSession
    root = Path(snapshot_dir)
    version = _current_version(root)
    target = spark.read.parquet(str(root / f"v={version}"))
    collapsed = latest_change_per_key(batch, key, seq_col).drop(seq_col)
    merged = merge_upsert(
        target,
        collapsed,
        key=key,
        set_cols=set_cols,
        insert_defaults=insert_defaults,
        delete_col=delete_col,
        strategy=strategy,
    )
    _commit_version(merged, root, version, keep_versions)


def cdc_apply_stream(
    changes: DataFrame,
    snapshot_dir: str,
    key: str | list[str],
    seq_col: str,
    checkpoint_path: str,
    set_cols: dict[str, str] | None = None,
    insert_defaults: dict[str, Column] | None = None,
    delete_col: str | None = None,
    strategy: str = "broadcast",
    keep_versions: int = 2,
    await_seconds: int = 300,
) -> None:
    """Drain a change STREAM onto the snapshot: one merge per
    micro-batch via ``foreachBatch``, exactly-once offsets via the
    checkpoint (``availableNow`` — the cron-cadence incremental pattern;
    a re-run with the same checkpoint processes zero new data)."""

    def apply(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        cdc_apply_batch(
            batch,
            snapshot_dir,
            key=key,
            seq_col=seq_col,
            set_cols=set_cols,
            insert_defaults=insert_defaults,
            delete_col=delete_col,
            strategy=strategy,
            keep_versions=keep_versions,
        )

    q = (
        changes.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(await_seconds)


def scd2_apply_batch(
    batch: DataFrame,
    history_dir: str,
    key: str | list[str],
    attrs: list[str],
    seq_col: str,
    eff_col: str = "eff_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    strategy: str = "broadcast",
    keep_versions: int = 2,
) -> None:
    """SCD2 twin of :func:`cdc_apply_batch`: apply one change batch onto
    a VERSIONED SCD2 history (close/open semantics via
    ``operators/cdc.py:scd2_apply``, broadcast arm-split by default so
    the history's current slice never shuffles). The batch is collapsed
    to the latest change per key first — scd2_apply's one-change-per-key
    micro-batch contract.

    Replay caveat (weaker than merge's idempotence): re-applying a batch
    whose attrs already landed is a no-op (identical change), but
    replays interleaved with OTHER successful batches can duplicate
    close/open pairs — real deployments key the version directory to the
    batch id (foreachBatch passes it) or use a table format's
    transactional MERGE. The streaming entry point below relies on the
    checkpoint to prevent cross-batch replays; same-batch crash replays
    are safe."""
    spark = batch.sparkSession
    root = Path(history_dir)
    version = _current_version(root)
    history = spark.read.parquet(str(root / f"v={version}"))
    from ghcn_d_etl_project_spark.operators.cdc import scd2_apply

    # scd2_apply projects only keys/attrs/eff_col from the change side,
    # so a distinct seq_col simply rides along un-consumed
    collapsed = latest_change_per_key(batch, key, seq_col)
    applied = scd2_apply(
        history,
        collapsed,
        key=key,
        attrs=attrs,
        eff_col=eff_col,
        valid_from=valid_from,
        valid_to=valid_to,
        strategy=strategy,
    )
    _commit_version(applied, root, version, keep_versions)


def scd2_apply_stream(
    changes: DataFrame,
    history_dir: str,
    key: str | list[str],
    attrs: list[str],
    seq_col: str,
    checkpoint_path: str,
    eff_col: str = "eff_ts",
    strategy: str = "broadcast",
    keep_versions: int = 2,
    await_seconds: int = 300,
) -> None:
    """Drain a change stream onto the versioned SCD2 history — one
    close/open application per micro-batch, exactly-once offsets via the
    checkpoint (availableNow cron-cadence, like :func:`cdc_apply_stream`)."""

    def apply(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        scd2_apply_batch(
            batch,
            history_dir,
            key=key,
            attrs=attrs,
            seq_col=seq_col,
            eff_col=eff_col,
            strategy=strategy,
            keep_versions=keep_versions,
        )

    q = (
        changes.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(await_seconds)
