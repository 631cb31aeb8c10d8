"""Streaming CDC apply: a change stream maintained onto a versioned
snapshot via foreachBatch + merge_upsert — batch collapse, cross-run
ordering, checkpointed exactly-once drains, replay idempotence, and
version pruning."""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.streaming.cdc import (
    cdc_apply_batch,
    cdc_apply_stream,
    init_snapshot,
    latest_change_per_key,
    read_snapshot,
)

TMP = Path(__file__).resolve().parents[1] / ".tmp" / "cdc_stream_tests"

CH_SCHEMA = "k long, new_bal double, is_delete boolean, seq long"


def _reset():
    if TMP.exists():
        shutil.rmtree(TMP)
    TMP.mkdir(parents=True)
    return TMP


def _init(spark, snap_dir):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    init_snapshot(base, snap_dir)
    return base


def _kw():
    return dict(
        key="k",
        seq_col="seq",
        set_cols={"bal": "new_bal"},
        insert_defaults={"name": F.lit("NEW")},
        delete_col="is_delete",
    )


def test_latest_change_per_key_collapses_by_seq(spark):
    ch = spark.createDataFrame(
        [(1, 11.0, False, 5), (1, 99.0, False, 9), (2, 0.0, True, 1)],
        CH_SCHEMA,
    )
    got = {r.k: (r.new_bal, r.is_delete) for r in
           latest_change_per_key(ch, "k", "seq").collect()}
    assert got == {1: (99.0, False), 2: (0.0, True)}


def test_cdc_stream_maintains_snapshot_across_runs(spark):
    """Two cron-cadence drains: batch 1 updates k1 (two changes — seq
    collapse keeps the later), deletes k2, inserts k9; batch 2 re-inserts
    k2 and re-prices k9. Final snapshot must equal applying the same
    collapsed batches sequentially with batch-mode merge_upsert."""
    root = _reset()
    snap, ckpt, changes = str(root / "snap"), str(root / "ckpt"), root / "ch"
    changes.mkdir()
    _init(spark, snap)

    b1 = spark.createDataFrame(
        [(1, 11.0, False, 1), (1, 15.0, False, 2), (2, 0.0, True, 3),
         (9, 99.0, False, 4)],
        CH_SCHEMA,
    )
    b1.coalesce(1).write.parquet(str(changes / "batch1"))
    schema = spark.read.parquet(str(changes / "batch1")).schema
    stream = spark.readStream.schema(schema).parquet(str(changes / "*"))
    cdc_apply_stream(stream, snap, checkpoint_path=ckpt, **_kw())

    got1 = {r.k: (r.name, r.bal) for r in read_snapshot(spark, snap).collect()}
    assert got1 == {1: ("a", 15.0), 3: ("c", 30.0), 9: ("NEW", 99.0)}

    b2 = spark.createDataFrame(
        [(2, 22.0, False, 5), (9, 100.0, False, 6)], CH_SCHEMA
    )
    b2.coalesce(1).write.parquet(str(changes / "batch2"))
    stream = spark.readStream.schema(schema).parquet(str(changes / "*"))
    cdc_apply_stream(stream, snap, checkpoint_path=ckpt, **_kw())

    got2 = {r.k: (r.name, r.bal) for r in read_snapshot(spark, snap).collect()}
    assert got2 == {
        1: ("a", 15.0),
        2: ("NEW", 22.0),
        3: ("c", 30.0),
        9: ("NEW", 100.0),
    }

    # exactly-once: a third drain with no new files moves nothing
    before = (Path(snap) / "_CURRENT").read_text()
    stream = spark.readStream.schema(schema).parquet(str(changes / "*"))
    cdc_apply_stream(stream, snap, checkpoint_path=ckpt, **_kw())
    assert (Path(snap) / "_CURRENT").read_text() == before

    # version pruning: at most keep_versions (default 2) survive
    versions = sorted(p.name for p in Path(snap).glob("v=*"))
    assert len(versions) <= 2 and before.strip() in versions


def test_cdc_batch_replay_is_idempotent(spark):
    """A replayed micro-batch (crash between pointer swap and offset
    commit) re-merges the same changes against the already-updated
    snapshot — values must not change, matching the documented
    effectively-exactly-once claim."""
    root = _reset()
    snap = str(root / "snap")
    _init(spark, snap)
    batch = spark.createDataFrame(
        [(1, 11.0, False, 1), (2, 0.0, True, 2), (9, 99.0, False, 3)],
        CH_SCHEMA,
    )
    cdc_apply_batch(batch, snap, **_kw())
    first = sorted(
        (r.k, r.name, r.bal) for r in read_snapshot(spark, snap).collect()
    )
    cdc_apply_batch(batch, snap, **_kw())  # replay
    second = sorted(
        (r.k, r.name, r.bal) for r in read_snapshot(spark, snap).collect()
    )
    assert first == second


def test_cdc_apply_never_shuffles_snapshot(spark):
    """The default broadcast strategy inside the apply must keep the
    merge plan free of SortMergeJoin/ShuffledHashJoin (the snapshot is
    scanned, never shuffled) — same pin as the batch operator, asserted
    through the streaming-facing path's building blocks."""
    root = _reset()
    snap = str(root / "snap")
    _init(spark, snap)
    from ghcn_d_etl_project_spark.operators.cdc import merge_upsert

    target = read_snapshot(spark, snap)
    batch = spark.createDataFrame([(1, 11.0, False, 1)], CH_SCHEMA)
    collapsed = latest_change_per_key(batch, "k", "seq").drop("seq")
    merged = merge_upsert(
        target, collapsed, key="k", set_cols={"bal": "new_bal"},
        delete_col="is_delete", strategy="broadcast",
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_scd2_stream_builds_history_across_runs(spark):
    """Streaming SCD2: two cron-cadence drains build full attribute
    lineage — batch 1 re-prices k1 (close + open), batch 2 re-prices it
    again (second close + open) and opens a fresh key. Final history must
    equal applying the same collapsed batches sequentially with
    batch-mode scd2_apply."""
    import datetime as dt

    from ghcn_d_etl_project_spark.streaming.cdc import scd2_apply_stream

    root = _reset()
    hist_dir, ckpt, changes = str(root / "hist"), str(root / "ck2"), root / "ch2"
    changes.mkdir()
    base = spark.createDataFrame(
        [(1, 10.0, dt.datetime(2024, 1, 1), None),
         (2, 20.0, dt.datetime(2024, 1, 1), None)],
        "k long, bal double, valid_from timestamp, valid_to timestamp",
    )
    init_snapshot(base, hist_dir)

    sch = "k long, bal double, eff_ts timestamp, seq long"
    b1 = spark.createDataFrame(
        [(1, 11.0, dt.datetime(2024, 2, 1), 1),
         (1, 15.0, dt.datetime(2024, 2, 2), 2)],  # collapse keeps seq=2
        sch,
    )
    b1.coalesce(1).write.parquet(str(changes / "b1"))
    schema = spark.read.parquet(str(changes / "b1")).schema
    stream = spark.readStream.schema(schema).parquet(str(changes / "*"))
    scd2_apply_stream(
        stream, hist_dir, key="k", attrs=["bal"], seq_col="seq",
        checkpoint_path=ckpt,
    )

    b2 = spark.createDataFrame(
        [(1, 30.0, dt.datetime(2024, 3, 1), 3),
         (9, 90.0, dt.datetime(2024, 3, 1), 4)],
        sch,
    )
    b2.coalesce(1).write.parquet(str(changes / "b2"))
    stream = spark.readStream.schema(schema).parquet(str(changes / "*"))
    scd2_apply_stream(
        stream, hist_dir, key="k", attrs=["bal"], seq_col="seq",
        checkpoint_path=ckpt,
    )

    got = sorted(
        (r.k, r.bal, r.valid_from, r.valid_to)
        for r in read_snapshot(spark, hist_dir).collect()
    )
    assert got == [
        (1, 10.0, dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 2)),
        (1, 15.0, dt.datetime(2024, 2, 2), dt.datetime(2024, 3, 1)),
        (1, 30.0, dt.datetime(2024, 3, 1), None),
        (2, 20.0, dt.datetime(2024, 1, 1), None),
        (9, 90.0, dt.datetime(2024, 3, 1), None),
    ]
    # one current row per key; exactly-once on an empty re-drain
    before = (Path(hist_dir) / "_CURRENT").read_text()
    stream = spark.readStream.schema(schema).parquet(str(changes / "*"))
    scd2_apply_stream(
        stream, hist_dir, key="k", attrs=["bal"], seq_col="seq",
        checkpoint_path=ckpt,
    )
    assert (Path(hist_dir) / "_CURRENT").read_text() == before


def test_snapshot_time_travel_and_compaction(spark):
    """Versioned-store completeness: read_snapshot(version=N) time-travels
    to any retained version (pruned versions raise with the retained
    list), and compact_snapshot rewrites the current version into a
    bounded file count without changing its rows."""
    from ghcn_d_etl_project_spark.streaming.cdc import compact_snapshot

    root = _reset()
    snap = str(root / "snap")
    _init(spark, snap)
    b1 = spark.createDataFrame([(1, 11.0, False, 1)], CH_SCHEMA)
    cdc_apply_batch(b1, snap, keep_versions=3, **_kw())

    # time travel: v0 still has the original balance, v1 the update
    assert {r.bal for r in read_snapshot(spark, snap, version=0)
            .filter(F.col("k") == 1).collect()} == {10.0}
    assert {r.bal for r in read_snapshot(spark, snap, version=1)
            .filter(F.col("k") == 1).collect()} == {11.0}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not retained"):
        read_snapshot(spark, snap, version=99)

    rows_before = sorted(
        (r.k, r.name, r.bal) for r in read_snapshot(spark, snap).collect()
    )
    compact_snapshot(spark, snap, num_files=1, keep_versions=2)
    compacted = read_snapshot(spark, snap)
    assert sorted(
        (r.k, r.name, r.bal) for r in compacted.collect()
    ) == rows_before
    assert len(compacted.inputFiles()) == 1
    assert (Path(snap) / "_CURRENT").read_text() == "v=2"
