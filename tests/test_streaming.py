"""Structured Streaming semantics tests: the window operators registered
(and oracle-checked) in batch mode must produce the SAME answers when run
as real streams — readStream parquet source, event-time watermark, memory
sink — plus the applyInPandasWithState custom stateful operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.plans._util import dsum
from ghcn_d_etl_project_spark.streaming.incremental import read_events_stream
from ghcn_d_etl_project_spark.streaming.stateful import running_totals
from ghcn_d_etl_project_spark.streaming.windows import (
    session_window_agg,
    tumbling_window_agg,
)
from tests.conftest import SF_DIR
from tests.oracle_check import compare_frames


def _events_stream(spark):
    """events.parquet as a file-source stream, via the package's own
    reader so tests exercise the SAME temporal normalization
    (nanos-as-long + timestamp_ntz) the pipelines use."""
    return read_events_stream(spark, SF_DIR)


def _events_batch(spark):
    from ghcn_d_etl_project_spark.plans._util import t

    return t(spark, SF_DIR, "events")


def _aggs():
    return [
        F.count(F.lit(1)).cast("long").alias("n_events"),
        dsum("value").alias("total_value"),
    ]


def _run_to_memory(df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


def test_streaming_tumbling_matches_batch(spark):
    """Tumbling windows over a stream (with watermark) converge to the
    batch answer once all data is processed."""
    stream_agg = tumbling_window_agg(
        _events_stream(spark), "ts", "1 hour", ["event_type"], _aggs(),
        watermark="2 hours",
    )
    _run_to_memory(stream_agg, "tumbling_stream", "complete")
    got = spark.sql("SELECT * FROM tumbling_stream").toPandas()
    want = tumbling_window_agg(
        _events_batch(spark), "ts", "1 hour", ["event_type"], _aggs()
    ).toPandas()
    problems = compare_frames(got, want)
    assert not problems, "\n".join(problems)


def test_streaming_sliding_matches_batch(spark):
    """Sliding windows (1h duration, 30-min slide — each event in 2
    windows) through the real streaming path converge to the batch
    answer, completing stream-mode coverage of all three window
    families (tumbling/sliding/session)."""
    from ghcn_d_etl_project_spark.streaming.windows import sliding_window_agg

    stream_agg = sliding_window_agg(
        _events_stream(spark), "ts", "1 hour", "30 minutes", ["event_type"],
        _aggs(), watermark="2 hours",
    )
    _run_to_memory(stream_agg, "sliding_stream", "complete")
    got = spark.sql("SELECT * FROM sliding_stream").toPandas()
    want = sliding_window_agg(
        _events_batch(spark), "ts", "1 hour", "30 minutes", ["event_type"], _aggs()
    ).toPandas()
    problems = compare_frames(got, want)
    assert not problems, "\n".join(problems)


def test_streaming_session_matches_batch(spark):
    """Session windows (30-min gap, per user) through the streaming path
    equal the batch gaps-and-islands-verified answer."""
    stream_agg = session_window_agg(
        _events_stream(spark), "ts", "30 minutes", ["user_id"], _aggs(),
        watermark="1 hour",
    )
    _run_to_memory(stream_agg, "session_stream", "complete")
    got = spark.sql("SELECT * FROM session_stream").toPandas()
    want = session_window_agg(
        _events_batch(spark), "ts", "30 minutes", ["user_id"], _aggs()
    ).toPandas()
    problems = compare_frames(got, want)
    assert not problems, "\n".join(problems)


def test_stateful_running_totals(spark):
    """applyInPandasWithState running totals: after the stream drains,
    per-user state equals the batch groupBy totals."""
    out = running_totals(_events_stream(spark), "user_id", "value")
    _run_to_memory(out, "running_totals", "update")
    got = (
        spark.sql(
            # update mode may emit a row per micro-batch; keep the last
            # per key (final state)
            "SELECT user_id, n_events, total_value FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn"
            "  FROM running_totals) WHERE rn = 1"
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        _events_batch(spark)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    pd.testing.assert_series_equal(
        got["total_value"], want["total_value"], rtol=1e-9
    )


# ---------------------------------------------------------------------------
# streaming dedup (r9): dropDuplicatesWithinWatermark wrapper
# ---------------------------------------------------------------------------


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    """Duplicates arriving in a LATER micro-batch (within the watermark
    horizon) are suppressed: two files, maxFilesPerTrigger=1, the second
    re-delivers ids 1-2 with fresh payloads — output must hold exactly
    one row per id, and it must be the FIRST arrival's payload."""
    import datetime as dt

    from ghcn_d_etl_project_spark.streaming.dedup import dedup_stream

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    f1 = [(1, base, "first-1"), (2, base + dt.timedelta(seconds=30), "first-2")]
    f2 = [
        (1, base + dt.timedelta(minutes=1), "dup-1"),
        (2, base + dt.timedelta(minutes=1), "dup-2"),
        (3, base + dt.timedelta(minutes=2), "first-3"),
    ]
    src = tmp_path / "dedup_src"
    spark.createDataFrame(f1, "id long, ts timestamp, payload string").coalesce(
        1
    ).write.parquet(str(src / "b1"))
    spark.createDataFrame(f2, "id long, ts timestamp, payload string").coalesce(
        1
    ).write.parquet(str(src / "b2"))

    sdf = (
        spark.readStream.schema("id long, ts timestamp, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = dedup_stream(sdf, ["id"], "ts", delay="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {
        r["id"]: r["payload"]
        for r in spark.sql("SELECT * FROM dedup_stream_t").collect()
    }
    assert rows == {1: "first-1", 2: "first-2", 3: "first-3"}


def test_streaming_dedup_validation(spark):
    from ghcn_d_etl_project_spark.streaming.dedup import dedup_stream

    sdf = spark.readStream.format("rate").load()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup_stream(sdf, [], "timestamp")


def test_stream_dedup_against_reference(spark):
    """The stream-STATIC fingerprint gate must pass exactly the docs
    whose normalized content is absent from the static reference —
    including punctuation/case-only twins (the normalization case) —
    and agree with the batch anti-join on the same frames."""
    from ghcn_d_etl_project_spark.operators.textops import fingerprint
    from ghcn_d_etl_project_spark.streaming.dedup import (
        dedup_stream_against_reference,
    )

    docs_schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    stream = (
        spark.readStream.schema(docs_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
    )
    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # reference = 60% of the corpus BY CONTENT (plus a formatting twin
    # to prove the gate keys on normalized content, not raw bytes)
    ref = batch.filter(F.col("doc_id") % 5 < 3).select("doc_id", "text")
    ref_twisted = ref.withColumn("text", F.upper(F.col("text")))
    out = dedup_stream_against_reference(
        stream, ref_twisted, "doc_id", "text"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ref_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM ref_gate").collect()}
    expect = {
        r.doc_id
        for r in batch.withColumn("__fp", fingerprint(F.col("text")))
        .join(
            ref_twisted.select(fingerprint("text").alias("__fp")).distinct(),
            "__fp",
            "left_anti",
        )
        .collect()
    }
    assert got == expect
    # uppercase twins of reference docs were dropped despite raw bytes
    # differing -> the gate is on normalized content
    dropped = {r.doc_id for r in batch.collect()} - got
    assert dropped == {
        r.doc_id for r in batch.filter(F.col("doc_id") % 5 < 3).collect()
    }


def test_neardup_gate_stream_matches_batch_operator(spark, tmp_path):
    """The foreachBatch near-dup gate (banded batch operator + a
    reference index built ONCE before the query) must emit exactly the
    batch operator's verdict rows for the same input/reference frames —
    verdicts are per-document, so micro-batch partitioning is
    invisible. Also checks the gate released its persisted reference
    substrates after termination."""
    from ghcn_d_etl_project_spark.operators.dedup import (
        dedup_against_reference,
    )
    from ghcn_d_etl_project_spark.streaming.dedup import neardup_gate_stream

    docs_schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    jsc = spark.sparkContext._jsc.sc()
    cached_before = jsc.getPersistentRDDs().size()
    ref = batch.filter(F.col("doc_id") % 10 != 7).select("doc_id", "text")
    new_stream = (
        spark.readStream.schema(docs_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
        .filter(F.col("doc_id") % 10 == 7)
        .select("doc_id", "text")
    )
    out_dir = str(tmp_path / "verdicts")
    neardup_gate_stream(
        new_stream, ref, "doc_id", "text",
        out_dir=out_dir,
        checkpoint_path=str(tmp_path / "ckpt"),
        await_seconds=180,
    )
    got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    rel: list = []
    expect = {
        tuple(r)
        for r in dedup_against_reference(
            batch.filter(F.col("doc_id") % 10 == 7).select("doc_id", "text"),
            ref, "doc_id", "text", release_into=rel,
        ).collect()
    }
    for f in rel:
        f.unpersist()
    assert got == expect and len(got) > 0
    # the gate's finally-block unpersisted the reference index
    assert jsc.getPersistentRDDs().size() <= cached_before, (
        "gate leaked cached substrates"
    )


def test_ingest_gate_stream_composes_rules_and_dedup(spark, tmp_path):
    """The composed admission gate (Gopher rules -> banded dedup) must
    emit exactly the batch composition's rows for the same frames, one
    verdict per arriving doc: rule rejects carry 'rule:<first failing>'
    with NULL dup fields, rule survivors carry the three-way dedup
    verdict, and admit marks exactly the 'clean' rows. Also pins that
    the gate released every persisted substrate."""
    from pyspark.sql import functions as F

    from ghcn_d_etl_project_spark.streaming.quality import (
        _gate_batch,
        ingest_gate_stream,
    )

    docs_schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    jsc = spark.sparkContext._jsc.sc()
    cached_before = jsc.getPersistentRDDs().size()
    ref = batch.filter(F.col("doc_id") % 10 != 7).select("doc_id", "text")
    new_batch = batch.filter(F.col("doc_id") % 10 == 7).select(
        "doc_id", "text"
    )
    new_stream = (
        spark.readStream.schema(docs_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
        .filter(F.col("doc_id") % 10 == 7)
        .select("doc_id", "text")
    )
    out_dir = str(tmp_path / "verdicts")
    ingest_gate_stream(
        new_stream, ref, "doc_id", "text",
        out_dir=out_dir,
        checkpoint_path=str(tmp_path / "ckpt"),
        await_seconds=180,
    )
    got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    rel: list = []
    expect_df = _gate_batch(
        new_batch, ref, "doc_id", "text",
        n=4, threshold=0.5, n_hashes=64, bands=32,
        ref_index=None, ref_fingerprints=None, release_into=rel,
    )
    expect = {tuple(r) for r in expect_df.collect()}
    for f in rel:
        f.unpersist()
    assert got == expect and len(got) > 0
    # every arriving doc got exactly one verdict
    assert len({t[0] for t in got}) == new_batch.count() == len(got)
    # the gate is a real partition: some rule rejects, some admits
    verdicts = {t[1] for t in got}
    assert any(v.startswith("rule:") for v in verdicts)
    assert "clean" in verdicts
    for t in got:
        if t[1].startswith("rule:"):
            assert t[2] is None and t[3] is None and t[4] is False
        if t[1] == "clean":
            assert t[4] is True
    assert jsc.getPersistentRDDs().size() <= cached_before, (
        "gate leaked cached substrates"
    )
