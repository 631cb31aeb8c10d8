"""Stream-stream interval join (streaming/joins.py): two real file-source
streams (views and clicks carved from the events table) joined on user
within a delay horizon must converge to the identical batch join, state
must stay bounded (watermark present on both sides), and malformed specs
(unbounded horizon, colliding columns) must be refused."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.streaming.incremental import read_events_stream
from ghcn_d_etl_project_spark.streaming.joins import stream_interval_join
from tests.conftest import SF_DIR
from tests.oracle_check import compare_frames


def _sides(df):
    views = df.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    clicks = df.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return views, clicks


def _batch_events(spark):
    from ghcn_d_etl_project_spark.plans._util import t

    return t(spark, SF_DIR, "events")


def test_stream_interval_join_converges_to_batch(spark):
    """availableNow drain of the streaming join == the batch join on the
    same rows (the operator is engine-portable: watermarks no-op in
    batch)."""
    sv, sc = _sides(read_events_stream(spark, SF_DIR))
    joined = stream_interval_join(
        sv, sc, on="user_id", left_ts="view_ts", right_ts="click_ts",
        max_delay_seconds=600, watermark="30 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM ssj_stream").toPandas()

    bv, bc = _sides(_batch_events(spark))
    want = stream_interval_join(
        bv, bc, on="user_id", left_ts="view_ts", right_ts="click_ts",
        max_delay_seconds=600, watermark="30 minutes",
    ).toPandas()
    assert len(got) > 0, "join produced nothing — fixture horizon too small"
    problems = compare_frames(got, want)
    assert not problems, "\n".join(problems)


def test_stream_interval_join_bounds_are_inclusive_and_ordered(spark):
    """A click exactly at view_ts and exactly at view_ts + horizon both
    match; one microsecond past the horizon or before the view does
    not."""
    import datetime as dt

    TS = dt.datetime
    views = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 0, 0), 10)],
        "user_id long, view_ts timestamp, view_id long",
    )
    clicks = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 0, 0, 0), 100),  # at view_ts: match
            (1, TS(2024, 1, 1, 0, 10, 0), 101),  # at horizon: match
            (1, TS(2024, 1, 1, 0, 10, 0, 1), 102),  # 1us past: no
            (1, TS(2023, 12, 31, 23, 59, 59), 103),  # before: no
            (2, TS(2024, 1, 1, 0, 0, 1), 104),  # other key: no
        ],
        "user_id long, click_ts timestamp, click_id long",
    )
    out = stream_interval_join(
        views, clicks, on="user_id", left_ts="view_ts",
        right_ts="click_ts", max_delay_seconds=600, watermark="1 hour",
    )
    assert sorted(r["click_id"] for r in out.collect()) == [100, 101]


def test_stream_interval_join_refuses_bad_specs(spark):
    import datetime as dt

    TS = dt.datetime
    a = spark.createDataFrame(
        [(1, TS(2024, 1, 1), 1)], "user_id long, t1 timestamp, x long"
    )
    b = spark.createDataFrame(
        [(1, TS(2024, 1, 1), 2)], "user_id long, t2 timestamp, y long"
    )
    with pytest.raises(ValueError, match="positive"):
        stream_interval_join(a, b, "user_id", "t1", "t2", 0, "1 hour")
    with pytest.raises(ValueError, match="distinct"):
        stream_interval_join(a, b, "user_id", "t1", "t1", 60, "1 hour")
    with pytest.raises(ValueError, match="how"):
        stream_interval_join(
            a, b, "user_id", "t1", "t2", 60, "1 hour", how="full_outer"
        )
    with pytest.raises(ValueError, match="disjoint"):
        stream_interval_join(
            a, b.withColumnRenamed("y", "x"),
            "user_id", "t1", "t2", 60, "1 hour",
        )


def test_stream_interval_left_outer_emits_unmatched(spark):
    """leftOuter: views with no click inside the horizon surface with
    NULL click columns after watermark expiry. Unmatched views within
    (watermark + horizon) of the end of input are UNDECIDED when an
    availableNow drain stops (their NULL result emits on the next run —
    see the operator docstring), so the comparison is over the decided
    region only; matched rows are compared in full by the inner-join
    convergence test above."""
    sv, sc = _sides(read_events_stream(spark, SF_DIR))
    joined = stream_interval_join(
        sv, sc, on="user_id", left_ts="view_ts", right_ts="click_ts",
        max_delay_seconds=300, watermark="10 minutes", how="leftOuter",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM ssj_outer").toPandas()
    bv, bc = _sides(_batch_events(spark))
    want_df = stream_interval_join(
        bv, bc, on="user_id", left_ts="view_ts", right_ts="click_ts",
        max_delay_seconds=300, watermark="10 minutes", how="leftOuter",
    )
    # the global watermark is the MIN of both sides' watermarks, so the
    # decided region ends (watermark + horizon) before the EARLIER of
    # the two sides' last events
    max_view = bv.agg(F.max("view_ts")).collect()[0][0]
    max_click = bc.agg(F.max("click_ts")).collect()[0][0]
    import datetime as dt

    cutoff = (
        min(max_view, max_click)
        - dt.timedelta(seconds=300)
        - dt.timedelta(minutes=10)
    )
    want = want_df.where(F.col("view_ts") <= F.lit(cutoff)).toPandas()
    got = got[got["view_ts"] <= cutoff]
    assert got["click_id"].isna().any(), "expected some unmatched views"
    problems = compare_frames(got, want)
    assert not problems, "\n".join(problems)
