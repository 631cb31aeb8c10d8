"""Burst collapse (operators/sessions.py:collapse_bursts). The oracle
query (collapse_error_bursts) hash-checks the construction against
DuckDB's row_number ladder; these pin the chained-burst semantics a lag
filter cannot express, keep=first/last, boundary and tie behavior,
validation, and the single-shuffle plan (the collapse reuses the
sessionize window's key partitioning).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.sessions import collapse_bursts

TS = dt.datetime


def _events(spark, rows):
    return spark.createDataFrame(rows, "id long, key long, ts timestamp")


def test_chained_burst_is_one_burst(spark):
    """Events at 0/4/8 minutes with a 5-minute gap: ends are 8 minutes
    apart but the chain is ONE burst — the defining property vs a
    drop-if-previous-raw-event-near lag filter (which would re-admit
    the 8-minute event after dropping its 4-minute predecessor)."""
    df = _events(spark, [
        (1, 1, TS(2024, 1, 1, 10, 0)),
        (2, 1, TS(2024, 1, 1, 10, 4)),
        (3, 1, TS(2024, 1, 1, 10, 8)),
        (4, 1, TS(2024, 1, 1, 11, 0)),   # new burst
    ])
    out = collapse_bursts(df, "key", "ts", gap_seconds=300, order_cols=("id",))
    got = sorted((r["id"], r["burst_size"]) for r in out.collect())
    assert got == [(1, 3), (4, 1)]


def test_keep_last_and_exact_gap_boundary(spark):
    """An exactly-gap-sized step stays in the burst (> not >=, matching
    sessionize); keep='last' flips the survivor."""
    df = _events(spark, [
        (1, 1, TS(2024, 1, 1, 10, 0, 0)),
        (2, 1, TS(2024, 1, 1, 10, 5, 0)),   # exactly 300s later
        (3, 1, TS(2024, 1, 1, 10, 5, 1)),
    ])
    first = collapse_bursts(df, "key", "ts", 300, ("id",), keep="first").collect()
    last = collapse_bursts(df, "key", "ts", 300, ("id",), keep="last").collect()
    assert [(r["id"], r["burst_size"]) for r in first] == [(1, 3)]
    assert [(r["id"], r["burst_size"]) for r in last] == [(3, 3)]


def test_timestamp_ties_break_on_order_cols(spark):
    df = _events(spark, [
        (7, 1, TS(2024, 1, 1, 10, 0)),
        (5, 1, TS(2024, 1, 1, 10, 0)),  # same ts, smaller id wins 'first'
    ])
    out = collapse_bursts(df, "key", "ts", 60, ("id",)).collect()
    assert [(r["id"], r["burst_size"]) for r in out] == [(5, 2)]


def test_keys_independent(spark):
    df = _events(spark, [
        (1, 1, TS(2024, 1, 1, 10, 0)),
        (2, 2, TS(2024, 1, 1, 10, 1)),  # other key: own burst
    ])
    out = collapse_bursts(df, "key", "ts", 300, ("id",))
    assert out.count() == 2


def test_validation(spark):
    df = _events(spark, [(1, 1, TS(2024, 1, 1))])
    with pytest.raises(ValueError, match="first\\|last"):
        collapse_bursts(df, "key", "ts", 60, keep="middle")
    with pytest.raises(ValueError, match="numeric"):
        collapse_bursts(
            df.withColumn("tag", F.lit("x")), "key", "ts", 60,
            order_cols=("tag",),
        )
    with pytest.raises(ValueError, match="burst_size"):
        collapse_bursts(df.withColumn("burst_size", F.lit(1)), "key", "ts", 60)


def test_single_shuffle_plan(spark):
    """hashpartitioning(key) from the sessionize window satisfies the
    (key, burst) collapse's clustering — exactly one Exchange, and the
    collapse partial-combines like survivorship."""
    df = _events(spark, [(1, 1, TS(2024, 1, 1))])
    plan = (
        collapse_bursts(df, "key", "ts", 60, ("id",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
