"""Point-in-time dimension lookup (operators/joins.py:
point_in_time_join). The oracle query (point_in_time_features)
hash-checks the full construction against DuckDB; these pin the
interval semantics on hand-built histories — half-open boundaries,
open current rows, no-future-leakage NULLs, the overlapping-history
duplication contract — and the equi-join physical shape.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.joins import point_in_time_join

TS = dt.datetime


def _dim(spark):
    rows = [
        (1, TS(2024, 1, 1), TS(2024, 2, 1), "v1"),
        (1, TS(2024, 2, 1), None, "v2"),          # open current row
        (2, TS(2024, 6, 1), None, "w1"),
    ]
    return spark.createDataFrame(
        rows, "key long, valid_from timestamp, valid_to timestamp, attr string"
    )


def _fact(spark, rows):
    return spark.createDataFrame(rows, "fid long, key long, ts timestamp")


def test_half_open_boundaries_and_open_row(spark):
    facts = _fact(spark, [
        (10, 1, TS(2024, 1, 1)),    # exactly valid_from -> matches v1
        (11, 1, TS(2024, 1, 15)),   # inside v1
        (12, 1, TS(2024, 2, 1)),    # exactly v1's valid_to -> v2, NOT v1
        (13, 1, TS(2030, 1, 1)),    # far future -> open row v2
    ])
    got = {
        r["fid"]: r["attr"]
        for r in point_in_time_join(facts, _dim(spark), "key", "ts").collect()
    }
    assert got == {10: "v1", 11: "v1", 12: "v2", 13: "v2"}


def test_no_future_leakage_nulls(spark):
    """A fact BEFORE the key's first version must keep NULL attributes —
    using the later version would leak the future into training data."""
    facts = _fact(spark, [(20, 1, TS(2023, 12, 31)), (21, 9, TS(2024, 1, 1))])
    out = {r["fid"]: r for r in point_in_time_join(facts, _dim(spark), "key", "ts").collect()}
    assert out[20]["attr"] is None and out[20]["valid_from"] is None
    assert out[21]["attr"] is None  # unknown key preserved too
    inner = point_in_time_join(facts, _dim(spark), "key", "ts", how="inner")
    assert inner.count() == 0


def test_overlapping_history_duplicates_loudly(spark):
    """Two versions valid at once (corrupt SCD2) duplicate the fact row
    — surfaced, not silently collapsed."""
    dim = spark.createDataFrame(
        [(1, TS(2024, 1, 1), None, "a"), (1, TS(2024, 1, 2), None, "b")],
        "key long, valid_from timestamp, valid_to timestamp, attr string",
    )
    facts = _fact(spark, [(30, 1, TS(2024, 3, 1))])
    out = point_in_time_join(facts, dim, "key", "ts").collect()
    assert sorted(r["attr"] for r in out) == ["a", "b"]


def test_payload_default_and_collision(spark):
    facts = _fact(spark, [(40, 1, TS(2024, 1, 15))])
    out = point_in_time_join(facts, _dim(spark), "key", "ts")
    assert out.columns == ["fid", "key", "ts", "valid_from", "valid_to", "attr"]
    clash = facts.withColumnRenamed("fid", "attr")
    with pytest.raises(ValueError, match="collides"):
        point_in_time_join(clash, _dim(spark), "key", "ts")
    with pytest.raises(ValueError, match="how"):
        point_in_time_join(facts, _dim(spark), "key", "ts", how="full")


def test_plan_is_equi_join_on_key(spark):
    """Catalyst must extract the key equality as the join key (hash or
    sort-merge join) with the interval predicate as a condition — a
    BroadcastNestedLoopJoin/CartesianProduct would mean the range
    predicate swallowed the equi part and the join is O(n*m)."""
    facts = _fact(spark, [(50, 1, TS(2024, 1, 15))])
    plan = (
        point_in_time_join(facts, _dim(spark), "key", "ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )
