"""Declarative expectations runner (operators/expectations.py). The
oracle query (expectations_orders) hash-checks the six-check suite
against DuckDB on clean data; these tests plant VIOLATIONS of every
kind (the driver tables are clean, so failure paths only exist here),
pin the NULL conventions, the declared report order, validation, and
the fused-pass plan shape (one scan for all non-FK checks).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.expectations import (
    Expectation as E,
    run_expectations,
)


def _dirty(spark):
    rows = [
        (1, "ok", 5.0, 10),
        (1, "ok", -2.0, 20),      # duplicate id, out-of-range v
        (None, "bad value", 3.0, 30),   # null id, rejected status, regex fail
        (4, None, None, 99),      # nulls skipped by value checks; orphan fk
    ]
    return spark.createDataFrame(rows, "id long, status string, v double, fk long")


def _parent(spark):
    return spark.createDataFrame([(10,), (20,), (30,)], "pk long")


SUITE = [
    lambda p: E.not_null("id"),
    lambda p: E.unique("id"),
    lambda p: E.accepted_values("status", ["ok", "meh"]),
    lambda p: E.in_range("v", 0.0, 10.0),
    lambda p: E.regex_match("status", r"^[a-z]+$"),
    lambda p: E.foreign_key("fk", p, "pk"),
]


def _run(spark):
    p = _parent(spark)
    out = run_expectations(_dirty(spark), [mk(p) for mk in SUITE])
    return out, {r["check_id"]: r for r in out.collect()}


def test_every_kind_counts_its_violations(spark):
    _, got = _run(spark)
    assert got["not_null:id"]["n_violations"] == 1          # the None id
    assert got["unique:id"]["n_violations"] == 1            # one surplus "1"; the lone NULL is a distinct value
    assert got["accepted_values:status"]["n_violations"] == 1  # 'bad value'
    assert got["in_range:v"]["n_violations"] == 1           # -2.0
    assert got["regex_match:status"]["n_violations"] == 1   # 'bad value' (space)
    assert got["foreign_key:fk"]["n_violations"] == 1       # 99
    assert all(r["n_rows"] == 4 for r in got.values())
    assert not any(r["passed"] for r in got.values())


def test_null_conventions(spark):
    """NULLs: counted ONLY by not_null; skipped by value checks and FK;
    counted as a value by unique (two NULL ids are duplicates)."""
    df = spark.createDataFrame(
        [(None, None, None), (None, None, None)], "id long, v double, fk long"
    )
    p = _parent(spark)
    out = {
        r["check_id"]: r
        for r in run_expectations(
            df,
            [
                E.not_null("id"),
                E.unique("id"),
                E.in_range("v", 0.0, 1.0),
                E.foreign_key("fk", p, "pk"),
            ],
        ).collect()
    }
    assert out["not_null:id"]["n_violations"] == 2
    assert out["unique:id"]["n_violations"] == 1  # NULL == NULL for unique
    assert out["in_range:v"]["n_violations"] == 0
    assert out["foreign_key:fk"]["n_violations"] == 0
    assert out["in_range:v"]["passed"] and out["foreign_key:fk"]["passed"]


def test_report_order_is_declaration_order(spark):
    out, _ = _run(spark)
    assert [r["check_id"].split(":")[0] for r in out.collect()] == [
        "not_null", "unique", "accepted_values", "in_range",
        "regex_match", "foreign_key",
    ]


def test_clean_data_passes(spark):
    df = spark.createDataFrame([(1, "ok", 5.0, 10), (2, "meh", 7.0, 20)],
                               "id long, status string, v double, fk long")
    p = _parent(spark)
    out = run_expectations(df, [mk(p) for mk in SUITE]).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in out)


def test_validation(spark):
    df, p = _dirty(spark), _parent(spark)
    with pytest.raises(ValueError, match="empty"):
        run_expectations(df, [])
    with pytest.raises(ValueError, match="not in input"):
        run_expectations(df, [E.not_null("nope")])
    with pytest.raises(ValueError, match="duplicate"):
        run_expectations(df, [E.not_null("id"), E.not_null("id")])
    with pytest.raises(ValueError, match="non-empty"):
        E.accepted_values("status", [])
    with pytest.raises(ValueError, match="hi >= lo"):
        E.in_range("v", 5.0, 1.0)
    with pytest.raises(ValueError, match="pattern"):
        E.regex_match("status", "")


def test_fused_plan_scans_once_without_fk(spark):
    """All row-local checks + unique must compile to ONE scan of the
    input — the whole point vs the reference's job-per-metric loop."""
    df = _dirty(spark)
    out = run_expectations(
        df,
        [
            E.not_null("id"),
            E.unique("id"),
            E.accepted_values("status", ["ok"]),
            E.in_range("v", 0.0, 10.0),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1
    assert "Join" not in plan


def test_fk_total_scan_reads_zero_columns(spark):
    """The FK row's n_rows references the fused aggregate; Catalyst
    prunes it to a ZERO-COLUMN count — over parquet that is footer
    metadata, not a data re-read. Pin on the registered query: exactly
    one orders scan reads data columns per purpose (fused checks wide,
    FK probe key-only) and the total scan's ReadSchema is empty."""
    import contextlib
    import io
    import re

    from ghcn_d_etl_project_spark.plans import all_queries

    df = all_queries()["expectations_orders"].fn(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", buf.getvalue())
    orders_scans = [s for s in schemas if "c_custkey" not in s]
    assert sorted(len(s) > 0 for s in orders_scans) == [False, True, True]
    wide = max(orders_scans, key=len)
    assert "o_orderstatus" in wide and "o_totalprice" in wide
