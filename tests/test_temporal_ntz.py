"""TIMESTAMP_NTZ robustness + testdata schema canary.

Round-4 postmortem: the driver regenerated testdata with tz-less
``timestamp[us]`` parquet, which Spark reads as TIMESTAMP_NTZ — a type
``unix_micros`` and ``withWatermark`` reject — and the failure surfaced as
six scattered AnalysisExceptions. These tests pin the two contracts that
prevent a recurrence:

1. the IO boundary (``load_table``) always delivers the documented dtypes
   for every driver table, whatever physical encoding the parquet carries
   (canary: a drift fails HERE, by name, pointing at the loader);
2. the temporal operators (``range_join_pairs``, ``asof_join``) work on an
   NTZ frame fed directly, without the loader in between.
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.joins import asof_join, range_join_pairs
from ghcn_d_etl_project_spark.sources.readers import load_table, normalize_temporal
from tests.conftest import SF_DIR

# The loader's output contract, per table. If the driver regenerates the
# parquet with a new physical shape (nanos-as-long, timestamp_ntz, ...),
# load_table must still produce EXACTLY these dtypes — a mismatch here is
# a loader bug (or a brand-new shape to normalize), not a downstream one.
EXPECTED_DTYPES = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


_SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if Path(d).exists()
] or [SF_DIR]


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED_DTYPES))
def test_loaded_schema_canary(spark, table, sf_dir):
    """Cheap at every SF (dtypes touch only parquet footers): the driver
    runs correctness at sf0.01 and bench at sf0.1, so a drift in ANY of
    the three directories must fail here by name."""
    got = dict(load_table(spark, sf_dir, table).dtypes)
    assert got == EXPECTED_DTYPES[table], (
        f"load_table({table!r}) dtype drift at {sf_dir} — the driver's "
        f"parquet encoding changed and sources/readers.py:load_table did "
        f"not normalize it. got={got} want={EXPECTED_DTYPES[table]}"
    )


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _ntz(df, *cols):
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


def test_normalize_temporal_casts_ntz_only(spark):
    df = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:05"), "x")], "id long, ts timestamp, s string"
    )
    ntz = _ntz(df, "ts")
    assert dict(ntz.dtypes)["ts"] == "timestamp_ntz"
    out = normalize_temporal(ntz)
    assert dict(out.dtypes) == {"id": "bigint", "ts": "timestamp", "s": "string"}
    # no-op on an already-normalized frame (no extra projection layers)
    assert normalize_temporal(df) is df or dict(normalize_temporal(df).dtypes) == dict(df.dtypes)
    assert out.collect()[0].ts == _ts("2024-01-01T00:00:05")  # UTC session: wall-clock kept


def test_range_join_pairs_accepts_ntz_frame(spark):
    rows = [
        ("a", 1, _ts("2024-01-01T00:00:00")),
        ("a", 2, _ts("2024-01-01T00:00:30")),
        ("a", 3, _ts("2024-01-01T00:02:00")),
        ("b", 4, _ts("2024-01-01T00:00:10")),
    ]
    df = _ntz(
        spark.createDataFrame(rows, "k string, id long, ts timestamp"), "ts"
    )
    got = {
        (r.k, r.id1, r.id2, r.gap_micros)
        for r in range_join_pairs(df, "k", "ts", "id", 60.0).collect()
    }
    # only (1,2) is within 60s on key a; key b has a single event
    assert got == {("a", 1, 2, 30_000_000)}


def test_asof_join_tolerance_accepts_ntz_frames(spark):
    left = _ntz(
        spark.createDataFrame(
            [(1, _ts("2024-01-01T01:00:00")), (2, _ts("2024-01-01T09:00:00"))],
            "id long, ts timestamp",
        ).withColumn("key", F.lit("k")),
        "ts",
    )
    right = _ntz(
        spark.createDataFrame(
            [(_ts("2024-01-01T00:59:00"), 10.0)], "rts timestamp, payload double"
        ).withColumn("key", F.lit("k")),
        "rts",
    )
    out = {
        r.id: r.asof_payload
        for r in asof_join(
            left, right, on="key", left_ts="ts", right_ts="rts",
            right_payload=["payload"], tolerance_seconds=3600.0,
        ).collect()
    }
    # id=1 matches (59s-old right row within 1h); id=2's only candidate is
    # 8h old — tolerance nulls it out
    assert out == {1: 10.0, 2: None}


def test_load_table_warns_once_on_timezone_takeover(spark):
    """The UTC pin is a session-wide side effect; when it actually
    CHANGES the session timezone a one-time warning must surface it
    (ADVICE r5: action-at-a-distance hazard for foreign sessions)."""
    import warnings

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        load_table._tz_warned = False
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            load_table(spark, SF_DIR, "region")
        msgs = [str(x.message) for x in w if "timeZone" in str(x.message)]
        assert msgs, "expected a timezone-takeover warning"
        assert "America/New_York" in msgs[0]
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        # second call from an already-UTC session: silent
        with warnings.catch_warnings(record=True) as w2:
            warnings.simplefilter("always")
            load_table(spark, SF_DIR, "region")
        assert not [x for x in w2 if "timeZone" in str(x.message)]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
        load_table._tz_warned = False
