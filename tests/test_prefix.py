"""Distributed global prefix sum: exactness vs the naive single-partition
window on both plan shapes, and the scale pins that justify its existence
(bounded SinglePartition exchange, broadcast offsets join)."""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.prefix import global_cumsum
from ghcn_d_etl_project_spark.plans import all_queries
from tests.conftest import SF_DIR


def _naive(df, order_col, value_col):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    return {
        r[0]: r[1]
        for r in df.withColumn("cum", F.sum(value_col).over(w))
        .select(order_col, "cum")
        .collect()
    }


def _mk(spark):
    import random

    rng = random.Random(11)
    # sparse, unordered, negative-and-positive keys; values incl. zero
    rows = [(k, rng.randrange(0, 50)) for k in rng.sample(range(-500, 4000), 700)]
    return spark.createDataFrame(rows, "k long, v long").repartition(7)


def test_bucketed_matches_naive_window(spark):
    df = _mk(spark)
    want = _naive(df, "k", "v")
    got = {
        r.k: r.cum
        for r in global_cumsum(df, "k", "v", bucket_width=64).collect()
    }
    assert got == want


def test_quantile_shape_matches_naive_window(spark):
    df = _mk(spark)
    want = _naive(df, "k", "v")
    out = global_cumsum(df, "k", "v", num_partitions=5)
    got = {r.k: r.cum for r in out.collect()}
    assert got == want
    # buckets are value-derived: no range-sampled exchange may appear
    # (repartitionByRange boundaries are re-sampled per evaluation and
    # can disagree between the offsets and fact branches)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" not in plan
    # the fact-side cumsum window shuffles hash-on-bucket, never globally
    assert "Exchange hashpartitioning(__cumsum_bucket" in plan


def test_single_bucket_degenerate(spark):
    df = _mk(spark)
    want = _naive(df, "k", "v")
    got = {
        r.k: r.cum
        for r in global_cumsum(df, "k", "v", num_partitions=1).collect()
    }
    assert got == want


def test_null_order_keys_excluded(spark):
    df = spark.createDataFrame(
        [(1, 10), (None, 99), (2, 5)], "k long, v long"
    )
    out = global_cumsum(df, "k", "v", bucket_width=10).collect()
    assert {r.k: r.cum for r in out} == {1: 10, 2: 15}


def test_token_shards_plan_is_scale_shaped(spark):
    """The registered shard-packing query must keep the prefix sum
    distributed: the ONLY single-partition exchange is the exclusive
    prefix over bucket TOTALS (bounded summary rows), the local cumsum
    window shuffles hash-on-bucket, and the offsets return via a
    broadcast join (fact side unshuffled)."""
    old = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    try:
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
        df = all_queries()["token_shards"].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    assert plan.count("Exchange SinglePartition") == 1, plan[:2000]
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the corpus-side scan reads only (doc_id, text)
    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert m is not None
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols <= {"doc_id", "text"}, cols


# -- property: both plan shapes equal the sequential prefix sum on
# arbitrary unique-key input (hypothesis; few examples — each runs real
# Spark jobs)

from hypothesis import given, settings, strategies as st  # noqa: E402

_KV = st.lists(
    st.tuples(
        st.integers(min_value=-(2**20), max_value=2**20),
        st.integers(min_value=-1000, max_value=1000),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda kv: kv[0],
)


@settings(max_examples=8, deadline=None)
@given(_KV, st.booleans())
def test_cumsum_property_matches_sequential(spark, kv, bucketed):
    df = spark.createDataFrame(kv, "k long, v long")
    out = global_cumsum(
        df, "k", "v", bucket_width=257 if bucketed else None, num_partitions=3
    )
    got = {r.k: r.cum for r in out.collect()}
    run, want = 0, {}
    for k, v in sorted(kv):
        run += v
        want[k] = run
    assert got == want


def test_shard_packed_training_export(spark, tmp_path):
    """End-to-end shard materialization: token_shards assignment joined
    back onto the corpus, written one file per shard directory via
    write_partitioned (repartition on shard_id → each hive dir gets
    exactly one parquet part), and the round trip preserves every doc
    with its shard."""
    from ghcn_d_etl_project_spark.plans._util import t
    from ghcn_d_etl_project_spark.sources.writers import write_partitioned

    shards = all_queries()["token_shards"].fn(spark, SF_DIR)
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    packed = docs.join(shards.select("doc_id", "shard_id"), "doc_id")
    out = tmp_path / "shards"
    write_partitioned(packed, str(out), partition_by=["shard_id"])

    dirs = [p for p in out.iterdir() if p.name.startswith("shard_id=")]
    assert dirs, list(out.iterdir())
    for d in dirs:
        parts = [q for q in d.iterdir() if q.name.endswith(".parquet")]
        assert len(parts) == 1, (d.name, len(parts))
    back = spark.read.parquet(str(out))
    assert back.count() == docs.count()
    assert {"doc_id", "text", "shard_id"} <= set(back.columns)


def test_multi_column_cumsum_matches_two_single_calls(spark):
    """The multi-column form (added for ks_drift) must equal running the
    operator once per column — same buckets, same order, one pass."""
    import pytest

    df = _mk(spark).withColumn("w", (F.col("v") * 3 + F.col("k") % 5))
    both = global_cumsum(
        df, "k", ["v", "w"], ["cv", "cw"], bucket_width=10.0
    )
    v_only = global_cumsum(df, "k", "v", "cv", bucket_width=10.0)
    w_only = global_cumsum(df, "k", "w", "cw", bucket_width=10.0)
    got = {r["k"]: (r["cv"], r["cw"]) for r in both.collect()}
    want_v = {r["k"]: r["cv"] for r in v_only.collect()}
    want_w = {r["k"]: r["cw"] for r in w_only.collect()}
    assert got == {k: (want_v[k], want_w[k]) for k in want_v}
    with pytest.raises(ValueError, match="zip"):
        global_cumsum(df, "k", ["v", "w"], "cv", bucket_width=10.0)
