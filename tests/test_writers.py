"""Partitioned-writer semantics (reference S10-S13): hive layout,
dynamic partition choice, file-count/size control, inputFiles
introspection, and read-back equality."""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.plans._util import t
from ghcn_d_etl_project_spark.sources.writers import (
    pick_partition_columns,
    write_partitioned,
)
from tests.conftest import SF_DIR

TMP = Path(__file__).resolve().parents[1] / ".tmp" / "writer_tests"


def _fresh(name: str) -> str:
    p = TMP / name
    if p.exists():
        shutil.rmtree(p)
    return str(p)


def test_partitioned_layout_and_roundtrip(spark):
    path = _fresh("orders_by_year_month")
    orders = t(spark, SF_DIR, "orders").withColumn(
        "year", F.year("o_orderdate")
    ).withColumn("month", F.month("o_orderdate"))
    write_partitioned(orders, path, partition_by=["year", "month"])
    dirs = {d.name for d in Path(path).iterdir() if d.is_dir()}
    assert all(d.startswith("year=") for d in dirs)
    months = [m for d in Path(path).glob("year=*/month=*") for m in [d]]
    assert months, "no hive month directories"
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # partition pruning: a year/month predicate must prune directories
    plan = (
        back.filter((F.col("year") == 2023) & (F.col("month") == 1))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan
    assert "year" in plan.split("PartitionFilters")[1][:200]


def test_dynamic_partition_choice():
    assert pick_partition_columns(["a", "year", "month"]) == ["year", "month"]
    assert pick_partition_columns(["a", "year"]) == ["year"]
    assert pick_partition_columns(["a", "b"]) == []


def test_file_count_control(spark):
    path = _fresh("compact_export")
    li = t(spark, SF_DIR, "lineitem")
    write_partitioned(li, path, target_files=1)
    files = [f for f in Path(path).glob("*.parquet")]
    assert len(files) == 1
    assert spark.read.parquet(path).count() == li.count()


def test_max_records_per_file(spark):
    path = _fresh("split_export")
    li = t(spark, SF_DIR, "lineitem")
    n = li.count()
    write_partitioned(li, path, target_files=1, max_records_per_file=max(n // 4, 1))
    back = spark.read.parquet(path)
    # S13: physical-file introspection via inputFiles
    assert len(back.inputFiles()) >= 4
    assert back.count() == n


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    sort-merge join with NO Exchange on either side — the layout that
    deletes the shuffle from a recurring 100 TB join."""
    from ghcn_d_etl_project_spark.sources.writers import write_bucketed

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path}'")
    try:
        orders = t(spark, SF_DIR, "orders")
        cust = t(spark, SF_DIR, "customer")
        write_bucketed(
            orders, "bktdb.orders_b", ["o_custkey"], 8, sort_by=["o_custkey"]
        )
        write_bucketed(
            cust, "bktdb.customer_b", ["c_custkey"], 8, sort_by=["c_custkey"]
        )
        a = spark.table("bktdb.orders_b")
        b = spark.table("bktdb.customer_b")
        joined = a.hint("merge").join(b, a.o_custkey == b.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:1500]}"
        # sanity: same result as the plain-path join
        plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bktdb.orders_b")
        spark.sql("DROP TABLE IF EXISTS bktdb.customer_b")
        spark.sql("DROP DATABASE IF EXISTS bktdb")


def test_clustered_layout_disjoint_ranges(spark, tmp_path):
    """Range clustering must give files pairwise-disjoint key ranges —
    the property parquet min/max skipping needs to prune scans."""
    from pyspark.sql import functions as F

    from ghcn_d_etl_project_spark.sources.writers import write_clustered

    out = str(tmp_path / "orders_clustered")
    orders = t(spark, SF_DIR, "orders")
    write_clustered(orders, out, ["o_orderdate"], target_files=8)

    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("o_orderdate").alias("lo"),
            F.max("o_orderdate").alias("hi"),
        )
        .collect()
    )
    assert len(per_file) >= 4
    ranges = sorted((r.lo, r.hi) for r in per_file)
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1
        assert lo2 > hi1, f"overlapping file ranges: {hi1} vs {lo2}"


def test_zorder_files_bound_both_dims(spark, tmp_path):
    """Z-ordering must bound BOTH key dimensions per file: every file's
    (x, y) bounding box is much smaller than the global range in both
    axes — single-key range clustering leaves the second axis at full
    width, so this separates the two layouts."""
    from pyspark.sql import functions as F

    from ghcn_d_etl_project_spark.sources.writers import write_zordered

    out = str(tmp_path / "li_zordered")
    li = t(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    write_zordered(li, out, "l_orderkey", "l_partkey", target_files=16)

    back = spark.read.parquet(out)
    assert back.count() == li.count()
    glob = li.agg(
        (F.max("l_orderkey") - F.min("l_orderkey")).alias("rx"),
        (F.max("l_partkey") - F.min("l_partkey")).alias("ry"),
    ).first()
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("rx"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("ry"),
        )
        .collect()
    )
    assert len(per_file) >= 8
    avg_rx = sum(r.rx for r in per_file) / len(per_file)
    avg_ry = sum(r.ry for r in per_file) / len(per_file)
    # 16 files over a 2-D curve -> each axis should shrink well below
    # the global span on average (a 1-D sort keeps one axis at ~100%)
    assert avg_rx < 0.6 * glob.rx, (avg_rx, glob.rx)
    assert avg_ry < 0.6 * glob.ry, (avg_ry, glob.ry)


def test_zorder_empty_input_and_typed_keys(spark, tmp_path):
    """Edge contracts: an empty input short-circuits to a plain write
    (min/max are NULL — nothing to scale by), date keys scale through
    their epoch, and a string key is rejected up front with TypeError
    instead of exploding mid-job."""
    import pytest

    from ghcn_d_etl_project_spark.sources.writers import write_zordered

    li = t(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_shipdate", "l_returnflag"
    )

    empty_out = str(tmp_path / "z_empty")
    write_zordered(li.filter(F.lit(False)), empty_out, "l_orderkey", "l_partkey")
    assert spark.read.parquet(empty_out).count() == 0

    date_out = str(tmp_path / "z_date")
    write_zordered(li.limit(1000), date_out, "l_shipdate", "l_orderkey", target_files=4)
    assert spark.read.parquet(date_out).count() == 1000

    with pytest.raises(TypeError, match="l_returnflag"):
        write_zordered(li, str(tmp_path / "z_bad"), "l_orderkey", "l_returnflag")


def test_zorder_key_known_codes(spark):
    """Morton interleave, hand-computed: a-bits land on even positions,
    b-bits on odd; bits above 15 are dropped."""
    from ghcn_d_etl_project_spark.sources.writers import zorder_key

    rows = [(1, 0), (0, 1), (3, 5), (65535, 65535), (1 << 16, 0)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [
        r["z"]
        for r in df.select(zorder_key(F.col("a"), F.col("b")).alias("z"))
        .collect()
    ]
    assert got == [1, 2, 39, (1 << 32) - 1, 0]


def test_zorder_audit_buckets_bound_both_dims(spark):
    """The registered zorder_layout_audit query's law: bucket = top 4
    Morton bits = top 2 bits of EACH scaled dimension, so every
    bucket's span is < 2^14 in BOTH dims — the two-sided bound a
    single-column sort cannot give."""
    from ghcn_d_etl_project_spark.plans import all_queries

    rows = all_queries()["zorder_layout_audit"].fn(spark, SF_DIR).collect()
    assert len(rows) >= 4
    assert all(r["span_a"] < (1 << 14) and r["span_b"] < (1 << 14) for r in rows)
