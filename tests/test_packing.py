"""Sequence-packing laws (operators/packing.py).

FFD placement is sequential per bucket, so the registry query is
rows-only; these tests ARE its correctness contract: exactly-once
assignment, the budget ceiling, determinism under repartitioning, the
FFD hand case, the overlong-singleton flag, and the packing-efficiency
bound FFD guarantees.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.packing import pack_sequences


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, n long")


def test_ffd_hand_case_single_bucket(spark):
    """Budget 10, sizes [7, 5, 4, 3, 1]: FFD packs [7,3], [5,4,1] —
    two sequences, zero waste on the second."""
    df = _df(spark, [(1, 7), (2, 5), (3, 4), (4, 3), (5, 1)])
    out = pack_sequences(df, "id", "n", budget=10, n_buckets=1).collect()
    by_seq = {}
    for r in out:
        by_seq.setdefault(r["seq"], []).append(r["id"])
    assert sorted(map(sorted, by_seq.values())) == [[1, 4], [2, 3, 5]]
    assert all(r["truncate"] == 0 for r in out)
    assert all(r["bucket"] == 0 for r in out)


def test_exactly_once_and_budget_ceiling(spark):
    import random

    rng = random.Random(77)
    rows = [(i, rng.randrange(1, 120)) for i in range(1, 501)]
    df = _df(spark, rows)
    out = pack_sequences(df, "id", "n", budget=128, n_buckets=8)
    got = out.collect()
    assert sorted(r["id"] for r in got) == [i for i, _ in rows]  # exactly once
    per_seq = (
        out.groupBy("seq_id")
        .agg(F.sum("n_tokens").alias("t"), F.max("truncate").alias("tr"))
        .collect()
    )
    assert all(r["t"] <= 128 for r in per_seq if r["tr"] == 0)


def test_overlong_doc_singleton_flagged(spark):
    df = _df(spark, [(1, 300), (2, 50), (3, 60)])
    out = pack_sequences(df, "id", "n", budget=128, n_buckets=1).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["truncate"] == 1
    # the overlong singleton shares its sequence with nobody
    assert sum(1 for r in out if r["seq"] == by_id[1]["seq"]) == 1
    assert by_id[2]["truncate"] == 0 and by_id[3]["truncate"] == 0
    # 50 + 60 fit one sequence together
    assert by_id[2]["seq"] == by_id[3]["seq"]


def test_determinism_under_repartitioning(spark):
    import random

    rng = random.Random(5)
    rows = [(i, rng.randrange(1, 90)) for i in range(1, 301)]
    outs = []
    for parts in (1, 11):
        df = _df(spark, rows).repartition(parts)
        out = pack_sequences(df, "id", "n", budget=100, n_buckets=4)
        outs.append(sorted(map(tuple, out.collect())))
    assert outs[0] == outs[1]


def test_ffd_efficiency_bound_per_bucket(spark):
    """Sequences used per bucket <= 11/9 * OPT-lower-bound + 1 — the
    FFD guarantee (with ceil(tokens/budget) as the OPT lower bound)."""
    import random

    rng = random.Random(13)
    rows = [(i, rng.randrange(1, 100)) for i in range(1, 801)]
    out = pack_sequences(_df(spark, rows), "id", "n", budget=128, n_buckets=4)
    per_bucket = (
        out.filter(F.col("truncate") == 0)
        .groupBy("bucket")
        .agg(
            F.count_distinct("seq").alias("n_seqs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .collect()
    )
    assert len(per_bucket) == 4
    for r in per_bucket:
        lb = math.ceil(r["tokens"] / 128)
        assert r["n_seqs"] <= math.ceil(11 / 9 * lb) + 1, r


def test_null_and_nonpositive_tokens_excluded(spark):
    rows = [(1, 10), (2, None), (None, 5), (3, 0), (4, -2), (5, 3)]
    out = pack_sequences(_df(spark, rows), "id", "n", budget=16, n_buckets=1)
    assert sorted(r["id"] for r in out.collect()) == [1, 5]


def test_seq_id_globally_unique(spark):
    rows = [(i, 40) for i in range(1, 101)]
    out = pack_sequences(_df(spark, rows), "id", "n", budget=64, n_buckets=8)
    pairs = out.select("bucket", "seq", "seq_id").distinct().collect()
    assert len({r["seq_id"] for r in pairs}) == len(
        {(r["bucket"], r["seq"]) for r in pairs}
    )


def test_validation(spark):
    df = _df(spark, [(1, 1)])
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "id", "n", budget=0)
    with pytest.raises(ValueError, match="n_buckets"):
        pack_sequences(df, "id", "n", budget=8, n_buckets=0)
