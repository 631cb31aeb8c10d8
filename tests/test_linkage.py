"""Edit-distance record linkage (operators/linkage.py): symmetric-delete
blocking must be COMPLETE for edit distance <= 1 — the fuzzy_name_pairs
oracle is the brute-force N^2 join, so any missed candidate is a hash
mismatch. These tests pin the completeness argument on adversarial
cases (edits at the FIRST character, where naive prefix blocking
fails), the soundness filter, the guards, and the no-cartesian plan."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.linkage import (
    deletion_variants,
    fuzzy_pairs,
)


def _pairs(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    return {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs(df, "id", "t").collect()
    }


def _lev(a, b):
    # textbook DP, the reference implementation for the exhaustive check
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


def test_completeness_first_char_edits(spark):
    """Substitution, insertion, and deletion at position 0 — the cases
    any prefix-blocking scheme misses by construction."""
    texts = ["smith", "Smith", "mith", "asmith"]
    got = _pairs(spark, texts)
    assert got[(0, 1)] == 1  # first-char substitution
    assert got[(0, 2)] == 1  # first-char deletion
    assert got[(0, 3)] == 1  # first-char insertion


def test_exhaustive_parity_with_dp_levenshtein(spark):
    """Every pair of short strings over a tiny alphabet: the operator's
    pair set must equal the brute-force DP-levenshtein <= 1 set exactly
    (completeness AND soundness in one sweep)."""
    texts = [
        "".join(p)
        for n in (1, 2, 3)
        for p in itertools.product("ab", repeat=n)
    ] + ["", "aaaa", "abab"]
    got = set(_pairs(spark, texts))
    want = {
        (i, j)
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if _lev(texts[i], texts[j]) <= 1
    }
    assert got == want


def test_distance_two_pairs_excluded(spark):
    got = _pairs(spark, ["abcd", "abef", "wxyz"])
    assert got == {}  # abcd vs abef is distance 2; wxyz unrelated


def test_duplicate_texts_pair_at_distance_zero(spark):
    got = _pairs(spark, ["same", "same", "samx"])
    assert got[(0, 1)] == 0
    assert got[(0, 2)] == 1 and got[(1, 2)] == 1


def test_null_rows_dropped_and_max_len_guard(spark):
    df = spark.createDataFrame(
        [(1, "ok"), (2, None), (None, "ok")], "id long, t string"
    )
    out = fuzzy_pairs(df, "id", "t").collect()
    assert out == []  # only one usable row -> no pairs
    long_df = spark.createDataFrame([(1, "x" * 65), (2, "y")], "id long, t string")
    with pytest.raises(Exception, match="longer than 64"):
        fuzzy_pairs(long_df, "id", "t").collect()


def test_deletion_variants_content(spark):
    row = (
        spark.range(1)
        .select(deletion_variants(F.lit("aab")).alias("v"))
        .collect()[0]
    )
    # identity + distinct single deletions (deleting either 'a' of the
    # "aa" prefix collapses to one variant)
    assert set(row["v"]) == {"aab", "ab", "aa"}
    assert len(row["v"]) == 3  # deduplicated


def test_plan_no_cartesian_no_udf(spark):
    df = spark.createDataFrame([(1, "ab")], "id long, t string")
    plan = (
        fuzzy_pairs(df, "id", "t")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# fuzzy_join (two-table lookup)
# ---------------------------------------------------------------------------


def test_fuzzy_join_best_only_prefers_exact(spark):
    """A dirty name with both an exact and a one-edit reference match
    keeps only the exact one under best_only; a typo'd name gets its
    one-edit correction; an unmatchable name drops (inner
    semantics)."""
    from ghcn_d_etl_project_spark.operators.linkage import fuzzy_join

    dirty = spark.createDataFrame(
        [(1, "smith"), (2, "smth"), (3, "qqqqq")],
        "fact_id long, name string",
    )
    ref = spark.createDataFrame(
        [(10, "smith"), (11, "smiths"), (12, "jones")],
        "ref_id long, ref_name string",
    )
    out = {
        r["fact_id"]: (r["ref_id"], r["dist"])
        for r in fuzzy_join(dirty, ref, "name", "ref_name").collect()
    }
    assert out[1] == (10, 0)  # exact beats the one-edit "smiths"
    assert out[2] == (10, 1)  # dropped-letter typo corrected
    assert 3 not in out
    # note: a transposition ("smiht") is levenshtein distance 2 and is
    # correctly OUT of scope for this operator (Damerau is not claimed)


def test_fuzzy_join_all_matches_without_best_only(spark):
    from ghcn_d_etl_project_spark.operators.linkage import fuzzy_join

    dirty = spark.createDataFrame([(1, "smith")], "fact_id long, name string")
    ref = spark.createDataFrame(
        [(10, "smith"), (11, "smiths"), (12, "smit")],
        "ref_id long, ref_name string",
    )
    out = fuzzy_join(dirty, ref, "name", "ref_name", best_only=False)
    assert sorted((r["ref_id"], r["dist"]) for r in out.collect()) == [
        (10, 0), (11, 1), (12, 1),
    ]


def test_fuzzy_join_duplicate_left_rows_each_matched(spark):
    """Rows sharing a text all get the match (candidates are keyed on
    the distinct text, then joined back)."""
    from ghcn_d_etl_project_spark.operators.linkage import fuzzy_join

    dirty = spark.createDataFrame(
        [(1, "abc"), (2, "abc")], "fact_id long, name string"
    )
    ref = spark.createDataFrame([(10, "abd")], "ref_id long, ref_name string")
    out = fuzzy_join(dirty, ref, "name", "ref_name").collect()
    assert sorted(r["fact_id"] for r in out) == [1, 2]
    assert all(r["dist"] == 1 for r in out)


def test_fuzzy_join_rejects_column_overlap(spark):
    from ghcn_d_etl_project_spark.operators.linkage import fuzzy_join

    a = spark.createDataFrame([(1, "x")], "id long, name string")
    b = spark.createDataFrame([(2, "y")], "id long, ref string")
    with pytest.raises(ValueError, match="disjoint"):
        fuzzy_join(a, b, "name", "ref")
    with pytest.raises(ValueError, match="missing text column"):
        fuzzy_join(a, b.withColumnRenamed("id", "rid"), "nope", "ref")
