"""Winnowing fingerprints (operators/dedup.py:winnow_fingerprints /
winnow_profile) and the Gopher rule gate (operators/textops.py:
gopher_rules) — hand-case semantics the sf-table oracles can't pin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_profile,
)
from ghcn_d_etl_project_spark.operators.textops import gopher_rules

K, W = 3, 4
GUARANTEE = W + K - 1  # shared token run length that must share a fp


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_winnow_guarantee_shared_run(spark):
    # Docs 0 and 1 share a run of exactly GUARANTEE tokens embedded in
    # otherwise-disjoint vocab; doc 2 is fully disjoint.
    run = " ".join(f"shared{i}" for i in range(GUARANTEE))
    df = _docs(
        spark,
        [
            f"alpha beta gamma {run} delta epsilon zeta",
            f"one two three four {run} five six",
            "p q r s t u v w x y z aa bb cc",
        ],
    )
    fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W)
    by_doc = {
        r["doc"]: set(r["s"])
        for r in fps.groupBy("doc")
        .agg(F.collect_set("fp").alias("s"))
        .collect()
    }
    assert by_doc[0] & by_doc[1], "guaranteed shared fingerprint missing"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])


def test_winnow_counts_and_density(spark):
    n_tok = 20
    df = _docs(spark, [" ".join(f"t{i}" for i in range(n_tok))])
    row = winnow_profile(df, "doc_id", "text", k=K, w=W).collect()[0]
    n_grams = n_tok - K + 1
    n_windows = n_grams - W + 1
    assert row["n_grams"] == n_grams
    assert row["n_windows"] == n_windows
    # selection keeps >= 1 and <= n_windows distinct minima; density
    # for random-ish hashes should land near 2/(w+1) but we only pin
    # the hard bounds here.
    assert 1 <= row["n_fp"] <= n_windows
    assert abs(row["fp_density"] - row["n_fp"] / n_windows) < 1e-6
    assert row["n_shared_fp"] == 0
    assert row["best_partner"] is None
    assert row["best_shared"] == 0


def test_winnow_short_docs_zero_rows_kept(spark):
    df = _docs(
        spark,
        [
            "a b",  # < k tokens: no grams
            "a b c d e",  # grams but < w windows? 3 grams < w=4
            "",  # empty
        ],
    )
    rows = {
        r["doc_id"]: r
        for r in winnow_profile(df, "doc_id", "text", k=K, w=W).collect()
    }
    assert set(rows) == {0, 1, 2}
    assert rows[0]["n_grams"] == 0 and rows[0]["n_windows"] == 0
    assert rows[1]["n_grams"] == 3 and rows[1]["n_windows"] == 0
    for i in (0, 1, 2):
        assert rows[i]["n_fp"] == 0
        assert rows[i]["fp_density"] is None
        assert rows[i]["best_partner"] is None
    # and the fingerprint set itself is empty for all three
    assert winnow_fingerprints(df, "doc_id", "text", k=K, w=W).count() == 0


def test_winnow_identical_docs_identical_fps_and_partner(spark):
    text = " ".join(f"w{i % 7}x{i}" for i in range(30))
    df = _docs(spark, [text, text, "totally different tokens here only " * 4])
    fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W)
    s0 = {r["fp"] for r in fps.filter("doc = 0").collect()}
    s1 = {r["fp"] for r in fps.filter("doc = 1").collect()}
    assert s0 == s1 and s0
    prof = {
        r["doc_id"]: r
        for r in winnow_profile(df, "doc_id", "text", k=K, w=W).collect()
    }
    assert prof[0]["best_partner"] == 1
    assert prof[1]["best_partner"] == 0
    assert prof[0]["best_shared"] == len(s0)
    assert prof[0]["n_shared_fp"] == len(s0)


def test_winnow_fps_subset_of_gram_hashes(spark):
    # soundness: every selected fingerprint is the hash of some gram of
    # the same doc (window minima can't invent values)
    df = _docs(spark, ["the quick brown fox jumps over the lazy dog " * 3])
    fps = {r["fp"] for r in winnow_fingerprints(df, "doc_id", "text", k=K, w=W).collect()}
    toks = df.collect()[0]["text"].lower().split()
    import hashlib

    grams = {
        int(
            hashlib.md5(" ".join(toks[i : i + K]).encode()).hexdigest()[:8],
            16,
        )
        for i in range(len(toks) - K + 1)
    }
    assert fps <= grams and fps


def test_winnow_max_df_excludes_boilerplate_partner(spark):
    # a fingerprint shared by ALL docs is boilerplate: with max_df=2 the
    # 3-way shared run can't nominate partners, the 2-way one still can
    common = " ".join(f"c{i}" for i in range(GUARANTEE))
    pairrun = " ".join(f"p{i}" for i in range(GUARANTEE))
    df = _docs(
        spark,
        [
            f"a1 a2 a3 {common} a4 a5 a6 {pairrun} a7",
            f"b1 b2 b3 {common} b4 b5 b6 {pairrun} b7",
            f"d1 d2 d3 {common} d4 d5 d6",
        ],
    )
    prof = {
        r["doc_id"]: r
        for r in winnow_profile(
            df, "doc_id", "text", k=K, w=W, max_df=2
        ).collect()
    }
    assert prof[0]["best_partner"] == 1
    assert prof[1]["best_partner"] == 0
    # doc 2 only shares df=3 boilerplate fingerprints -> no partner,
    # but n_shared_fp still counts them (df table is uncapped)
    assert prof[2]["best_partner"] is None
    assert prof[2]["n_shared_fp"] > 0


def test_gopher_rules_hand_cases(spark):
    filler = " ".join(
        ("the cat and dog have that kind of fun with it now so then "
         * 6).split()[:60]
    )
    cases = [
        (0, filler),  # passes everything
        (1, "the cat and dog of it"),  # too short -> r_wordcount
        (2, " ".join(["the", "of"] + ["supercalifragilistic"] * 58)),  # meanlen
        (3, filler + " " + "# " * 20),  # symbol ratio (and wordcount ok)
        (4, " ".join(["the", "of"] + ["123"] * 58)),  # alpha frac
        (5, " ".join(f"tok{i}" for i in range(60))),  # no stopwords
        (6, "   "),  # whitespace-only: NULL features, fails gate
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert rows[0]["keep"] is True
    assert rows[1]["r_wordcount"] is False and rows[1]["keep"] is False
    assert rows[2]["r_meanlen"] is False and rows[2]["r_wordcount"] is True
    assert rows[3]["r_symbol"] is False and rows[3]["r_wordcount"] is True
    assert rows[4]["r_alpha"] is False
    assert rows[5]["r_stop"] is False and rows[5]["n_stop_hits"] == 0
    assert rows[6]["n_words"] == 0
    assert rows[6]["mean_word_len"] is None
    assert rows[6]["r_meanlen"] is False and rows[6]["keep"] is False


def test_gopher_ellipsis_counts_as_symbol(spark):
    base = " ".join(
        ("the cat and dog have that kind of fun with it now so then "
         * 6).split()[:60]
    )
    noisy = base + " " + "... " * 20
    df = spark.createDataFrame(
        [(0, base), (1, noisy)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert rows[0]["r_symbol"] is True
    assert rows[1]["r_symbol"] is False
    assert rows[1]["symbol_word_ratio"] >= 0.1


def test_winnow_release_unpersists_cached_substrate(spark):
    held = []
    df = _docs(spark, [" ".join(f"t{i}" for i in range(20))] * 3)
    out = winnow_profile(
        df, "doc_id", "text", k=K, w=W, release_into=held
    )
    out.collect()
    assert len(held) == 2
    assert all(h.storageLevel.useMemory for h in held)
    for h in held:
        h.unpersist()
    assert not any(h.storageLevel.useMemory for h in held)
