"""Semantic checks for the r11 corpus-curation wave: skip-gram
co-occurrence, vocabulary/OOV audit, containment near-dup, cross-source
duplication audit, quantile normalization, curriculum bucketing.

Each has a full DuckDB value-hash oracle at the registry level; these
tests pin the SEMANTICS with hand-computable cases the oracle alone
can't distinguish from a consistently-wrong pair of implementations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.dedup import (
    containment_pairs,
    cross_source_neardup_audit,
    ngram_jaccard_pairs,
)
from ghcn_d_etl_project_spark.operators.encoding import (
    curriculum_buckets,
    quantile_normalize,
)
from ghcn_d_etl_project_spark.operators.textops import skipgram_counts, vocab_oov


def test_skipgram_hand_case(spark):
    """'a b c a' with window 2: (a,b) at distances (0,1) and (1,3) -> 2;
    (a,c) at (0,2) and (2,3) -> 2; (b,c) at (1,2) -> 1. Canonical pair
    order (least, greatest), positions beyond doc end match nothing."""
    df = spark.createDataFrame([(1, "a b c a")], "id long, txt string")
    got = {
        (r.w1, r.w2): r.n_pairs
        for r in skipgram_counts(df, "id", "txt", window=2, min_count=1).collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 1}


def test_skipgram_window_bounds_fanout(spark):
    """Window w over a doc of n tokens emits at most n*w position pairs
    (exactly sum over tokens of min(w, remaining)) — the equi-join shape
    can't exceed it."""
    df = spark.createDataFrame([(1, " ".join("x" * 1) * 0 + "a b c d e")],
                               "id long, txt string")
    out = skipgram_counts(df, "id", "txt", window=3, min_count=1)
    total = out.agg(F.sum("n_pairs")).first()[0]
    # n=5, w=3: 3+3+2+1 = 9 position pairs
    assert total == 9


def test_vocab_oov_hand_case(spark):
    """vocab_size=1 keeps only the most frequent word (ties: lexical).
    'b b a' -> vocab {b}; doc1 'b a' has 1/2 OOV; doc2 'b' has 0."""
    df = spark.createDataFrame(
        [(1, "b a"), (2, "b b")], "id long, txt string"
    )
    got = {r.doc_id: (r.n_tok, r.n_oov, r.oov_rate)
           for r in vocab_oov(df, "id", "txt", vocab_size=1).collect()}
    assert got == {1: (2, 1, 0.5), 2: (2, 0, 0.0)}


def test_vocab_tie_break_lexical(spark):
    """Equal counts break lexicographically — 'a' wins over 'b' at
    vocab_size=1 when both appear once."""
    df = spark.createDataFrame([(1, "b a")], "id long, txt string")
    got = {r.doc_id: r.n_oov
           for r in vocab_oov(df, "id", "txt", vocab_size=1).collect()}
    assert got == {1: 1}  # 'b' is the OOV one


def test_containment_catches_quoted_inclusion(spark):
    """A short doc verbatim-contained in a much longer one scores
    containment 1.0 while symmetric Jaccard stays below 0.5 — the pair
    class the asymmetric measure exists for."""
    short = "the quick brown fox jumps over the lazy dog"
    long = short + " " + " ".join(f"pad{i}word{i * 37}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, long)], "id long, txt string"
    )
    cont = containment_pairs(df, "id", "txt", threshold=0.9).collect()
    assert len(cont) == 1 and cont[0].containment == 1.0
    jac = ngram_jaccard_pairs(df, "id", "txt", threshold=0.5).collect()
    assert jac == []


def test_containment_symmetric_identical(spark):
    """Identical docs: containment == jaccard == 1.0."""
    df = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here")], "id long, txt string"
    )
    cont = containment_pairs(df, "id", "txt", threshold=0.5).collect()
    assert len(cont) == 1
    assert cont[0].n_inter == cont[0].size1 == cont[0].size2


def test_cross_source_audit_hand_case(spark):
    """Two near-identical docs in different sources are each counted as
    cross-source near-dups; the unrelated third doc is not."""
    a = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (1, a, "s1"),
            (2, a + " iota", "s2"),
            (3, "totally unrelated content with other words", "s1"),
        ],
        "id long, txt string, src string",
    )
    got = {
        r.source: (r.n_docs, r.n_neardup_docs, r.n_cross_docs)
        for r in cross_source_neardup_audit(
            df, "id", "txt", "src", threshold=0.5
        ).collect()
    }
    assert got == {"s1": (2, 1, 1), "s2": (1, 1, 1)}


def test_quantile_normalize_equalizes_marginals(spark):
    """The defining property: after normalization every group carries
    the SAME multiset of values — the pooled order statistics at the
    shared index grid. Two size-3 groups, N=6: indices ceil(r*6/3) =
    {2, 4, 6} -> pooled values {2, 10, 30} for BOTH groups."""
    df = spark.createDataFrame(
        [(1, 1, "a"), (2, 2, "a"), (3, 3, "a"),
         (4, 10, "b"), (5, 20, "b"), (6, 30, "b")],
        "id long, v long, g string",
    )
    out = quantile_normalize(df, "id", "v", "g").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.group, []).append(r.qnorm)
    assert sorted(by_group["a"]) == sorted(by_group["b"]) == [2, 10, 30]


def test_quantile_normalize_rank_preserving(spark):
    """Within a group, qnorm is monotone in the original value."""
    df = spark.createDataFrame(
        [(i, v, "g") for i, v in enumerate([5, 1, 9, 3, 7])]
        + [(10 + i, v, "h") for i, v in enumerate([2, 8, 4, 6, 0])],
        "id long, v long, g string",
    )
    rows = quantile_normalize(df, "id", "v", "g").collect()
    for grp in ("g", "h"):
        sub = sorted(
            [(r.value, r.qnorm) for r in rows if r.group == grp]
        )
        qnorms = [q for _, q in sub]
        assert qnorms == sorted(qnorms)


def test_curriculum_buckets_hand_case(spark):
    """5 rows, 10 buckets: bucket = (10*(r-1)) div 5 -> 0,2,4,6,8 in
    difficulty order; easiest row lands in bucket 0."""
    df = spark.createDataFrame(
        [(i, d, "s") for i, d in enumerate([50, 10, 40, 20, 30])],
        "id long, d long, g string",
    )
    out = sorted(
        curriculum_buckets(df, "id", "d", "g", n_buckets=10).collect(),
        key=lambda r: r.difficulty,
    )
    assert [r.bucket for r in out] == [0, 2, 4, 6, 8]
    assert [r.within_rank for r in out] == [1, 2, 3, 4, 5]


def test_curriculum_buckets_balanced_across_sources(spark):
    """Unequal source sizes still cut into the same bucket RANGE and
    each source's buckets are depth-balanced (sizes differ by <= 1)."""
    rows = [(i, i, "big") for i in range(40)] + [
        (100 + i, i, "small") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id long, d long, g string")
    out = curriculum_buckets(df, "id", "d", "g", n_buckets=5).collect()
    for grp in ("big", "small"):
        counts: dict[int, int] = {}
        for r in out:
            if r.group == grp:
                counts[r.bucket] = counts.get(r.bucket, 0) + 1
        assert set(counts) == {0, 1, 2, 3, 4}
        assert max(counts.values()) - min(counts.values()) <= 1


def test_curriculum_monotone_in_difficulty(spark):
    """Within a source, a harder row never lands in an earlier bucket."""
    df = spark.createDataFrame(
        [(i, (i * 7919) % 101, "s") for i in range(30)],
        "id long, d long, g string",
    )
    out = sorted(
        curriculum_buckets(df, "id", "d", "g", n_buckets=4).collect(),
        key=lambda r: (r.difficulty, r.id),
    )
    buckets = [r.bucket for r in out]
    assert buckets == sorted(buckets)
