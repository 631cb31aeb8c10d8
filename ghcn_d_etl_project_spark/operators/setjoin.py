"""Exact set-similarity join with prefix + length filtering (PPJoin-lite).

The third rung of the engine's similarity-join ladder, between the full
inverted-index join (``operators/dedup.py:ngram_jaccard_pairs`` — every
pair sharing >= 1 token becomes a candidate) and the approximate
MinHash+LSH path (``dedup.py:minhash_lsh_dedup`` — probabilistic recall):
EXACT results at a fraction of the candidate volume, using two lossless
pruning rules from the set-similarity-join literature (PPJoin family;
see PAPERS.md — "Efficient Similarity Joins for Near Duplicate
Detection", WWW'08, public):

* **Prefix filter.** Order every set's tokens by ascending global
  frequency (rarest first). Two sets with Jaccard >= t MUST share at
  least one token among each one's first ``|x| - ceil(t*|x|) + 1``
  tokens, so only those prefix tokens need to enter the inverted-index
  self-join. Hot tokens land at the END of the ordering and therefore
  almost never appear in a prefix — the exact skew that makes the naive
  inverted-index join quadratic on common tokens is pruned by
  construction.
* **Length filter.** Jaccard >= t implies ``t*|x| <= |y| <= |x|/t``;
  candidate pairs outside that band are dropped inside the join
  condition, before the shuffle writes them.

Both rules are LOSSLESS: the result set is bit-identical to the
brute-force formulation, which is exactly what the registered query's
DuckDB oracle asserts (the oracle is the unfiltered shared-token join —
an oracle MATCH is a machine-checked completeness proof for the
filters).

Scale shape (100 TB): one shuffle to dedup (key, token) pairs; a
token-frequency aggregation joined back (AQE broadcasts it when the
vocabulary is small); a per-key window to rank tokens (parallel across
keys); the prefix self-join whose postings are rare-token-only; and a
verification join bounded by the candidate count. No step is quadratic
in the corpus — only in the surviving candidates, which the t-band
bounds. Float parity: jaccard = small-int division, bit-identical
across engines (same recipe as ngram_jaccard_pairs).

Reference parity: the reference has no similarity join at all — this
extends its dedup surface (dedup logic in
``/root/reference/src/transform_gold.py`` is exact-key only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Guard for float prefix-length arithmetic: ceil(t*n) must be the true
# mathematical ceiling even when t*n lands a few ulps above an integer
# (0.6*5 = 3.0000000000000004 in IEEE — naive ceil would shorten the
# prefix and silently LOSE pairs).
_EPS = 1e-9


def prefix_filtered_jaccard_join(
    df: DataFrame,
    key_col: str,
    token_col: str,
    threshold: float,
) -> DataFrame:
    """All pairs of keys whose token sets have Jaccard >= ``threshold``.

    ``df`` is the exploded (key, token) representation — rows beyond the
    first per (key, token) are ignored (set semantics). Returns
    ``(k1, k2, n1, n2, n_common, jaccard)`` with ``k1 < k2``, jaccard
    rounded to 6 for cross-engine hashing.

    Identical output to the brute-force shared-token join; see module
    docstring for why the pruning is lossless and how it scales.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    # Persist-once substrate (same pattern as MinHash shingles): the
    # deduped (key, token) table is scanned by sizes, freq, the prefix
    # build, and BOTH sides of the verification join — five scans that
    # would each re-run the upstream scan + distinct shuffle otherwise.
    b = (
        df.select(F.col(key_col).alias("k"), F.col(token_col).alias("tok"))
        .filter(F.col("k").isNotNull() & F.col("tok").isNotNull())
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = b.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    freq = b.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))

    # Rarest-first total order = (global frequency, token); no global
    # rank materialization — the tuple itself is the sort key, so there
    # is no single-partition bottleneck however large the vocabulary.
    w = Window.partitionBy("k").orderBy("tf", "tok")
    prefix_len = (
        F.col("n")
        - F.ceil(F.lit(threshold) * F.col("n") - F.lit(_EPS))
        + F.lit(1)
    )
    pref = (
        b.join(freq, "tok")
        .join(sizes, "k")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select("k", "tok", "n")
        .persist(StorageLevel.MEMORY_AND_DISK)  # both sides of the self-join
    )

    a, c = pref.alias("a"), pref.alias("c")
    # Length filter inside the join condition: t*n1 <= n2 <= n1/t
    # (epsilon-guarded on the lower bound for the same ulp reason).
    cand = (
        a.join(
            c,
            (F.col("a.tok") == F.col("c.tok"))
            & (F.col("a.k") < F.col("c.k"))
            & (F.col("c.n") >= F.lit(threshold) * F.col("a.n") - F.lit(_EPS))
            & (F.col("a.n") >= F.lit(threshold) * F.col("c.n") - F.lit(_EPS)),
        )
        .select(
            F.col("a.k").alias("k1"),
            F.col("c.k").alias("k2"),
            F.col("a.n").alias("n1"),
            F.col("c.n").alias("n2"),
        )
        .distinct()
    )

    # Exact verification over FULL token sets, bounded by the candidates.
    t1, t2 = b.alias("t1"), b.alias("t2")
    inter = (
        cand.join(t1, cand.k1 == F.col("t1.k"))
        .join(t2, (cand.k2 == F.col("t2.k")) & (F.col("t1.tok") == F.col("t2.tok")))
        .groupBy("k1", "k2", "n1", "n2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("n_common")
    )
    return (
        inter.filter(jac >= F.lit(threshold))
        .select(
            F.col("k1").cast("long").alias("k1"),
            F.col("k2").cast("long").alias("k2"),
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("n_common").cast("long").alias("n_common"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


def candidate_reduction_report(
    df: DataFrame, key_col: str, token_col: str, threshold: float
) -> DataFrame:
    """One-row report: brute-force candidate pairs vs prefix-filtered
    candidate pairs at ``threshold`` — the measured pruning factor the
    module docstring promises. Diagnostic (two aggregations over the
    same substrate); not on any hot path."""
    b = (
        df.select(F.col(key_col).alias("k"), F.col(token_col).alias("tok"))
        .filter(F.col("k").isNotNull() & F.col("tok").isNotNull())
        .distinct()
    )
    sizes = b.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    freq = b.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy("k").orderBy("tf", "tok")
    prefix_len = (
        F.col("n")
        - F.ceil(F.lit(threshold) * F.col("n") - F.lit(_EPS))
        + F.lit(1)
    )
    pref = (
        b.join(freq, "tok")
        .join(sizes, "k")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select("k", "tok", "n")
    )

    def _pairs(tokens: DataFrame, with_len: bool) -> DataFrame:
        x, y = tokens.alias("x"), tokens.alias("y")
        cond = (F.col("x.tok") == F.col("y.tok")) & (F.col("x.k") < F.col("y.k"))
        if with_len:
            cond = (
                cond
                & (F.col("y.n") >= F.lit(threshold) * F.col("x.n") - F.lit(_EPS))
                & (F.col("x.n") >= F.lit(threshold) * F.col("y.n") - F.lit(_EPS))
            )
        return (
            x.join(y, cond)
            .select(F.col("x.k").alias("k1"), F.col("y.k").alias("k2"))
            .distinct()
        )

    brute = _pairs(b.join(sizes, "k"), with_len=False).count()
    filtered = _pairs(pref, with_len=True).count()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(brute), int(filtered), float(filtered) / max(brute, 1))],
        "brute_pairs long, filtered_pairs long, ratio double",
    )
