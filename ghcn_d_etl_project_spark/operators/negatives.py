"""Deterministic negative sampling for contrastive / ranking training.

A contrastive training pipeline needs, for every anchor example, k
"random" negatives drawn from the corpus — uniformly-ish, stably
(re-running the job must emit the same pairs or the training data
drifts), and WITHOUT an N x N candidate space. The classic shapes are
a per-anchor `rand()` join (non-deterministic, breaks lineage replay)
or a driver-side shuffle (doesn't scale).

This operator is the scale-correct deterministic shape:

1. every row gets an md5-derived pseudo-random bucket (engine-portable
   recipe shared with ``common.hash_split_bucket``) and an md5 draw;
2. rows are ranked inside their bucket by (draw, id) — a PARALLEL
   window, never a global sort (the global-row_number formulation is a
   single-partition bottleneck at scale; buckets bound every partition
   to ~N/B rows);
3. each anchor pairs with the next ``k`` rows in its bucket's cyclic
   hash order (rank arithmetic + an equi-join on (bucket, rank) — no
   cross join ever exists).

Hash order is independent of any semantic column, so within-bucket
neighbors are as good as uniform draws; cycling guarantees every anchor
gets exactly ``min(k, bucket_size - 1)`` negatives. Fully replayable:
same ids -> same negatives, on any engine with md5 (the registered
query's DuckDB oracle replays it verbatim).

Reference parity: no sampling operators in the reference; extends the
engine's training-data surface (SURVEY.md §2 extension families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cyclic_negative_sample(
    df: DataFrame,
    id_col: str,
    k: int = 3,
    n_buckets: int = 32,
    salt: str = "neg",
) -> DataFrame:
    """``(anchor_id, neg_id, neg_rank)`` — k deterministic negatives per
    anchor (fewer only when an anchor's bucket has < k+1 members;
    singleton buckets yield none). ``neg_rank`` is 1..k, the cyclic
    offset that produced the pair."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")

    id_str = F.col("id").cast("string")
    hex4 = F.substring(F.md5(F.concat(id_str, F.lit(":" + salt + ":b"))), 1, 4)
    draw = F.md5(F.concat(id_str, F.lit(":" + salt + ":d")))
    base = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("id"))
        .distinct()
        .select(
            "id",
            (F.conv(hex4, 16, 10).cast("long") % n_buckets).alias("bucket"),
            draw.alias("draw"),
        )
    )
    w = Window.partitionBy("bucket").orderBy("draw", "id")
    ranked = base.withColumn("rn", F.row_number().over(w))
    counts = ranked.groupBy("bucket").agg(F.count(F.lit(1)).alias("bn"))
    ranked = ranked.join(counts, "bucket")

    # j ranges over 1..min(k, bn-1): never a full cycle, so an anchor can
    # neither pair with itself nor emit the same negative twice.
    # (Guarded sequence: Spark's sequence(1, 0) would COUNT DOWN, not
    # return empty — singleton buckets must produce an empty array.)
    offsets = F.when(
        F.col("bn") > 1,
        F.sequence(F.lit(1), F.least(F.lit(k), F.col("bn") - 1)),
    ).otherwise(F.array().cast("array<int>"))
    want = ranked.select(
        "bucket",
        F.col("id").alias("anchor_id"),
        F.explode(offsets).alias("j"),
        "rn",
        "bn",
    ).select(
        "bucket",
        "anchor_id",
        F.col("j").alias("neg_rank"),
        # cyclic: ((rn - 1 + j) mod bn) + 1
        ((F.col("rn") - 1 + F.col("j")) % F.col("bn") + 1).alias("neg_rn"),
    )
    neg = ranked.select("bucket", F.col("rn").alias("neg_rn"), F.col("id").alias("neg_id"))
    return want.join(neg, ["bucket", "neg_rn"]).select(
        "anchor_id", "neg_id", F.col("neg_rank").cast("long").alias("neg_rank")
    )
