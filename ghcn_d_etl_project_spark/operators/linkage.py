"""Edit-distance record linkage: symmetric-delete blocking + exact verify.

The dedup ladder (``operators/dedup.py``) is token- and hash-based —
MinHash/SimHash find near-duplicate DOCUMENTS but cannot find the
typo-level matches record linkage needs ("Customer#000000142" vs
"Customer#000000143", "Smiht" vs "Smith"). The classic engine answer is
an edit-distance join, and the naive formulation is an N^2 cross join
with ``levenshtein`` — unshippable at scale.

This module uses SYMMETRIC-DELETE blocking (the FastSS / SymSpell
scheme): every string emits its 1-deletion neighborhood — itself plus
each variant with one character removed. For edit distance <= 1 the
scheme is provably COMPLETE:

  * substitution at position i: both strings share the variant with
    position i deleted;
  * insertion/deletion: the shorter string IS a deletion variant of the
    longer one, and every string is in its own neighborhood;
  * equality: trivially share the identity variant.

So ed(s, t) <= 1  =>  the neighborhoods intersect, and candidates are
found by a plain EQUI-JOIN on the variant key. The converse does not
hold (two deletions can collide at ed 2), so candidates are verified
with an exact JVM-side ``levenshtein`` — false positives cost one
comparison, never a missed pair. Completeness is what lets the oracle
be the brute-force N^2 DuckDB join and still hash-match.

Scale shape: explode factor is len+1 variants per row (bounded by
``max_len``, enforced); the candidate stage is a plain EQUI-JOIN on the
variant key (each exploded side shuffles on the variant — broadcast at
small SF, Catalyst's choice) plus one pair-dedup exchange; bucket
sizes are neighborhood collision counts (bounded by alphabet x length,
not by data volume — no hub-key explosion for id-like strings);
candidate pairs dedup BEFORE the levenshtein verify; exact verify runs
on candidates only, the same verify-last discipline as the MinHash-LSH
ladder. No driver collection, no cartesian product.

Higher distances need d-deletion neighborhoods (explode ~ C(len, d)):
supported in principle, deliberately not exposed — d >= 2 explode
factors belong behind the MinHash ladder, not this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_variants", "fuzzy_join", "fuzzy_pairs"]


def deletion_variants(col: str | F.Column, max_len: int = 64) -> F.Column:
    """Array of the string's 1-deletion neighborhood: the string itself
    plus every variant with exactly one character removed, deduplicated
    (repeated characters produce identical variants). Pure Column
    expression — transform over ``sequence(1, length)``, no UDF.

    ``max_len`` bounds the explode factor; longer strings raise at
    execution (an id/name column suddenly carrying documents should
    fail loudly, not emit 10k variants per row).
    """
    c = F.col(col) if isinstance(col, str) else col
    guarded = F.when(
        F.length(c) > max_len,
        F.raise_error(
            F.concat(
                F.lit(f"deletion_variants: string longer than {max_len}: "),
                F.substring(c, 1, 40),
            )
        ),
    ).otherwise(c)
    # "delete char i" = substr(1, i-1) || substr(i+1, len)
    variants = F.transform(
        F.sequence(F.lit(1), F.length(guarded)),
        lambda i: F.concat(
            guarded.substr(F.lit(1), i - F.lit(1)),
            guarded.substr(i + F.lit(1), F.length(guarded)),
        ),
    )
    return F.array_distinct(F.concat(F.array(guarded), variants))


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_len: int = 64,
) -> DataFrame:
    """All DISTINCT id pairs whose ``text_col`` values are within edit
    distance 1 (canonical order ``id_a < id_b``), with the exact
    distance. Complete by the symmetric-delete argument in the module
    docstring; exact ``levenshtein`` verification makes it sound.

    The candidate stage is the variant equi-join (shuffle or broadcast,
    Catalyst's choice by size) plus one pair-dedup exchange; candidate
    pairs are deduplicated before verification. NULL ids or texts are
    dropped (no defensible pairing for them).
    """
    base = (
        df.select(
            F.col(id_col).alias("__id"), F.col(text_col).alias("__txt")
        )
        .where(F.col("__id").isNotNull() & F.col("__txt").isNotNull())
    )
    exploded = base.select(
        "__id",
        "__txt",
        F.explode(deletion_variants("__txt", max_len=max_len)).alias("__v"),
    )
    a = exploded.alias("__a")
    b = exploded.alias("__b")
    cand = (
        a.join(b, F.col("__a.__v") == F.col("__b.__v"))
        .where(F.col("__a.__id") < F.col("__b.__id"))
        .select(
            F.col("__a.__id").alias("id_a"),
            F.col("__a.__txt").alias("txt_a"),
            F.col("__b.__id").alias("id_b"),
            F.col("__b.__txt").alias("txt_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("txt_a", "txt_b").cast("long")
    ).where(F.col("dist") <= 1).drop("txt_a", "txt_b")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    max_len: int = 64,
    best_only: bool = True,
) -> DataFrame:
    """Two-table edit-distance-1 join: each LEFT row matched to the
    RIGHT rows whose ``right_text`` is within edit distance 1 of its
    ``left_text`` — the dirty-fact-keys-to-clean-dimension lookup
    (typo'd station ids, misspelled names against a reference list).

    Same symmetric-delete completeness argument as :func:`fuzzy_pairs`;
    candidates come from the variant equi-join, exact ``levenshtein``
    verifies, and with ``best_only`` each left TEXT keeps only its
    minimum-distance matches (an exact match beats one-edit candidates —
    ties at the same distance are all kept, the caller picks a
    tiebreak). Inner-join semantics: left rows with no match within
    distance 1 are dropped. Output: all left columns, all right
    columns, ``dist``. Column name collisions between the two sides are
    rejected.

    The match depends only on the text VALUE, so candidates are keyed
    on the distinct left texts — no synthetic row id (branch-consistent
    by construction, unlike ``monotonically_increasing_id`` schemes)
    and the candidate work is proportional to distinct texts, not rows.
    Scale: the clean reference side is typically small — Catalyst
    broadcasts its exploded variants and the dirty side never shuffles;
    with two large sides both shuffle on the variant key. ``best_only``
    adds one window partitioned on the left text, never a second scan.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint, overlap: "
            f"{sorted(overlap)}"
        )
    for df, col in ((left, left_text), (right, right_text)):
        if col not in df.columns:
            raise ValueError(f"missing text column {col!r}")
    if "__ltxt" in left.columns or "__ltxt" in right.columns:
        raise ValueError("input carries reserved column '__ltxt'")
    from pyspark.sql import Window

    ltexts = (
        left.select(F.col(left_text).alias("__ltxt"))
        .where(F.col("__ltxt").isNotNull())
        .distinct()
    )
    lv = ltexts.select(
        "__ltxt",
        F.explode(deletion_variants("__ltxt", max_len=max_len)).alias("__v"),
    )
    rv = right.where(F.col(right_text).isNotNull()).select(
        "*",
        F.explode(
            deletion_variants(right_text, max_len=max_len)
        ).alias("__v"),
    )
    cand = (
        lv.join(rv, "__v")
        .drop("__v")
        .distinct()
        .withColumn("dist", F.levenshtein("__ltxt", right_text).cast("long"))
        .where(F.col("dist") <= 1)
    )
    if best_only:
        w = Window.partitionBy("__ltxt")
        cand = (
            cand.withColumn("__best", F.min("dist").over(w))
            .where(F.col("dist") == F.col("__best"))
            .drop("__best")
        )
    return left.join(
        cand, F.col(left_text) == F.col("__ltxt")
    ).drop("__ltxt")
