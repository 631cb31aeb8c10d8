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

__all__ = ["deletion_variants", "fuzzy_pairs"]


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
