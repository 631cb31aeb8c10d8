"""Survivorship: pick ONE golden record per duplicate cluster.

The dedup ladder (exact fingerprint, MinHash/SimHash, fuzzy linkage)
ends with CLUSTERS; a training-data or MDM pipeline then needs exactly
one surviving row per cluster, chosen by an explicit rule ladder
("keep the longest, then the highest-quality, then the oldest id") —
the reference's pipelines stop at drop-duplicates-by-key (keyed
``DISTINCT``-style collapse, SURVEY.md §2.4/§2.8); an ordered,
multi-attribute survivor rule is the extension a curation pipeline
actually needs.

Two physical strategies, identical results:

* ``"agg"`` (default, the 100 TB path): ``max(struct(rule..., row))``
  per cluster — an aggregate with MAP-SIDE PARTIAL COMBINE
  (``partial_max`` below the Exchange), so each input partition
  collapses to at most one candidate per cluster BEFORE the shuffle:
  the Exchange moves O(clusters x partitions) rows, not O(input).
  Struct-valued buffers aren't hash-aggregable in Spark, so both
  halves plan as SortAggregate — the sort is the per-partition price,
  the shuffle-volume collapse is the win. ``"min"`` directions are
  rewritten to ``max`` by negating the rule column, which is why this
  strategy requires numeric (or boolean) rule columns.
* ``"window"``: ``row_number`` over (cluster / rule order) — supports
  ANY orderable rule type (strings, dates), but the single Exchange
  carries EVERY input row to its cluster's reducer before anything
  collapses. Correct always; at scale strictly dominated by the agg
  form whenever the rules are numeric.

Determinism contract: the rule ladder must end in a UNIQUE column
(enforced only by documentation — the operator cannot see uniqueness);
otherwise the agg strategy breaks residual ties by the full-row struct
comparison while the window strategy breaks them by sort order, and the
two strategies may legitimately disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["survivorship"]

_DIRS = ("max", "min")


def survivorship(
    df: DataFrame,
    cluster_col: str,
    rules: list[tuple[str, str]],
    strategy: str = "agg",
    size_col: str = "n_members",
) -> DataFrame:
    """One row per ``cluster_col`` value: the member winning the ordered
    ``rules`` ladder (list of ``(column, "max"|"min")``, compared
    lexicographically), plus the cluster size in ``size_col``.

    Output columns: every input column (the survivor's values) followed
    by ``size_col``. NULL rule values lose to any non-NULL value on
    both strategies (NULLs sort first under ``max``-struct comparison
    and are ordered last explicitly in the window form).

    Raises on an unknown strategy/direction, an empty ladder, a
    ``size_col`` collision, and — for ``"agg"`` — on non-numeric rule
    columns (negation is the only engine-portable direction flip; use
    ``strategy="window"`` for string/date rules).
    """
    if strategy not in ("agg", "window"):
        raise ValueError(f"unknown strategy {strategy!r} (agg|window)")
    if not rules:
        raise ValueError("survivorship: empty rule ladder")
    for col, d in rules:
        if d not in _DIRS:
            raise ValueError(f"unknown direction {d!r} for {col!r} (max|min)")
    if size_col in df.columns:
        raise ValueError(f"size_col {size_col!r} collides with input")
    out_cols = df.columns

    if strategy == "window":
        order = [
            (F.col(c).desc_nulls_last() if d == "max" else F.col(c).asc_nulls_last())
            for c, d in rules
        ]
        w = Window.partitionBy(cluster_col).orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .withColumn(
                size_col,
                F.count(F.lit(1)).over(Window.partitionBy(cluster_col)),
            )
            .where(F.col("__rn") == 1)
            .select(*out_cols, size_col)
        )

    numeric_ok = {
        "tinyint", "smallint", "int", "integer", "bigint", "long",
        "float", "double", "boolean",
    }
    dtypes = dict(df.dtypes)
    keyed = []
    for c, d in rules:
        dt = dtypes.get(c, "?")
        if dt not in numeric_ok and not dt.startswith("decimal"):
            raise ValueError(
                f"agg strategy needs numeric rule columns; {c!r} is {dt} "
                "(use strategy='window')"
            )
        col = F.col(c).cast("double")
        keyed.append(col if d == "max" else -col)
    winner = F.max(
        F.struct(*keyed, F.struct(*out_cols).alias("__row"))
    ).alias("__w")
    agged = df.groupBy(cluster_col).agg(
        winner, F.count(F.lit(1)).alias(size_col)
    )
    return agged.select(
        *[F.col(f"__w.__row.{c}").alias(c) for c in out_cols],
        F.col(size_col).cast("long").alias(size_col),
    )
