"""Association mining: pairwise support / confidence / lift over baskets.

The last classic analytics family the engine lacked: which items
co-occur in the same basket more than chance predicts (market-basket
analysis, event-type affinity, co-read document topics). First-order
pair rules only — the full Apriori/FP-Growth lattice explodes
combinatorially and its distributed form belongs to an ML library, but
pairwise support/confidence/lift is what powers most real "users who X
also Y" features and is exactly expressible as relational algebra.

Scale shape: baskets are DISTINCT (basket, item) tuples (one dedup
shuffle, map-side combined); pair candidates come from a self-join ON
THE BASKET KEYS — the per-basket fan-out is C(items_in_basket, 2), so
the join output is bounded by basket width, never by basket count
(document the width cap if your domain allows unbounded baskets); item
and pair counts are map-side-combined aggregates over bounded
cardinality (|items| and |items|^2). No cartesian product, no driver
collection; the final metrics join two SMALL aggregates (items, pairs)
plus a one-row basket count broadcast.

Metrics (canonical item_a < item_b ordering, both directions' conf):
  * support_pct  = baskets containing BOTH / all baskets * 100
  * conf_a_to_b  = P(b in basket | a in basket)
  * conf_b_to_a  = P(a in basket | b in basket)
  * lift         = P(ab) / (P(a) * P(b)) — 1.0 = independence,
                   > 1 = affinity, < 1 = substitution
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["basket_pairs"]


def basket_pairs(
    df: DataFrame,
    basket_cols: Sequence[str],
    item_col: str,
    min_support_pct: float = 0.0,
) -> DataFrame:
    """Pairwise association rules over baskets defined by
    ``basket_cols`` (e.g. ``(user_id, day)``) containing ``item_col``
    values. NULL items and NULL basket keys are dropped. Rounds the
    ratio metrics to 6 places (engine-parity convention).

    ``min_support_pct`` prunes pairs below the support floor AFTER
    exact counting (the floor is a reporting filter, not an Apriori
    optimization — counts here are cheap because item vocabulary is
    bounded).
    """
    if not basket_cols:
        raise ValueError("basket_pairs needs at least one basket column")
    if not (0.0 <= min_support_pct <= 100.0):
        raise ValueError("min_support_pct must be in [0, 100]")
    keys = [F.col(k) for k in basket_cols]
    clean = df.where(
        functools.reduce(
            lambda a, b: a & b,
            [k.isNotNull() for k in keys],
            F.col(item_col).isNotNull(),
        )
    )
    b = clean.select(*keys, F.col(item_col).alias("__item")).distinct()

    n_baskets = b.select(*basket_cols).distinct().agg(
        F.count(F.lit(1)).alias("__n_baskets")
    )
    item_counts = b.groupBy("__item").agg(
        F.count(F.lit(1)).alias("__n_item")
    )

    left = b.alias("__l")
    right = b.select(
        *[F.col(k).alias(f"__r_{k}") for k in basket_cols],
        F.col("__item").alias("__r_item"),
    ).alias("__r")
    cond = functools.reduce(
        lambda a, c: a & c,
        [F.col(f"__l.{k}") == F.col(f"__r_{k}") for k in basket_cols],
    ) & (F.col("__l.__item") < F.col("__r_item"))
    pair_counts = (
        left.join(right, cond)
        .groupBy(
            F.col("__l.__item").alias("item_a"),
            F.col("__r_item").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("__n_pair"))
    )

    ia = item_counts.select(
        F.col("__item").alias("item_a"), F.col("__n_item").alias("__n_a")
    )
    ib = item_counts.select(
        F.col("__item").alias("item_b"), F.col("__n_item").alias("__n_b")
    )
    out = (
        pair_counts.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .join(F.broadcast(n_baskets))
    )
    nb = F.col("__n_baskets").cast("double")
    pab = F.col("__n_pair") / nb
    pa = F.col("__n_a") / nb
    pb = F.col("__n_b") / nb
    result = out.select(
        "item_a",
        "item_b",
        F.col("__n_pair").cast("long").alias("n_baskets_both"),
        F.round(pab * 100.0, 6).alias("support_pct"),
        F.round(F.col("__n_pair") / F.col("__n_a"), 6).alias("conf_a_to_b"),
        F.round(F.col("__n_pair") / F.col("__n_b"), 6).alias("conf_b_to_a"),
        F.round(pab / (pa * pb), 6).alias("lift"),
    )
    if min_support_pct > 0.0:
        result = result.where(F.col("support_pct") >= min_support_pct)
    return result
