"""Join operators: dimension enrichment, aggregate-enrichment, reconciliation.

Reference analogs (SURVEY.md §2.4, §2.8):
  * J1 dim enrich — silver facts LEFT JOIN stations on ID
    (``src/transform/silver_processor.py:116-119``).
  * J2 aggregate enrich — daily features LEFT JOIN per-(ID,month) normals
    of the same table (``src/transform/gold_processor.py:211-217``), the
    decorrelated "deviation from group mean" pattern.
  * U2 set reconciliation — the reference diffs station sets driver-side
    with Python sets over collect() (``05_data_validation.py:183-187``);
    here done distributed with anti joins / exceptAll.

Scale notes: dimensions get an explicit ``F.broadcast`` hint — at 100 TB
the fact side never shuffles for an enrichment join; AQE would usually
pick broadcast anyway but the hint removes the size-estimation gamble.
The aggregate-enrich pattern shuffles once on the group keys for the agg,
then broadcasts the (small) aggregate back — strictly better than the
window-function formulation when groups >> distinct keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich(
    df: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact-side-preserving dimension join (J1) with a broadcast hint."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return df.join(d, on=on, how=how)


def aggregate_enrich(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    how: str = "left",
    broadcast_agg: bool = True,
) -> DataFrame:
    """Join a grouped aggregate of ``df`` back onto its own rows (J2).

    ``aggs`` are aliased aggregate Columns. The aggregate side is tiny
    relative to the fact (one row per key) — broadcast it back.
    """
    normals = df.groupBy(*keys).agg(*aggs)
    n = F.broadcast(normals) if broadcast_agg else normals
    return df.join(n, on=keys, how=how)


def reconcile_keys(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> tuple[DataFrame, DataFrame]:
    """Distributed set reconciliation (U2 done right): returns
    (keys only in left, keys only in right) via anti joins — no
    driver-side collect().
    """
    lk = left.select(F.col(left_key).alias("key")).distinct()
    rk = right.select(F.col(right_key).alias("key")).distinct()
    return lk.join(rk, "key", "left_anti"), rk.join(lk, "key", "left_anti")
