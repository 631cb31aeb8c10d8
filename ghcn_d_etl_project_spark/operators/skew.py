"""Skew-mitigation operators: salted two-phase aggregation.

AQE splits skewed JOIN partitions automatically, but a groupBy on a hot
key still funnels that key's every row through one reducer. Salting
splits each key into ``n_salts`` sub-keys for a first partial aggregate,
then combines the partials in a second (tiny) aggregate — the classic
two-phase rewrite. Only decomposable aggregates qualify (sum/count/min/
max; avg = sum/count derived after phase 2).

Spark already performs map-side partial aggregation, which usually makes
explicit salting unnecessary — it matters when per-partition key
diversity defeats hash-map partials (many groups per partition but one
giant group overall) or when the partial-agg map spills. The operator
exists for those hot-key distributions; the result is identical to the
plain groupBy, so its oracle check is the UNsalted SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (combine_fn, needs_long_cast) per decomposable aggregate
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partials
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``specs`` = [(column_or_expr, fn, alias)] with fn in sum/count/min/max.
    Phase 1 groups by (keys + random salt in [0, n_salts)) — the hot key's
    rows spread over n_salts reducers; phase 2 groups by keys alone over
    n_salts partial rows per key. Deterministic despite the random salt:
    every decomposable aggregate is salt-partition-invariant.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(alias)
            for col, fn, alias in specs
        ]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[_COMBINE[fn](alias).alias(alias) for _, fn, alias in specs]
    )
    return phase2
