"""Skew-mitigation operators: salted two-phase aggregation + salted join.

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

``salted_join`` is the JOIN-side counterpart (SURVEY §7.4.3 names skew a
design obligation): at 100 TB a hot join key is MORE common than a hot
group key (one whale customer, one default supplier id, one NULL-ish
sentinel). AQE's ``OptimizeSkewedJoin`` splits oversized sort-merge /
shuffled-hash partitions at runtime and is the first line of defense —
but its split unit is the MAP-OUTPUT RANGE: a skewed reduce partition
is divided along mapper boundaries, so when the hot key's bytes come
from few map tasks there is nothing to divide and the rule silently
declines (verified against Spark 4.1: a hot partition 200x the median
with detection thresholds trivially met is still skipped when the scan
side is a single-row-group parquet — one effective mapper; the same
join with a 16-task map side gets ``SortMergeJoin(skew=true)``. Both
behaviors are pinned in ``tests/test_plans.py``). That granularity
limit — plus needing post-shuffle stats at all — is why the explicit
salt exists: fact rows get a uniform salt in ``[0, n_salts)``, the dim
side is replicated once per salt value, and the join runs on
``(key, salt)`` — a per-ROW split that spreads the hot key over
``n_salts`` reducers regardless of mapper layout or planner estimates.
The join RESULT is salt-invariant (each fact row meets exactly the
same dim rows whatever its salt), so the oracle check is the plain
unsalted join.
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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
    how: str = "inner",
    dim_hint: str | None = "shuffle_hash",
) -> DataFrame:
    """Hot-key-safe equi-join: salt the fact side, replicate the dim side.

    Use when the FACT key is skewed and the dim is too large to broadcast
    (a broadcast join has no reducer to skew — salt only in shuffle-join
    land). The dim is replicated ``n_salts``x, so keep
    ``|dim| * n_salts`` well under the fact size; the fact side's salt is
    ``F.rand``-derived, which is fine because the join output is
    salt-invariant — determinism of the RESULT does not depend on
    determinism of the salt.

    ``dim_hint`` (default ``"shuffle_hash"``) pins the replicated dim to
    a shuffled-hash join: salting exists to spread a shuffle, so letting
    the planner broadcast the replicated dim would silently discard the
    mitigation being asked for (pass ``None`` to let the planner choose).
    Columns: fact columns + dim columns (minus the internal salt).

    Prefer AQE's skew-join handling when it applies (it splits oversized
    SMJ partitions with no dim replication cost); this operator is the
    explicit, planner-independent form for when it doesn't.
    """
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    replicated = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    if dim_hint:
        replicated = replicated.hint(dim_hint)
    cond = (salted_fact[fact_key] == replicated[dim_key]) & (
        salted_fact["__salt"] == replicated["__salt"]
    )
    return salted_fact.join(replicated, cond, how).drop("__salt")
