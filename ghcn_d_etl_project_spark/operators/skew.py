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

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# phase-2 combine fn per simple decomposable aggregate; counts combine by
# summing partials, avg is handled separately (sum+count partials, derived
# after phase 2)
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,
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

    ``specs`` = [(column_or_expr, fn, alias)] with fn in
    sum/count/min/max/avg. Phase 1 groups by (keys + random salt in
    [0, n_salts)) — the hot key's rows spread over n_salts reducers;
    phase 2 groups by keys alone over n_salts partial rows per key.
    Deterministic despite the random salt: every decomposable aggregate
    is salt-partition-invariant.

    ``avg`` decomposes into sum+count(non-null) partials and is derived
    after phase 2 as ``CAST(sum AS DOUBLE) / count`` — so the output is
    DOUBLE regardless of input type, and matches plain ``F.avg``
    semantics (nulls excluded, all-null group → NULL). For exact parity
    under arbitrary combine order, pass a DECIMAL column: the partial
    sums are then exact and only the final division rounds.
    """
    bad = [fn for _, fn, _ in specs if fn != "avg" and fn not in _COMBINE]
    if bad:
        raise ValueError(
            f"non-decomposable aggregate(s) {bad}: salted_agg supports "
            "sum/count/min/max/avg"
        )
    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    p1, p2 = [], []
    for col, fn, alias in specs:
        if fn == "avg":
            # sum + non-null count partials; derive the quotient after
            # phase 2 (the module docstring's "avg = sum/count" path)
            p1.append(F.sum(col).alias(f"__p_{alias}_sum"))
            p1.append(F.count(col).alias(f"__p_{alias}_cnt"))
            p2.append(
                (
                    F.sum(f"__p_{alias}_sum").cast("double")
                    / F.sum(f"__p_{alias}_cnt")
                ).alias(alias)
            )
        elif fn == "count":
            p1.append(F.count(F.lit(1)).alias(alias))
            p2.append(F.sum(alias).alias(alias))
        else:
            p1.append(getattr(F, fn)(col).alias(alias))
            p2.append(_COMBINE[fn](alias).alias(alias))
    phase1 = salted.groupBy(*keys, "__salt").agg(*p1)
    return phase1.groupBy(*keys).agg(*p2)


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

    ``how`` is restricted to inner / left / left_semi / left_anti: the
    rewrite is only salt-invariant when every OUTPUT row is driven by a
    fact row. Under right/full outer, each of the ``n_salts`` dim
    replicas that finds no matching (key, salt) fact row null-extends
    independently — unmatched dim keys would be emitted up to
    ``n_salts``x, and matched-but-sparse keys would add spurious null
    rows. Those joins need the dim side un-replicated; use a plain join
    (or swap the sides so the skewed input is the left/fact side).
    Sizing: see :func:`recommend_n_salts` for a bounded probe that
    derives ``n_salts`` from the observed hot-key share.
    """
    allowed = {
        "inner", "cross", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): only inner/left/left_semi/left_anti "
            "are salt-invariant — right/full outer joins would duplicate "
            "unmatched dim keys once per salt replica (see docstring)"
        )
    for side, cols in (("fact", fact.columns), ("dim", dim.columns)):
        if "__salt" in cols:
            raise ValueError(
                f"salted_join: {side} input already has a '__salt' column — "
                "it would be silently overwritten and then dropped; rename "
                "it before salting"
            )
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


def recommend_n_salts(
    fact: DataFrame,
    key: str,
    shuffle_partitions: int | None = None,
    balance_factor: float = 2.0,
    max_salts: int = 256,
) -> dict:
    """Size ``n_salts`` from the observed hot-key share — the same
    "measure, then size" pattern as ``similarity.recommend_out_dim``.

    One bounded probe: ``groupBy(key).count()`` (map-side partial
    aggregation, so the probe itself does not suffer the skew it
    measures — each mapper emits at most one partial row per key) folded
    straight into a single global row ``(top_count, total, n_keys)``.
    Cost is one shuffle of ≤ n_keys rows and ONE action; nothing
    key-cardinality-sized reaches the driver.

    Sizing model: with P reduce partitions, a balanced reducer carries
    ``total / P`` rows; the hot key alone drops ``top_count`` on one
    reducer. Salting with n splits that to ``top_count / n``, so the
    smallest n keeping the hot reducer within ``balance_factor``x the
    balanced load is ``ceil(top_count * P / (balance_factor * total))``,
    clamped to [1, min(P, max_salts)] — beyond P salts there are no
    extra reducers to spread over, and each salt costs a full dim
    replica in ``salted_join``. A recommendation of 1 means the key
    distribution doesn't need salting at all (``skewed=False``).

    Returns ``{"n_salts", "top_count", "total", "n_keys", "hot_share",
    "partitions", "skewed"}``.
    """
    import math

    if shuffle_partitions is None:
        shuffle_partitions = int(
            fact.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    stats = (
        fact.groupBy(key)
        .count()
        .agg(
            F.max("count").alias("top"),
            F.sum("count").alias("total"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .first()
    )
    if stats is None or not stats.total:
        return {
            "n_salts": 1, "top_count": 0, "total": 0, "n_keys": 0,
            "hot_share": 0.0, "partitions": shuffle_partitions,
            "skewed": False,
        }
    raw = math.ceil(
        stats.top * shuffle_partitions / (balance_factor * stats.total)
    )
    n_salts = max(1, min(raw, shuffle_partitions, max_salts))
    return {
        "n_salts": n_salts,
        "top_count": int(stats.top),
        "total": int(stats.total),
        "n_keys": int(stats.n_keys),
        "hot_share": round(stats.top / stats.total, 6),
        "partitions": shuffle_partitions,
        "skewed": n_salts > 1,
    }


def skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    top_k: int = 5,
) -> DataFrame:
    """Key-distribution diagnostic: the measurement that decides whether
    a join/agg on ``key_cols`` needs the salting operators above, AQE
    skew handling, or nothing. One row per top-``top_k`` heaviest key
    (deterministic tie-break on the key values), each carrying both the
    key's own stats and the global distribution:

      * ``n_rows``          — the key's row count;
      * ``share_pct``       — its share of all rows (rounded, 6);
      * ``heavy_rank``      — 1 = heaviest;
      * ``n_keys``          — distinct key count (global);
      * ``p50_size`` / ``p90_size`` — interpolated group-size
        percentiles (global);
      * ``max_size``        — the heaviest key's count (global);
      * ``skew_ratio``      — max_size / mean size (global; 1.0 =
        perfectly uniform). A reducer processing the heaviest key does
        ~``skew_ratio``x the average partition's key work — the number
        to compare against your straggler tolerance.

    Scale: the top-k branch and the summary branch each recompute the
    per-key count (Spark does not share subplans across branches), so
    the input is SCANNED twice — but both shuffles move only
    map-side-combined per-key partials, O(distinct keys x map tasks)
    records, never the raw rows. The summary is a single-row aggregate
    broadcast onto the TakeOrdered top-k via a bounded (top_k x 1)
    nested-loop join — the pair-explosion guard pattern does not apply
    to a 5-row diagnostic. Output is ``top_k`` rows — safe to collect
    and log in production jobs. Callers running repeated diagnostics
    over the same frame should persist it first; the operator stays
    side-effect-free by design.
    """
    if not key_cols:
        raise ValueError("skew_report needs at least one key column")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    sizes = df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    summary = sizes.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("__total"),
        F.expr("percentile(n_rows, 0.5)").alias("p50_size"),
        F.expr("percentile(n_rows, 0.9)").alias("p90_size"),
        F.max("n_rows").alias("max_size"),
    )
    top = sizes.orderBy(
        F.col("n_rows").desc(), *[F.col(k) for k in key_cols]
    ).limit(top_k)
    w = Window.orderBy(F.col("n_rows").desc(), *[F.col(k) for k in key_cols])
    return (
        top.join(F.broadcast(summary))
        .select(
            *key_cols,
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("n_rows") * 100.0 / F.col("__total"), 6).alias(
                "share_pct"
            ),
            F.row_number().over(w).cast("long").alias("heavy_rank"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.round("p50_size", 6).alias("p50_size"),
            F.round("p90_size", 6).alias("p90_size"),
            F.col("max_size").cast("long").alias("max_size"),
            F.round(
                F.col("max_size") * F.col("n_keys") / F.col("__total"), 6
            ).alias("skew_ratio"),
        )
    )
