"""Incremental aggregate maintenance — merge partial aggregates instead of
recomputing the world.

The reference recomputes every gold aggregate from the full silver table
on each run and overwrites the output (reference:
``src/transform/gold_processor.py`` — each mart is a fresh groupBy over
all of silver, written ``mode("overwrite")`` at line 253). A 100 TB
rollup (daily revenue by flag/status, say) must not be rebuilt
from scratch when a day of new data lands. The standard fix is the
algebraic-aggregate decomposition every distributed engine uses
internally for map-side combine, lifted to PIPELINE level: keep the
rollup stored as mergeable PARTIALS (sum, count, min, max — and avg as
sum+count), compute the same partials over just the new batch, and fold
them together with a groupBy over the union. Merging partials over K
batches is associative and commutative, so the maintained rollup is
bit-identical (sums quantized to DECIMAL — see ``plans/_util.py``) to a
full recompute, which is exactly what the registered query's oracle
asserts.

Cost: the merge touches O(|stored rollup| + |batch partials|) rows — the
rollup's own (small) cardinality, never the 100 TB of history. The batch
partial is one shuffle over the batch alone.

Spec grammar (same shape as ``operators/skew.py:salted_agg``):
``("col", "sum"|"count"|"min"|"max", "alias")`` — plus
``("col", "avg", "alias")`` which decomposes into hidden sum+count
partials and is derived at :func:`finalize_partials` time.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Spec = tuple[str, str, str]

# partial-op -> (batch aggregate fn, merge aggregate fn)
_OPS = {
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "count": (lambda c: F.count(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
}


def _expand(specs: list[Spec]) -> tuple[list[Spec], list[Spec], set[str]]:
    """Rewrite avg specs into hidden sum/count partials; return
    (physical_specs, avg_specs, hidden_aliases). The hidden set is
    tracked EXPLICITLY (round-7 advice): inferring it back from an
    ``__avg_`` prefix would silently drop a user-supplied sum/count
    alias that happens to start with the prefix. A user alias that
    collides with a generated hidden name (or any duplicate alias)
    raises instead."""
    physical: list[Spec] = []
    avgs: list[Spec] = []
    hidden: set[str] = set()
    for col, op, alias in specs:
        if op == "avg":
            physical.append((col, "sum", f"__avg_sum_{alias}"))
            physical.append((col, "count", f"__avg_cnt_{alias}"))
            hidden.update((f"__avg_sum_{alias}", f"__avg_cnt_{alias}"))
            avgs.append((col, op, alias))
        elif op in _OPS:
            physical.append((col, op, alias))
        else:
            raise ValueError(f"unsupported op {op!r} (use sum/count/min/max/avg)")
    all_aliases = [a for _, _, a in physical] + [a for _, _, a in avgs]
    dupes = {a for a in all_aliases if all_aliases.count(a) > 1}
    if dupes:
        raise ValueError(f"duplicate/colliding aliases in specs: {sorted(dupes)}")
    return physical, avgs, hidden


def partial_agg(
    df: DataFrame, keys: list[str], specs: list[Spec], decimal: str = "decimal(24,6)"
) -> DataFrame:
    """Per-key mergeable partials over one batch. Sums go through DECIMAL
    so later merges are order-insensitive and exact."""
    physical, _, _ = _expand(specs)
    aggs = []
    for col, op, alias in physical:
        c = F.col(col).cast(decimal) if op == "sum" else F.col(col)
        aggs.append(_OPS[op][0](c).alias(alias))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    parts: list[DataFrame], keys: list[str], specs: list[Spec]
) -> DataFrame:
    """Fold any number of partial tables into one: union → groupBy →
    per-op merge aggregate (sum-of-sums, sum-of-counts, min-of-mins,
    max-of-maxes). Associative: merging incrementally batch-by-batch
    equals merging all at once."""
    physical, _, _ = _expand(specs)
    merged_aggs = [
        _OPS[op][1](F.col(alias)).alias(alias) for _, op, alias in physical
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    return unioned.groupBy(*keys).agg(*merged_aggs)


def finalize_partials(merged: DataFrame, specs: list[Spec]) -> DataFrame:
    """Project the user-facing columns out of a merged-partials table:
    sums cast back to DOUBLE, counts to BIGINT, avg derived as
    double(sum)/count (bit-identical across engines — both sides divide
    identical doubles by identical longs)."""
    physical, avgs, hidden = _expand(specs)
    cols = []
    for _, op, alias in physical:
        if alias in hidden:
            continue
        if op == "sum":
            cols.append(F.col(alias).cast("double").alias(alias))
        elif op == "count":
            cols.append(F.col(alias).cast("long").alias(alias))
        else:
            cols.append(F.col(alias))
    for _, _, alias in avgs:
        cols.append(
            (
                F.col(f"__avg_sum_{alias}").cast("double")
                / F.col(f"__avg_cnt_{alias}")
            ).alias(alias)
        )
    key_cols = [c for c in merged.columns if not any(c == a for _, _, a in physical)]
    return merged.select(*key_cols, *cols)


# ---------------------------------------------------------------------------
# Mergeable quantile partials: incremental maintenance for percentiles
# ---------------------------------------------------------------------------
#
# sum/count/min/max/avg above are ALGEBRAIC — their partials merge
# losslessly. Quantiles are HOLISTIC: no fixed-size exact partial exists,
# and Spark's percentile_approx keeps its QuantileSummaries state
# internal, so it cannot be stored and merged across pipeline runs. The
# standard scale answer is a histogram sketch with DETERMINISTIC binning:
# per-key fixed-width bin counts over a caller-declared [lo, hi) domain.
# Bin counts are plain longs, so the partial is mergeable by summation
# (associative + commutative, same contract as merge_partials), the
# stored state is O(keys x n_bins) regardless of history size, and —
# because the binning rule is pure double arithmetic — ANY engine
# reproduces the identical sketch, which is what lets a DuckDB oracle
# verify the merge path bit-for-bit against a full recompute.
#
# Error model: a quantile estimate is linear interpolation inside one
# bin, so it is exact-to-within one bin width (hi-lo)/n_bins for
# in-domain values; out-of-domain values clamp into the edge bins (the
# estimate then degrades toward lo/hi — size the domain from a bounded
# approxQuantile probe or domain knowledge). Long-format partials
# (keys, __qbin, __qcnt) keep every step a plain groupBy/window —
# no array aggregation, and the same shape is one GROUP BY in SQL.


def quantile_partial(
    df: DataFrame,
    keys: list[str],
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Per-key mergeable histogram partial over one batch: long-format
    ``(keys..., __qbin, __qcnt)``. Binning is the pure-arithmetic
    ``floor((v - lo) / (hi - lo) * n_bins)`` clamped to ``[0, n_bins)``
    — engine-portable and deterministic. NULL values are excluded (as
    every aggregate does). One shuffle over the BATCH only."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if n_bins < 2:
        raise ValueError(f"need n_bins >= 2, got {n_bins}")
    b = F.floor((F.col(col) - F.lit(float(lo))) / F.lit(float(hi - lo)) * n_bins)
    b = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b)).cast("long")
    return (
        df.filter(F.col(col).isNotNull())
        .select(*keys, b.alias("__qbin"))
        .groupBy(*keys, "__qbin")
        .agg(F.count(F.lit(1)).alias("__qcnt"))
    )


def merge_quantile_partials(parts: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold histogram partials: union → groupBy(keys, bin) → sum of
    counts. Associative and commutative, so batch-by-batch maintenance
    equals one-shot aggregation — cost O(sum of partial sizes), bounded
    by keys x n_bins per partial, never O(history)."""
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    return unioned.groupBy(*keys, "__qbin").agg(F.sum("__qcnt").alias("__qcnt"))


def finalize_quantiles(
    merged: DataFrame,
    keys: list[str],
    lo: float,
    hi: float,
    n_bins: int,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    out_name: str = "est",
) -> DataFrame:
    """Project quantile estimates out of a merged histogram: one row per
    (key, q) with the interpolated estimate.

    Per key: running bin total (one window over the TINY rollup —
    keys x n_bins rows), each requested ``q`` exploded alongside, the
    first bin whose cumulative count reaches ``q * total`` wins
    (row_number = 1), and the estimate interpolates linearly inside that
    bin, clamped to the declared domain. Every step is portable SQL
    (windows + arithmetic) — the oracle twin runs the same construction
    in DuckDB and must agree bit-for-bit."""
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        # q > 1 would silently emit NO row (cum >= q*total never holds);
        # q <= 0 trivially selects the first bin — both are caller bugs
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile {q} outside (0, 1]")
    wb = Window.partitionBy(*keys).orderBy("__qbin")
    wk = Window.partitionBy(*keys)
    width = float(hi - lo) / n_bins
    e = (
        merged.withColumn("__cum", F.sum("__qcnt").over(wb))
        .withColumn("__tot", F.sum("__qcnt").over(wk))
        .select(
            *keys,
            "__qbin",
            "__qcnt",
            "__cum",
            "__tot",
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
        )
    )
    qual = e.filter(F.col("__cum") >= F.col("q") * F.col("__tot"))
    wq = Window.partitionBy(*keys, "q").orderBy("__qbin")
    first = qual.withColumn("__rn", F.row_number().over(wq)).filter(
        F.col("__rn") == 1
    )
    frac = (
        F.col("q") * F.col("__tot") - (F.col("__cum") - F.col("__qcnt"))
    ) / F.col("__qcnt")
    est = F.lit(float(lo)) + F.lit(width) * (F.col("__qbin") + frac)
    est = F.least(F.lit(float(hi)), F.greatest(F.lit(float(lo)), est))
    return first.select(*keys, "q", est.alias(out_name))


# ---------------------------------------------------------------------------
# Mergeable top-k maintenance: incremental heavy hitters (exact)
# ---------------------------------------------------------------------------


def topk_partial(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-(key, value) occurrence counts over one batch — the mergeable
    partial for EXACT maintained top-k. One shuffle over the batch.

    Honest state bound: exact top-k cannot be maintained from O(k)
    state (an unseen value may overtake later), so the stored rollup is
    O(keys x distinct values) — the right tool when the value domain is
    bounded (domains, languages, labels, suppliers); for unbounded
    domains the bounded-memory alternative is an approximate
    SpaceSaving/count-min sketch, a different (approximate) contract
    this engine exposes via ``approx_distinct``-style rows-only checks
    rather than pretending exactness."""
    return df.groupBy(*keys, value_col).agg(
        F.count(F.lit(1)).alias("__tk_cnt")
    )


def merge_topk_partials(parts: list[DataFrame], keys: list[str], value_col: str) -> DataFrame:
    """Fold count partials: union → groupBy(keys, value) → sum.
    Associative and commutative — batch-by-batch maintenance equals
    one-shot; cost O(sum of partial sizes), never O(history rows)."""
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    return unioned.groupBy(*keys, value_col).agg(
        F.sum("__tk_cnt").alias("__tk_cnt")
    )


def finalize_topk(
    merged: DataFrame,
    keys: list[str],
    value_col: str,
    k: int,
    count_name: str = "n",
) -> DataFrame:
    """Rank the merged rollup and keep each key's top ``k`` values —
    count desc, value asc as the deterministic tie-break (both engines
    rank identically, so the oracle can assert exact rows). The window
    runs over the rollup (keys x values), never the raw history."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    w = Window.partitionBy(*keys).orderBy(
        F.col("__tk_cnt").desc(), F.col(value_col).asc()
    )
    return (
        merged.withColumn("__tk_rn", F.row_number().over(w))
        .filter(F.col("__tk_rn") <= k)
        .select(
            *keys,
            value_col,
            F.col("__tk_cnt").cast("long").alias(count_name),
            F.col("__tk_rn").cast("long").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable distinct-count maintenance: HLL sketch partials
# ---------------------------------------------------------------------------


def distinct_partial(
    df: DataFrame, keys: list[str], col: str, lg_k: int = 12
) -> DataFrame:
    """Per-key HyperLogLog sketch over one batch (Spark's native
    Apache DataSketches ``hll_sketch_agg`` — JVM-side, mergeable
    binary). The maintained-distinct-count partial: store the sketch,
    not the values. O(2^lg_k) bytes per key regardless of batch size;
    one shuffle over the batch."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("__hll")
    )


def merge_distinct_partials(parts: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold sketch partials: union → ``hll_union_agg`` per key.
    Register-wise max is associative and commutative, so maintenance
    order cannot bias the registers — but UNLIKE the algebraic /
    histogram / count families, the merged ESTIMATE is not bit-identical
    to a one-shot sketch: DataSketches keeps small sketches in an exact
    sparse mode, and the union promotes them to dense HLL, so the two
    paths can differ within the sketch's own error (measured 0.95%
    apart at lg_k=12 on 2000 true distincts, both within ~1.6% of
    exact). The pinned contract is therefore an ERROR BAND, not
    equality. Cost O(sum of partial sizes), never O(history)."""
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    return unioned.groupBy(*keys).agg(
        F.hll_union_agg(F.col("__hll")).alias("__hll")
    )


def finalize_distinct(
    merged: DataFrame, keys: list[str], out_name: str = "approx_distinct"
) -> DataFrame:
    """Project the estimate out of the merged sketch table."""
    return merged.select(
        *keys, F.hll_sketch_estimate("__hll").cast("long").alias(out_name)
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 3,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a value
    column: the bounded-memory approximate-count state ``topk_partial``
    (above) names as the honest alternative for UNBOUNDED value
    domains — O(width x depth) counters regardless of cardinality,
    mergeable across batches/partitions by plain addition.

    Engine-portable determinism: row ``d``'s hash is the first 8 md5
    hex chars of ``value:salt:d`` mod width — so the sketch (and hence
    every estimate) is identical on any engine/partitioning, which is
    what lets an APPROXIMATE structure carry an exact value-hash
    oracle.

    Scale design: one explode of ``depth`` (d, bucket) structs per row,
    then ONE groupBy — map-side partial aggregation collapses every
    partition to <= width x depth rows before the shuffle, so shuffle
    volume is sketch-sized, never data-sized. NULL values are excluded
    (they are not countable items).

    Output: ``(d long, bucket long, cnt long)`` — only touched cells
    (absent cell = 0); merge sketches by union + re-sum.
    """
    if width < 1 or depth < 1:
        raise ValueError(f"width and depth must be >= 1, got {width}x{depth}")
    v = F.col(value_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("d"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(v, F.lit(f":{salt}:{d}"))), 1, 8
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 3,
    salt: str = "cms",
) -> DataFrame:
    """Point-query a count-min sketch: for each candidate value, the
    estimate is ``min over d of cnt[d, hash_d(value)]`` — always >= the
    true count (one-sided error), <= true + eps*N with probability
    1 - (1/2)^depth for eps = e/width.

    The candidate set is the caller's contract (a dim table, a label
    vocabulary, last period's heavy hitters) — sketch estimates are
    only meaningful for values you can name. Plan shape: candidates
    join the sketch ``depth`` ways on (d, bucket) — the sketch side is
    sketch-sized, so AQE broadcasts it; one min-aggregate per
    candidate. Missing cells coalesce to 0 (a value hashing only to
    untouched cells has true count 0).

    Output: ``(value_col, est long)``.
    """
    if width < 1 or depth < 1:
        raise ValueError(f"width and depth must be >= 1, got {width}x{depth}")
    v = F.col(value_col).cast("string")
    cand = candidates.filter(F.col(value_col).isNotNull()).distinct()
    probes = cand.select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("long").alias("d"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(v, F.lit(f":{salt}:{d}"))
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long")
                            % width
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(value_col, F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    joined = probes.join(sketch, ["d", "bucket"], "left").select(
        value_col, F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
    )
    return joined.groupBy(value_col).agg(F.min("cnt").cast("long").alias("est"))
