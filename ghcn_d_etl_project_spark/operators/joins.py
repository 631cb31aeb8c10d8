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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gets the LATEST right row of the
    same key with ``right_ts <= left_ts`` (ties match).

    Spark has no ASOF JOIN operator; the scalable construction is the
    union-and-fill pattern: tag both sides, union, sort per key by
    (ts, side) with right rows first at equal timestamps, and propagate
    the last right payload forward with last(ignorenulls) over an
    unbounded-preceding ROWS frame. ONE shuffle on the key + a per-key
    sort — linear in |left|+|right|, no range pair explosion, and skew
    handling falls out of AQE like any window. ``tolerance_seconds``
    null-outs matches older than the window (pandas merge_asof
    semantics).
    """
    # The tolerance check reads the matched row's timestamp out of the
    # payload struct — carry right_ts internally even when the caller
    # didn't list it (only the caller's columns are emitted as asof_*).
    payload_cols = list(right_payload)
    if tolerance_seconds is not None and right_ts not in payload_cols:
        payload_cols.append(right_ts)
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("__payload")
    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
        F.lit(None).cast(
            right.select(payload).schema["__payload"].dataType
        ).alias("__payload"),
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("__row")
            ).schema["__row"].dataType
        ).alias("__row"),
        payload,
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    if tolerance_seconds is not None:
        # Cast defensively: unix_micros rejects TIMESTAMP_NTZ, and the ts
        # columns arrive straight from the caller (no loader in between).
        # No-op for TIMESTAMP inputs; see range_join_pairs for the
        # session-timezone caveat.
        match_ts = F.col("__match").getField(right_ts)
        in_window = (
            F.unix_micros(F.col("__ts").cast("timestamp"))
            - F.unix_micros(match_ts.cast("timestamp"))
        ) <= int(tolerance_seconds * 1_000_000)
        filled = filled.withColumn(
            "__match", F.when(in_window, F.col("__match"))
        )
    out_cols = [F.col("__row").getField(c).alias(c) for c in left.columns]
    out_cols += [
        F.col("__match").getField(c).alias(f"asof_{c}") for c in right_payload
    ]
    return filled.select(*out_cols)


def range_join_pairs(
    df: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    max_gap_seconds: float,
) -> DataFrame:
    """Ordered within-key event pairs at most ``max_gap_seconds`` apart
    (id1's event strictly earlier, ties broken by id).

    A naive theta self-join is O(rows^2) per key; bucketizing timestamps
    to the gap width bounds each probe to TWO buckets (its own and the
    next): pair (a,b) with 0 <= ts_b - ts_a <= w implies bucket(b) ∈
    {bucket(a), bucket(a)+1}. The join becomes an equi-join on
    (key, bucket) — shuffle-hashable, AQE-skew-splittable — with the
    exact gap predicate as a post-filter. This is the standard interval
    bucketing scheme Spark's range-join hints implement natively on
    Databricks; expressed here with plain operators.
    """
    us = int(max_gap_seconds * 1_000_000)
    # Cast defensively: unix_micros rejects TIMESTAMP_NTZ (the shape
    # tz-less pandas/pyarrow parquet loads as), so the operator must not
    # depend on callers routing input through load_table's normalization.
    # On a TIMESTAMP column the cast is a no-op; the session tz decides
    # the NTZ wall-clock interpretation (engine sessions pin UTC).
    ts_c = F.col(ts_col).cast("timestamp")
    base = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id"),
        ts_c.alias("ts"),
        F.unix_micros(ts_c).alias("us"),
        F.floor(F.unix_micros(ts_c) / us).alias("bucket"),
    )
    probe = base.select(
        "k", "id", "ts", "us",
        F.explode(F.array(F.col("bucket"), F.col("bucket") + 1)).alias("bucket"),
    )
    a = probe.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.k") == F.col("b.k")) & (F.col("a.bucket") == F.col("b.bucket")),
    ).filter(
        (F.col("b.us") - F.col("a.us")).between(0, us)
        & (
            (F.col("a.us") < F.col("b.us"))
            | ((F.col("a.us") == F.col("b.us")) & (F.col("a.id") < F.col("b.id")))
        )
    )
    return pairs.select(
        F.col("a.k").alias(key),
        F.col("a.id").alias("id1"),
        F.col("b.id").alias("id2"),
        F.col("a.ts").alias("ts1"),
        F.col("b.ts").alias("ts2"),
        (F.col("b.us") - F.col("a.us")).alias("gap_micros"),
    ).distinct()


def bitmap_filter(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    k: int = 2,
) -> DataFrame:
    """Build a fixed-size broadcastable bit-array membership filter over
    ``keys[key_col]`` — the application-level half of semi-join
    reduction (Bloom filter semantics built from DataFrame primitives;
    Spark's AUTOMATIC runtime bloom injection needs thresholds and a
    planner mood, this one is explicit and composable).

    Each key sets ``k`` bits at ``pmod(xxhash64(key, i), n_bits)``;
    the bit array is packed into ``n_bits/64`` longs (bucket =
    position >> 6) via per-bucket ``bit_or`` — a hash aggregate with
    map-side partials over a vocabulary bounded by n_bits/64, NOT by
    |keys| — then collapsed to ONE row holding a ``map<long,long>``.
    2^16 bits = 8 KiB, 2^24 = 2 MiB: broadcastable even when the raw
    key set (hundreds of millions of keys) is far beyond the broadcast
    threshold. False-positive rate ~ (1 - e^(-k*n/m))^k; NO false
    negatives by construction (``bitmap_prune`` keeps every true
    match — an exact join downstream stays exact).

    NULL keys are dropped build-side (an inner/semi join can never
    match them).
    """
    if n_bits < 64 or n_bits & (n_bits - 1):
        raise ValueError("n_bits must be a power of two >= 64")
    if k < 1:
        raise ValueError("k must be >= 1")
    pos = [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(n_bits))
        for i in range(k)
    ]
    exploded = keys.where(F.col(key_col).isNotNull()).select(
        F.explode(F.array(*pos)).alias("__pos")
    )
    # shiftleft/shiftright with a COLUMN shift amount: the Python
    # wrappers only take int literals, the SQL functions take expressions
    buckets = exploded.groupBy(
        F.call_function("shiftright", F.col("__pos"), F.lit(6)).alias("__bucket")
    ).agg(
        F.bit_or(
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("__pos") % 64).cast("int"),
            )
        ).alias("__bits")
    )
    return buckets.agg(
        F.map_from_entries(
            F.collect_list(F.struct("__bucket", "__bits"))
        ).alias("__bitmap")
    )


def bitmap_prune(
    df: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    k: int = 2,
) -> DataFrame:
    """Filter ``df`` to rows whose ``key_col`` MIGHT be in the filter
    built by :func:`bitmap_filter` (same ``n_bits``/``k`` — mismatched
    parameters silently probe wrong bits, so pass them together).

    The one-row bitmap broadcasts (BroadcastNestedLoopJoin of a single
    row = map-only); the probe is pure JVM bit arithmetic per row — no
    shuffle of ``df``, no UDF. Survivors are a superset of the true
    matches: follow with the exact join, which this prune exists to
    shrink (at 100 TB the win is shuffling only the ~selectivity
    fraction of the fact table instead of all of it).
    """
    probe = F.col(key_col)
    tests = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(probe, F.lit(i)), F.lit(n_bits))
        word = F.coalesce(
            F.element_at(
                "__bitmap", F.call_function("shiftright", pos, F.lit(6))
            ),
            F.lit(0).cast("long"),
        )
        bit = F.call_function(
            "shiftrightunsigned", word, (pos % 64).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        tests.append(bit == 1)
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    return (
        df.join(F.broadcast(bitmap), how="cross")
        .where(probe.isNotNull() & cond)
        .drop("__bitmap")
    )


def bitmap_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_bits: int = 1 << 16,
    k: int = 2,
) -> DataFrame:
    """Inner join with explicit semi-join reduction: prune ``fact`` by
    the dim-key bitmap BEFORE the join shuffles it. Result is exactly
    ``fact.join(dim, on)`` (the filter has no false negatives and the
    join re-verifies candidates) — which is what lets the DuckDB oracle
    be the plain join. Single-column ``on`` only (compose the key into
    one column for multi-key pruning)."""
    key = on if isinstance(on, str) else on[0]
    if not isinstance(on, str) and len(on) > 1:
        raise ValueError("bitmap_prune_join prunes on a single key column")
    bm = bitmap_filter(dim.select(key), key, n_bits=n_bits, k=k)
    pruned = bitmap_prune(fact, bm, key, n_bits=n_bits, k=k)
    return pruned.join(dim, on=key, how="inner")


def point_in_time_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    payload: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Point-in-time dimension lookup — the feature-store join: attach
    to each fact row the dim VERSION whose validity interval contains
    the fact timestamp (``valid_from <= ts < valid_to``, NULL
    ``valid_to`` = still current). The correctness property this
    encodes is no-future-leakage: a model-training fact can only see
    attribute values that were current WHEN IT HAPPENED — an as-of join
    against the dim's change EVENTS gives the same answer, but SCD2
    histories (``operators/cdc.py:scd2_apply`` output, warehouse dim
    tables) already carry the intervals, and joining them directly
    keeps the one-row-per-version shape auditable.

    Physical shape: an equi-join on the key(s) with the interval
    predicate as a JOIN condition (not a post-filter — preserved left
    rows must survive with NULLs under ``how="left"``). One shuffle on
    the key for each side (zero if both are bucketed on it); per-key
    fan-out is bounded by versions-per-key, which is what an SCD2
    history bounds by construction. With NON-OVERLAPPING intervals per
    key (the SCD2 contract) each fact matches at most one version;
    overlapping intervals duplicate fact rows — that is surfaced, not
    hidden, because silently picking one would mask a corrupt history.

    ``payload`` (default: all dim columns except key/validity) lists
    the dim columns carried onto the fact; collisions with fact columns
    raise.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("left", "inner"):
        raise ValueError(f"unknown how {how!r} (left|inner)")
    if payload is None:
        payload = [
            c for c in dim.columns
            if c not in keys and c not in (valid_from, valid_to)
        ]
    for c in payload:
        if c in fact.columns:
            raise ValueError(f"payload column {c!r} collides with fact")
    d = dim.select(*keys, valid_from, valid_to, *payload).alias("__d")
    f = fact.alias("__f")
    ts = F.col(f"__f.{ts_col}")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"__f.{k}") == F.col(f"__d.{k}"))
    cond = (
        cond
        & (F.col(f"__d.{valid_from}") <= ts)
        & (
            F.col(f"__d.{valid_to}").isNull()
            | (ts < F.col(f"__d.{valid_to}"))
        )
    )
    joined = f.join(d, cond, how=how)
    return joined.select(
        *[F.col(f"__f.{c}") for c in fact.columns],
        F.col(f"__d.{valid_from}").alias(valid_from),
        F.col(f"__d.{valid_to}").alias(valid_to),
        *[F.col(f"__d.{c}") for c in payload],
    )
