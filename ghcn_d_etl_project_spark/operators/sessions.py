"""Batch sessionization — gap-based session assignment over an event log.

The streaming side of the engine already has ``session_window`` aggregation
(``plans/streaming.py``, Structured Streaming's native session windows);
this is the BATCH twin the reference-style ETL needs when re-sessionizing
history: assign every event a per-key session number such that two
consecutive events of the same key belong to the same session iff they are
at most ``gap`` apart (the classic web-analytics / clickstream definition,
and the batch semantics matching ``F.session_window``).

Construction (pure window functions, no UDF, no iteration):
  1. one shuffle on the session key (window partition);
  2. ``lag(ts)`` marks session STARTS (first event, or gap exceeded);
  3. a running ``sum`` of the start flags over the same window ordering
     numbers the sessions 1..n per key.
Both window functions share one partition ordering, so Catalyst evaluates
them in a single Window physical operator after a single sort — the whole
operator is one shuffle + one sort, which is the lower bound for any
order-dependent per-key computation.

Scale posture: sessions are computed per key; the shuffle is on the key
alone, so key skew (one whale user) concentrates that user's events in
one task — the same caveat every engine's sessionization has, because a
session chain is inherently sequential per key. Gap comparison uses
``unix_micros`` (exact integer micros) rather than double seconds, so the
boundary decision is bit-identical across engines (DuckDB twin:
``epoch_us``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str | list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: tuple[str, ...] = (),
    out_col: str = "session_seq",
) -> DataFrame:
    """Append ``out_col``: the 1-based session number of each row within
    its ``key``, where a new session starts when the gap to the previous
    event (by ``ts_col`` then ``order_cols``) exceeds ``gap_seconds``.

    ``order_cols`` breaks timestamp ties deterministically (pass a unique
    id column when timestamps can collide — without it the running sum is
    still correct but row attribution at the boundary is tie-ambiguous).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(ts_col, *order_cols)
    micros = F.unix_micros(F.col(ts_col))
    prev = F.lag(micros).over(w)
    is_start = (
        prev.isNull() | ((micros - prev) > F.lit(int(gap_seconds) * 1_000_000))
    ).cast("long")
    running = Window.partitionBy(*keys).orderBy(ts_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(out_col, F.sum(is_start).over(running))


def session_bounds(
    df: DataFrame,
    key: str | list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: tuple[str, ...] = (),
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Sessionize then collapse to one row per (key, session): start/end
    timestamps, event count, plus any caller aggregates. Two shuffles
    total (the window partition, then the groupBy on the same leading
    keys — AQE can avoid the second exchange since partitioning on
    (key) already co-locates (key, session_seq) groups)."""
    keys = [key] if isinstance(key, str) else list(key)
    s = sessionize(df, keys, ts_col, gap_seconds, order_cols)
    return s.groupBy(*keys, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        *(aggs or []),
    )


def collapse_bursts(
    df: DataFrame,
    key: str | list[str],
    ts_col: str = "ts",
    gap_seconds: int = 60,
    order_cols: tuple[str, ...] = (),
    keep: str = "first",
) -> DataFrame:
    """Collapse retry/duplicate BURSTS: within each key, consecutive
    events closer than ``gap_seconds`` form one burst (the gap-session
    construction of :func:`sessionize`), and only the burst's first (or
    last) event survives — the batch twin of streaming
    ``dropDuplicatesWithinWatermark``-style storm suppression, with the
    well-defined chained semantics a per-row lag filter cannot give
    (lag-based "drop if previous raw event is near" also drops the
    survivor's legitimate successor; burst-grouping keeps exactly one
    row per storm however long the chain).

    Output: the surviving input rows (all original columns) plus
    ``burst_size``. Physical shape: the sessionize window (one shuffle
    on the key + per-key sort) and a per-(key, burst) collapse via
    ``min/max(struct(ts, order_cols, row))`` — the same
    partial-combining survivorship aggregate as
    ``operators/survivorship.py``, reusing the key partitioning, so
    nothing re-shuffles. Pass a unique tiebreak in ``order_cols`` when
    timestamps can collide.
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be first|last, got {keep!r}")
    keys = [key] if isinstance(key, str) else list(key)
    if "burst_size" in df.columns:
        raise ValueError("input already has a burst_size column")
    numeric = {
        "tinyint", "smallint", "int", "integer", "bigint", "long",
        "float", "double", "boolean",
    }
    dtypes = dict(df.dtypes)
    for c in order_cols:
        if dtypes.get(c) not in numeric:
            raise ValueError(
                f"order_cols must be numeric for the struct-max collapse; "
                f"{c!r} is {dtypes.get(c, 'missing')}"
            )
    s = sessionize(df, keys, ts_col, gap_seconds, order_cols, out_col="__burst")
    ordered = [F.unix_micros(F.col(ts_col)).cast("double")] + [
        F.col(c).cast("double") for c in order_cols
    ]
    if keep == "first":
        ordered = [-c for c in ordered]
    winner = F.max(
        F.struct(*ordered, F.struct(*df.columns).alias("__row"))
    ).alias("__w")
    agged = s.groupBy(*keys, "__burst").agg(
        winner, F.count(F.lit(1)).alias("burst_size")
    )
    return agged.select(
        *[F.col(f"__w.__row.{c}").alias(c) for c in df.columns],
        F.col("burst_size").cast("long").alias("burst_size"),
    )
