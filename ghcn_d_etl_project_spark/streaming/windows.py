"""Event-time window aggregations: tumbling, sliding, session.

Built on ``F.window`` / ``F.session_window``, which Spark evaluates
identically over batch DataFrames and streaming DataFrames — so each
operator here serves twice:

  * batch mode: registered as an oracle-checked query (DuckDB restates
    tumbling/sliding windows with date_trunc/time-bucket arithmetic and
    session windows with a gaps-and-islands window-function rewrite);
  * streaming mode: the same call on ``readStream`` input, with
    ``withWatermark`` bounding state (tests/test_streaming.py runs it
    through a memory sink and checks it converges to the batch answer).

Scale notes: windowed group-bys shuffle on (window, keys) exactly like
any hash aggregate; Spark plans partial aggregation map-side first.
Session windows keep per-key state until watermark + gap passes — the
watermark is what makes 100 TB/day streams bounded-memory; in batch mode
``session_window`` is planned as sort + merge within each key partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ts_fmt(col: Column) -> Column:
    """Window bounds → 'yyyy-MM-dd HH:mm:ss' strings (oracle parity)."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows: one row per (window, keys).

    Windows are epoch-aligned half-open intervals [start, start+duration)
    — identical to ``date_trunc`` bucketing for divisor durations.
    """
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), duration)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(*aggs)
        .select(
            _ts_fmt(F.col("w.start")).alias("window_start"),
            _ts_fmt(F.col("w.end")).alias("window_end"),
            *keys,
            *[c for c in _agg_names(aggs)],
        )
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows of ``duration`` starting every ``slide``.

    Each event lands in duration/slide windows; Spark expands the event
    to its windows before the hash aggregate (same shuffle shape as
    tumbling, multiplied by the overlap factor).
    """
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), duration, slide)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(*aggs)
        .select(
            _ts_fmt(F.col("w.start")).alias("window_start"),
            _ts_fmt(F.col("w.end")).alias("window_end"),
            *keys,
            *[c for c in _agg_names(aggs)],
        )
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Dynamic-length sessions per key: a session extends while
    consecutive events arrive within ``gap``; window end = last event +
    gap. The SQL-oracle twin is the classic gaps-and-islands rewrite
    (lag → new-session flag → running sum → group)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(*aggs)
        .select(
            _ts_fmt(F.col("w.start")).alias("session_start"),
            _ts_fmt(F.col("w.end")).alias("session_end"),
            *keys,
            *[c for c in _agg_names(aggs)],
        )
    )


def _agg_names(aggs: Sequence[Column]) -> list[Column]:
    """Re-reference aggregate output columns by their alias names."""
    return [F.col(_alias_of(a)) for a in aggs]


def _alias_of(col: Column) -> str:
    # Column's alias is the last name in its expression tree; Spark
    # exposes it via the jvm expression name. Use the string repr as a
    # portable fallback: "Column<'count(1) AS n_events'>".
    s = repr(col)
    if " AS " in s:
        return s.rsplit(" AS ", 1)[1].rstrip("'>`").strip("`")
    raise ValueError(f"aggregate column must be aliased: {s}")
