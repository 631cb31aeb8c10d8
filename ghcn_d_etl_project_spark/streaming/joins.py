"""Stream-stream joins: watermark-bounded event correlation.

The batch engine correlates event streams with the as-of and range
joins (``operators/joins.py``, ``plans/joins.py``); an always-on
pipeline needs the same correlation while BOTH sides are still
arriving — ad impressions joined to their clicks, observation readings
joined to their quality-control acknowledgements. Structured Streaming
supports exactly this shape: equi-key + event-time-range inner/outer
joins where each side's watermark bounds how long the other side's
unmatched rows are buffered.

Scale design: state size is the product of key arrival rate and the
(watermark + time-range) horizon, NOT the stream length — Spark evicts
buffered rows as soon as the other side's watermark passes the join
window. The join key must be in the condition (hash-partitioned state
store per key); the time-range predicate must bound the match window on
BOTH ends or state grows without bound (this module refuses unbounded
specs rather than silently buffering forever). Outer results emit only
after watermark expiry — the convergence test drains with
``availableNow`` and compares against the batch formulation on the same
rows, the same cross-check discipline every other streaming op here
uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join"]

_HOWS = ("inner", "leftOuter", "left_outer")


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delay_seconds: int,
    watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``on`` where the right event lands in
    ``[left_ts, left_ts + max_delay_seconds]`` — "each left event picks
    up the right events that follow it within the delay horizon".

    Both inputs get ``watermark`` on their own time column (required by
    Spark for state eviction; for outer joins also for emitting NULL
    matches). ``left_ts`` and ``right_ts`` must be distinct names and
    the non-key columns disjoint, so the output schema needs no
    prefixing. ``max_delay_seconds`` must be positive and finite — the
    two-sided bound is what makes join state bounded.

    Works identically on batch DataFrames (watermarks are a no-op
    there), which is how the convergence test cross-checks it.

    Outer-join caveat (inherent to watermark semantics, not a defect):
    an unmatched left row emits its NULL-padded result only once the
    RIGHT watermark passes ``left_ts + max_delay_seconds`` — rows within
    that horizon of the end of the input have their "no match" still
    undecided when an ``availableNow`` drain stops, stay buffered in the
    checkpoint, and emit on the next run once later data advances the
    watermark. The convergence test therefore compares the decided
    region only.
    """
    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}, got {how!r}")
    if max_delay_seconds <= 0:
        raise ValueError("max_delay_seconds must be positive")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct names")
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            f"non-key columns must be disjoint, overlap: {sorted(overlap)}"
        )

    l = left.withWatermark(left_ts, watermark).alias("__l")
    r = right.withWatermark(right_ts, watermark).alias("__r")
    cond = (
        (F.col(f"__l.{on}") == F.col(f"__r.{on}"))
        & (F.col(f"__r.{right_ts}") >= F.col(f"__l.{left_ts}"))
        & (
            F.col(f"__r.{right_ts}")
            <= F.col(f"__l.{left_ts}")
            + F.expr(f"INTERVAL {int(max_delay_seconds)} SECONDS")
        )
    )
    out = l.join(r, cond, how)
    # one copy of the key; everything else is disjoint by the guard
    return out.select(
        F.col(f"__l.{on}").alias(on),
        *[
            F.col(f"__l.{c}")
            for c in left.columns
            if c != on
        ],
        *[
            F.col(f"__r.{c}")
            for c in right.columns
            if c != on
        ],
    )
