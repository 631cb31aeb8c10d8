"""Streaming deduplication: event-time-bounded duplicate suppression.

The streaming twin of the batch dedup family (``operators/dedup.py``).
An unbounded ``dropDuplicates`` on a stream keeps EVERY key ever seen in
the state store — state grows with stream lifetime and the job
eventually OOMs or spills forever; that is the known anti-pattern.
``dropDuplicatesWithinWatermark`` instead bounds state by TIME: a key's
dedup state is evicted once the watermark passes its event time plus
the delay, so state size is (arrival rate x watermark horizon), not
stream length — the only shape that survives an always-on 100 TB/day
ingest job.

Semantics: within any window of ``delay`` (event time), the first
arrival of a key wins and later arrivals are dropped; re-arrivals
SEPARATED by more than the watermark horizon are treated as new (at-
least-once downstream dedup still applies — exactly-once per horizon is
the contract, matching what idempotent sinks need).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

__all__ = ["dedup_stream"]


def dedup_stream(
    sdf: DataFrame,
    keys: Sequence[str],
    event_time_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Watermark-bounded streaming dedup on ``keys``.

    ``delay`` is the event-time horizon (Spark interval string): how
    long a key's identity is remembered, and therefore how late a
    duplicate may arrive and still be suppressed. State per key is one
    timestamp — eviction is automatic at the watermark.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    return sdf.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )
