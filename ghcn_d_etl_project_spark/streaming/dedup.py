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

__all__ = [
    "dedup_stream",
    "dedup_stream_against_reference",
    "neardup_gate_stream",
]


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


def dedup_stream_against_reference(
    sdf: DataFrame,
    ref_df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Streaming twin of the batch incremental-ingestion gate
    (``operators/dedup.py:dedup_against_reference``'s exact arm): drop
    incoming documents whose normalized content fingerprint already
    exists in a STATIC reference corpus — the continuous form of "a
    crawl batch lands against the corpus".

    Implementation is a stream-STATIC left anti join on the 128-bit
    fingerprint: Spark supports static sides in streaming joins
    natively (the static frame is re-resolved per micro-batch, so a
    reference refreshed in place is picked up without restarting the
    query), the join is stateless on the stream side (no watermark
    needed — the static side is the state), and anti-join semantics
    mean survivors flow through untouched, exactly once per input row.
    Near-dup gating in-stream needs the LSH banding substrate and is
    done in ``foreachBatch`` with the batch operator — exact-arm
    gating is the part that maps onto a native streaming join.

    ``ref_df`` must be a STATIC DataFrame of reference documents
    (``id_col``/``text_col`` schema); duplicates in-stream are NOT
    suppressed here (compose with :func:`dedup_stream` for that).
    """
    from ghcn_d_etl_project_spark.operators.textops import fingerprint

    from pyspark.sql import functions as F

    ref_fp = ref_df.filter(F.col(text_col).isNotNull()).select(
        fingerprint(text_col).alias("__fp")
    ).distinct()
    return (
        sdf.withColumn("__fp", fingerprint(F.col(text_col)))
        .join(ref_fp, "__fp", "left_anti")
        .drop("__fp")
    )


def neardup_gate_stream(
    sdf: DataFrame,
    ref_df: DataFrame,
    id_col: str,
    text_col: str,
    out_dir: str,
    checkpoint_path: str,
    n: int = 4,
    threshold: float = 0.5,
    n_hashes: int = 64,
    bands: int = 32,
    await_seconds: int = 300,
) -> None:
    """The FULL three-way incremental-ingestion verdict (exact_dup /
    near_dup / clean) as a continuous gate — the ``foreachBatch``
    companion :func:`dedup_stream_against_reference`'s docstring
    promises for the near arm (LSH banding substrates don't map onto
    native streaming joins, so each micro-batch is judged by the BATCH
    operator instead of pretending otherwise).

    The production economics live in the reference index:
    ``reference_dedup_index`` shingles/signs/bands the corpus ONCE
    before the query starts, both substrate frames stay persisted for
    the query's lifetime, and every micro-batch reuses them via
    ``ref_index`` — per-batch work is the batch's own shingling plus
    band-bucket equi-joins, never a recomputation (or re-shuffle) of
    the corpus. Verdicts are per-document and reference-only, so any
    micro-batch partitioning of the input yields the same rows as one
    big batch — pinned against the batch operator in
    ``tests/test_streaming.py``.

    Output: verdict rows (doc_id, verdict, dup_of, jaccard) appended
    to ``out_dir`` as parquet; offsets are exactly-once via the
    checkpoint (``availableNow`` — the cron-cadence incremental
    pattern), with the usual foreachBatch caveat that a crash INSIDE a
    batch may append it twice on replay (dedupe downstream on doc_id
    or point ``out_dir`` at a transactional table format).
    """
    from ghcn_d_etl_project_spark.operators.dedup import (
        dedup_against_reference,
        reference_dedup_index,
        reference_fingerprints,
    )

    held: list[DataFrame] = []
    ref_index = reference_dedup_index(
        ref_df, id_col, text_col,
        n=n, n_hashes=n_hashes, bands=bands, release_into=held,
    )
    # exact arm's substrate, computed once like the band index (r13):
    # without it every micro-batch re-hashes the whole corpus for the
    # fingerprint equi-join
    ref_fps = reference_fingerprints(
        ref_df, id_col, text_col, release_into=held
    )
    # materialize the index before the stream starts (r14, see
    # streaming/quality.py): persist() is lazy and the corpus-side
    # build otherwise lands inside micro-batch 1's trigger
    for f in held:
        f.count()

    def judge(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        # per-batch release list: the batch side's persisted shingle
        # sets die with the batch — only the reference index outlives
        # micro-batches (a leak here accumulates one cached frame per
        # batch for the query's lifetime)
        batch_held: list[DataFrame] = []
        dedup_against_reference(
            batch, ref_df, id_col, text_col,
            n=n, threshold=threshold, n_hashes=n_hashes, bands=bands,
            ref_index=ref_index, ref_fingerprints=ref_fps,
            release_into=batch_held,
        ).write.mode("append").parquet(out_dir)
        for f in batch_held:
            f.unpersist()

    q = (
        sdf.writeStream.foreachBatch(judge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(await_seconds)
    finally:
        for f in held:
            f.unpersist()
