"""Streaming ingest gate: the COMPOSED admission decision a continuous
training-data pipeline runs on every arriving micro-batch — first
"does it look right?" (the Gopher rule gate), then, only for rule
survivors, "have we seen it before?" (the banded incremental dedup
against the published corpus index). One verdict row per arriving doc.

This is the composition the batch operators were built for:
``operators/textops.py:gopher_rules`` x
``operators/dedup.py:dedup_against_reference`` behind one
``foreachBatch`` (the LSH banding substrates don't map onto native
streaming joins — the ``streaming/dedup.py:neardup_gate_stream``
argument). Ordering matters for cost at scale: the rule gate is a
scan-bound projection that typically kills a large fraction of a crawl
batch BEFORE any shingling happens, so the dedup arm's per-batch work
is (rule survivors) x (three parquet-index scans), never the raw batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ingest_gate_stream", "RULE_ORDER"]

# first-failing-rule attribution order (the Gopher paper's listing
# order): a doc failing several rules reports the earliest
RULE_ORDER = ("r_wordcount", "r_meanlen", "r_symbol", "r_alpha", "r_stop")


def _gate_batch(
    batch: DataFrame,
    ref_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int,
    threshold: float,
    n_hashes: int,
    bands: int,
    ref_index,
    ref_fingerprints,
    release_into: list[DataFrame] | None = None,
) -> DataFrame:
    """One batch through the composed gate; shared by the streaming
    wrapper and the batch-parity test. Output: (doc_id, verdict,
    dup_of, jaccard, admit). Verdicts: 'rule:<name>' (first failing
    Gopher rule) | 'exact_dup' | 'near_dup' | 'clean'; admit is TRUE
    exactly for 'clean'."""
    from ghcn_d_etl_project_spark.operators.dedup import (
        dedup_against_reference,
    )
    from ghcn_d_etl_project_spark.operators.textops import gopher_rules

    rules = gopher_rules(batch, id_col=id_col, text_col=text_col).persist()
    if release_into is not None:
        release_into.append(rules)
    first_fail = F.coalesce(
        *[
            F.when(~F.col(r), F.lit(f"rule:{r}"))
            for r in RULE_ORDER
        ]
    )
    failed = rules.filter(~F.col("keep")).select(
        F.col(id_col).alias("doc_id"),
        first_fail.alias("verdict"),
        F.lit(None).cast("long").alias("dup_of"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    survivors = batch.join(
        rules.filter(F.col("keep")).select(id_col), id_col, "left_semi"
    )
    judged = dedup_against_reference(
        survivors,
        ref_df,
        id_col,
        text_col,
        n=n,
        threshold=threshold,
        n_hashes=n_hashes,
        bands=bands,
        ref_index=ref_index,
        ref_fingerprints=ref_fingerprints,
        release_into=release_into,
    )
    out = failed.unionByName(
        judged.select(
            "doc_id",
            "verdict",
            F.col("dup_of").cast("long").alias("dup_of"),
            "jaccard",
        )
    )
    return out.withColumn("admit", F.col("verdict") == "clean")


def ingest_gate_stream(
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
):
    """Continuous composed admission gate over an arriving document
    stream: every micro-batch gets one verdict row per doc —
    'rule:<first failing Gopher rule>' (quality reject), 'exact_dup' /
    'near_dup' (seen before, with dup_of + jaccard), or 'clean'
    (admit=true) — appended to ``out_dir`` as parquet.

    Economics mirror :func:`streaming.dedup.neardup_gate_stream`: the
    reference corpus is shingled/signed/banded/fingerprinted ONCE
    before the query starts and stays persisted for its lifetime; each
    micro-batch pays its own projection + (survivors-only) shingling.
    Per-batch persisted frames (the rule table, the batch's shingle
    sets) are released inside the callback. Exactly-once offsets via
    the checkpoint (availableNow trigger); the usual foreachBatch
    replay caveat applies to the sink.

    Returns the (terminated) ``StreamingQuery`` so callers can read
    ``recentProgress`` — the per-micro-batch trigger durations the
    bench's ``stages.streaming_gate_e2e`` readout reports (r14).
    """
    from ghcn_d_etl_project_spark.operators.dedup import (
        reference_dedup_index,
        reference_fingerprints,
    )

    held: list[DataFrame] = []
    ref_index = reference_dedup_index(
        ref_df, id_col, text_col,
        n=n, n_hashes=n_hashes, bands=bands, release_into=held,
    )
    ref_fps = reference_fingerprints(
        ref_df, id_col, text_col, release_into=held
    )
    # MATERIALIZE the index frames before the stream starts (r14):
    # persist() alone is lazy, so the whole corpus-side shingle/sign/
    # band/fingerprint build landed INSIDE micro-batch 1's trigger —
    # measured at the bench SF as a ~21s first batch vs ~3s steady
    # state. Forcing it here makes per-batch cost batch work only from
    # the first trigger, which is what this docstring (and the
    # reference_gate_e2e readout) promise.
    for f in held:
        f.count()

    def judge(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch_held: list[DataFrame] = []
        _gate_batch(
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
    return q
