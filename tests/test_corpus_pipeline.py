"""Corpus-prep pipeline: funnel monotonicity, gate semantics, PII
removal, dedup keep-min invariants, and chunk/source consistency."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.textops import PII_PATTERNS
from ghcn_d_etl_project_spark.pipelines.corpus import (
    CorpusPrepConfig,
    corpus_prep,
    exact_dedup_keep_min,
)
from ghcn_d_etl_project_spark.plans._util import t
from tests.conftest import SF_DIR


def test_funnel_and_gates(spark):
    cfg = CorpusPrepConfig()
    stages = corpus_prep(spark, SF_DIR, cfg)
    n_raw = t(spark, SF_DIR, "documents").count()
    n_filtered = stages["filtered"].count()
    n_exact = stages["exact_deduped"].count()
    n_surv = stages["survivors"].count()
    assert n_raw >= n_filtered >= n_exact >= n_surv > 0

    # gates hold on every surviving row
    bad = stages["filtered"].filter(
        ~F.col("pred_lang").isin(*cfg.langs)
        | (F.col("quality_score") < cfg.min_quality)
        | ~F.col("n_tokens").between(cfg.min_tokens, cfg.max_tokens)
    )
    assert bad.count() == 0


def test_pii_absent_from_survivors(spark):
    stages = corpus_prep(spark, SF_DIR)
    pats = [re.compile(p) for p, _ in PII_PATTERNS]
    for row in stages["survivors"].select("text").collect():
        for pat in pats:
            assert not pat.search(row.text), (pat.pattern, row.text[:80])


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [
            (3, "Hello,   WORLD!"),
            (1, "hello world"),
            (2, "totally different"),
            (7, "hello world."),
        ],
        "doc_id long, text string",
    )
    got = sorted(r.doc_id for r in exact_dedup_keep_min(df).collect())
    # 1,3,7 share a normalized fingerprint -> min id 1 survives
    assert got == [1, 2]


def test_chunks_come_from_survivors_only(spark):
    stages = corpus_prep(spark, SF_DIR)
    surv_ids = {r.doc_id for r in stages["survivors"].select("doc_id").collect()}
    chunk_ids = {r.doc_id for r in stages["chunks"].select("doc_id").collect()}
    assert chunk_ids == surv_ids  # every survivor chunks (n_tokens >= 8 gate)
    cfg = CorpusPrepConfig()
    assert stages["chunks"].filter(
        F.col("n_tokens") > cfg.chunk_tokens
    ).count() == 0


def test_components_cover_exact_dedup_output(spark):
    stages = corpus_prep(spark, SF_DIR)
    n_exact = stages["exact_deduped"].count()
    assert stages["components"].count() == n_exact
    # survivors are exactly the component representatives
    reps = stages["components"].filter(F.col("node") == F.col("component"))
    assert stages["survivors"].count() == reps.count()


def test_release_unpersists_cached_stages(spark):
    """corpus_prep persists two named intermediates plus three handles
    surfaced via extra_handles (the profiled base under the gate filter
    — see profiled_persisted — and MinHash-LSH's shingle sets +
    signatures); release() must drop all five so repeated invocations
    don't accumulate cached blocks."""
    stages = corpus_prep(spark, SF_DIR)
    stages["survivors"].count()  # materialize through the whole ladder
    cached = [stages[k] for k in ("exact_deduped", "survivors")]
    cached += stages.extra_handles
    assert len(stages.extra_handles) == 3  # profiled base + shingles + sigs
    assert all(df.storageLevel.useMemory or df.storageLevel.useDisk for df in cached)
    stages.release()
    for df in cached:
        lvl = df.storageLevel
        assert not (lvl.useMemory or lvl.useDisk), lvl


def test_corpus_prep_staged_matches_unstaged(spark):
    """The instrumented twin must attribute without changing semantics:
    identical per-stage row counts, one timing per stage, and no cached
    blocks left behind (it owns and releases everything it persists)."""
    from ghcn_d_etl_project_spark.pipelines.corpus import corpus_prep_staged

    persistent_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    staged = corpus_prep_staged(spark, SF_DIR)
    persistent_after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert persistent_after == persistent_before, "staged run leaked cache"

    expected_stages = [
        "profile_filter_pii", "exact_dedup", "lsh_pairs", "components",
        "chunking",
    ]
    assert list(staged["counts"]) == expected_stages
    assert list(staged["timings"]) == expected_stages
    assert all(sec >= 0 for sec in staged["timings"].values())

    stages = corpus_prep(spark, SF_DIR)
    assert staged["counts"]["profile_filter_pii"] == stages["filtered"].count()
    assert staged["counts"]["exact_dedup"] == stages["exact_deduped"].count()
    assert staged["counts"]["components"] == stages["survivors"].count()
    assert staged["counts"]["chunking"] == stages["chunks"].count()
    stages.release()


def test_write_corpus_training_layout(spark, tmp_path):
    """write_corpus materializes chunks hive-partitioned by
    (split, lang): directories prune whole splits/languages from the
    path alone, and the round-trip preserves every chunk."""
    from ghcn_d_etl_project_spark.pipelines.corpus import write_corpus

    stages = corpus_prep(spark, SF_DIR)
    out = tmp_path / "corpus"
    write_corpus(stages, str(out))
    n_chunks = stages["chunks"].count()
    stages.release()

    splits = {p.name for p in out.iterdir() if p.name.startswith("split=")}
    assert splits <= {"split=train", "split=val", "split=test"} and splits
    langs = {
        q.name for p in out.iterdir() if p.is_dir() for q in p.iterdir()
    }
    assert any(name.startswith("lang=") for name in langs), langs
    back = spark.read.parquet(str(out))
    assert back.count() == n_chunks
    assert {"split", "lang", "chunk_text", "n_tokens"} <= set(back.columns)
