"""Multimodal plumbing tests: schema/batch/one-to-many shapes of the
mapInPandas operators, with the deterministic fake codec."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.multimodal import (
    image_features,
    resize_images,
    sample_frames,
    synthesize_media,
)
from ghcn_d_etl_project_spark.plans._util import t
from tests.conftest import SF_DIR


def _media(spark, limit=None):
    docs = t(spark, SF_DIR, "documents")
    if limit:
        docs = docs.limit(limit)
    return synthesize_media(docs, "doc_id", "text")


def test_image_features_match_driver_side(spark):
    docs = {r.doc_id: r.text for r in t(spark, SF_DIR, "documents").limit(30).collect()}
    feats = image_features(_media(spark, 30)).collect()
    assert len(feats) == len(docs)
    for r in feats:
        payload = docs[r.doc_id].encode("utf-8")
        assert r.n_bytes == len(payload)
        assert r.sha256 == hashlib.sha256(payload).hexdigest()
        assert r.width == r.doc_id % 64 + 16
        assert r.height == r.doc_id % 48 + 16
        assert r.mean_byte == int(sum(payload) / len(payload))


def test_image_features_small_arrow_batches(spark):
    """Correctness must not depend on Arrow batch size (plumbing streams
    record batches, state-free)."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        a = {(r.doc_id, r.sha256) for r in image_features(_media(spark, 50)).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    b = {(r.doc_id, r.sha256) for r in image_features(_media(spark, 50)).collect()}
    assert a == b and len(a) == 50


def test_resize_rewrites_payload_and_meta(spark):
    out = resize_images(_media(spark, 20), 32, 32).collect()
    assert len(out) == 20
    for r in out:
        assert len(r.content) == 32 * 32
        assert r.meta.width == 32 and r.meta.height == 32
        assert r.meta.format == "fake/raw"


def test_sample_frames_one_to_many(spark):
    media = {r.doc_id: r for r in _media(spark, 40).collect()}
    frames = sample_frames(_media(spark, 40), every=2).collect()
    by_doc: dict[int, list] = {}
    for fr in frames:
        by_doc.setdefault(fr.doc_id, []).append(fr)
    assert set(by_doc) == set(media)
    for doc_id, frs in by_doc.items():
        n_frames = max(media[doc_id].meta.n_frames, 1)
        assert len(frs) == math.ceil(n_frames / 2)
        assert sorted(f.frame_idx for f in frs) == list(range(0, n_frames, 2))
        content = bytes(media[doc_id].content)
        chunk = max(len(content) // n_frames, 1)
        for fr in frs:
            want = content[fr.frame_idx * chunk: (fr.frame_idx + 1) * chunk]
            assert bytes(fr.frame_bytes) == want


def test_media_payloads_stay_out_of_shuffle_keys(spark):
    """Binary content must be droppable before wide ops — group frames by
    doc without carrying payloads and the plan aggregates scalars only."""
    frames = sample_frames(_media(spark, 40), every=2)
    agg = frames.groupBy("doc_id").agg(F.sum("n_bytes").alias("total_bytes"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # the aggregate and its input projection must not carry the payload
    for line in plan.splitlines():
        if "HashAggregate" in line or line.strip().startswith("+- Project"):
            assert "frame_bytes" not in line, line
    assert agg.count() == 40
