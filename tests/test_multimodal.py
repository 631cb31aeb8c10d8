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


# --- real BMP codec path (round 9: the codec stub became a real
# pure-stdlib 24-bit BI_RGB decoder/encoder) --------------------------

def _gradient(w, h):
    """Deterministic test raster: every pixel value derived from (x, y)."""
    return [
        [((x * 7) % 256, (y * 11) % 256, (x + y) % 256) for x in range(w)]
        for y in range(h)
    ]


def test_bmp_roundtrip_pixel_exact():
    """encode_bmp/decode_bmp are exact inverses, including the 4-byte row
    padding cases (width % 4 in {0,1,2,3} via widths 4..7)."""
    from ghcn_d_etl_project_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    for w in (4, 5, 6, 7):
        px = _gradient(w, 3)
        data = encode_bmp(px)
        assert data[:2] == b"BM"
        got_w, got_h, got = decode_bmp(data)
        assert (got_w, got_h) == (w, 3)
        assert got == px


def test_bmp_decode_rejects_unsupported_variants():
    import pytest

    from ghcn_d_etl_project_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"JFIFnotabmp" * 10)
    data = bytearray(encode_bmp(_gradient(4, 2)))
    data[28] = 8  # bpp 24 -> 8 (palettized: needs a palette decoder)
    with pytest.raises(ValueError, match="unsupported BMP"):
        decode_bmp(bytes(data))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(_gradient(4, 2))[:-5])


def test_image_features_decodes_real_bmp(spark):
    """A planted BMP payload must yield header-true dimensions and the
    PIXEL mean (not the raw-file-byte mean) — proof the raster is really
    decoded, since the file bytes include headers and padding."""
    from ghcn_d_etl_project_spark.operators.multimodal import encode_bmp

    px = _gradient(5, 4)  # width 5 -> padded rows, so raw-byte mean differs
    payload = encode_bmp(px)
    flat = [c for row in px for p in row for c in p]
    expected_mean = int(sum(flat) / len(flat))
    df = spark.createDataFrame(
        [(1, bytearray(payload), ("image/bmp", 999, 999, 1, 0))],
        "doc_id long, content binary, "
        "meta struct<format:string,width:int,height:int,n_frames:int,sample_rate:int>",
    )
    row = image_features(df).collect()[0]
    assert (row.width, row.height) == (5, 4)  # from the header, not meta
    assert row.mean_byte == expected_mean
    assert row.n_bytes == len(payload)


def test_resize_real_bmp_nearest_neighbor_pixel_exact(spark):
    """Resize of a BMP payload must equal the nearest-neighbor reference
    mapping out(x,y) = in(x*in_w//out_w, y*in_h//out_h), re-encoded as a
    valid BMP — checked pixel-by-pixel after a decode of the output."""
    from ghcn_d_etl_project_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    px = _gradient(8, 6)
    df = spark.createDataFrame(
        [(7, bytearray(encode_bmp(px)), ("image/bmp", 8, 6, 1, 0))],
        "doc_id long, content binary, "
        "meta struct<format:string,width:int,height:int,n_frames:int,sample_rate:int>",
    )
    out = resize_images(df, 4, 3).collect()[0]
    assert out.meta.format == "image/bmp"
    assert (out.meta.width, out.meta.height) == (4, 3)
    w, h, got = decode_bmp(bytes(out.content))
    assert (w, h) == (4, 3)
    expected = [[px[y * 6 // 3][x * 8 // 4] for x in range(4)] for y in range(3)]
    assert got == expected
    # upscale too (indices repeat rather than skip)
    up = resize_images(df, 16, 12).collect()[0]
    w2, h2, got2 = decode_bmp(bytes(up.content))
    assert (w2, h2) == (16, 12)
    assert got2 == [[px[y * 6 // 12][x * 8 // 16] for x in range(16)]
                    for y in range(12)]


def test_non_bmp_payloads_keep_fake_path(spark):
    """The registered rows-only queries run over synthesize_media's fake
    payloads — those must be byte-identical to the r8 behavior (truncate/
    pad resample, metadata dimensions)."""
    out = resize_images(_media(spark, 10), 32, 32).collect()
    for r in out:
        assert len(r.content) == 32 * 32
        assert r.meta.format == "fake/raw"


# ---------------------------------------------------------------------------
# Audio flavor (r11): WAV codec + features
# ---------------------------------------------------------------------------


def test_wav_roundtrip_exact():
    """encode -> decode is the identity on samples and rate, including
    both int16 extremes."""
    from ghcn_d_etl_project_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    rate, got = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000
    assert got == samples


def test_wav_rejects_garbage():
    import pytest as _pytest

    from ghcn_d_etl_project_spark.operators.multimodal import decode_wav

    for bad in (b"", b"RIFFxxxx", b"\x00" * 100):
        with _pytest.raises(ValueError):
            decode_wav(bad)


def test_audio_features_hand_case(spark):
    """A known 4-sample signal: RMS, zero crossings, peak, duration all
    computable by hand."""
    import math

    from ghcn_d_etl_project_spark.operators.multimodal import (
        audio_features,
        encode_wav,
    )

    wav = encode_wav([100, -100, 100, -100], 1000)
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "doc_id long, content binary"
    )
    r = audio_features(df).collect()[0]
    assert r.n_samples == 4
    assert r.sample_rate == 1000
    assert r.duration_ms == 4 * 1000 // 1000
    assert r.rms == round(math.sqrt((4 * 100 * 100) / 4), 6) == 100.0
    assert r.zero_crossings == 3
    assert r.peak_abs == 100
    assert r.n_bytes == 44 + 8


def test_audio_downsample_halves(spark):
    """Decimation by 2 keeps every other sample and halves the rate —
    verified at the DECODE level (byte equality is not the contract)."""
    from ghcn_d_etl_project_spark.operators.multimodal import (
        decode_wav,
        downsample_audio,
        encode_wav,
    )

    samples = list(range(-50, 50))
    wav = encode_wav(samples, 16000)
    df = spark.createDataFrame(
        [(7, bytearray(wav))], "doc_id long, content binary"
    )
    out = downsample_audio(df, factor=2).collect()[0]
    rate, got = decode_wav(bytes(out.content))
    assert rate == 8000
    assert got == samples[::2]
