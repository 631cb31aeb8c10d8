"""Multimodal-column queries: binary payload + typed-metadata plumbing.

The media table is synthesized deterministically from documents (payload
= UTF-8 bytes, metadata derived from the id), so the mapInPandas feature
extractor is ORACLE-CHECKABLE for the byte-count/hash/dimension columns
(DuckDB restates them as octet_length/sha256/modular arithmetic) — a
Pandas-UDF path proven equivalent to SQL. The decode-dependent column
(mean_byte) and the one-to-many frame sampler are rows-only (the fake
codec is engine-specific by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ghcn_d_etl_project_spark.operators.multimodal import (
    image_features,
    resize_images,
    sample_frames,
    synthesize_media,
)
from ghcn_d_etl_project_spark.plans._util import t
from ghcn_d_etl_project_spark.plans.registry import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synthesize_media(t(spark, sf_dir, "documents"), "doc_id", "text")


_MEDIA_META_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256,
       CAST(doc_id % 64 + 16 AS INTEGER) AS width,
       CAST(doc_id % 48 + 16 AS INTEGER) AS height
FROM documents
"""


@register("media_metadata", oracle=_MEDIA_META_ORACLE, tags=("multimodal",),
          late=True)  # r12 rotation: 7-round green, demoted to sim coverage
def media_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata via the mapInPandas feature extractor —
    the Arrow-batched Pandas-UDF path, proven byte-identical to SQL
    (octet length, sha256 content hash, typed dimensions)."""
    return image_features(_media(spark, sf_dir)).drop("mean_byte")


# r12: the "decode-dependent" mean-byte is SQL-expressible after all —
# the synthesized payload is the text's UTF-8 bytes and the corpus is
# ASCII (verified: octet_length(encode(text)) == length(text) for every
# doc at sf0.01/0.1), so the byte sum restates as a per-character ord()
# aggregate; int(sum/len) == sum // len for positive values (the double
# quotient can't cross an integer boundary: the true value is >= 1/len
# from any integer, far above one ulp).
_IMAGE_FEATURES_ORACLE = """
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents),
chars AS (
  SELECT doc_id,
         SUM(ord(substr(text, CAST(i AS INTEGER), 1))) AS bsum
  FROM d, UNNEST(generate_series(1, CAST(length(text) AS BIGINT))) AS g(i)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
       sha256(d.text) AS sha256,
       CAST(d.doc_id % 64 + 16 AS INTEGER) AS width,
       CAST(d.doc_id % 48 + 16 AS INTEGER) AS height,
       CAST(COALESCE(c.bsum // NULLIF(length(d.text), 0), 0) AS BIGINT)
         AS mean_byte
FROM d LEFT JOIN chars c USING (doc_id)
"""


@register("image_features", oracle=_IMAGE_FEATURES_ORACLE,
          tags=("multimodal",))  # promoted to the hard window, r13 rotation
def image_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full image-feature extraction including the decode-dependent
    mean-byte statistic (STUB codec for non-BMP — deterministic fake;
    plumbing is production-shaped; BMP payloads get the real raster
    decode). FULL value-hash oracle since r12: the fake decode's byte
    mean replays as a per-character ord() aggregate over the ASCII
    corpus."""
    return image_features(_media(spark, sf_dir))


# Frame-sampler oracle (r12, VERDICT directive #5): the sampler's
# per-frame byte counts are pure arithmetic of (payload length,
# n_frames) — frame k covers bytes [k*chunk, (k+1)*chunk) of the
# payload Python-slice-clipped to len — so DuckDB replays the whole
# one-to-many explosion with generate_series. Only the opaque
# frame_bytes blob itself stays engine-side (its length IS verified).
_FRAME_SAMPLE_ORACLE = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS len,
         doc_id % 8 + 1 AS n_frames
  FROM documents
),
c AS (SELECT *, greatest(len // n_frames, 1) AS chunk FROM d)
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_idx,
       CAST(greatest(least(len, (i + 1) * chunk)
                     - least(len, i * chunk), 0) AS BIGINT) AS n_bytes
FROM c, UNNEST(generate_series(0, CAST(n_frames - 1 AS BIGINT), 2)) g(i)
"""


@register("frame_sample", oracle=_FRAME_SAMPLE_ORACLE, tags=("multimodal",),
          )  # promoted to the hard window in the r13 rotation
def frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: one-to-many mapInPandas explosion of each
    payload into every-2nd frame chunk with per-frame byte counts.
    FULL value-hash oracle since r12 (the chunk geometry replays in
    SQL); the binary frame itself is checked by length here and
    byte-exactly in pytest."""
    return sample_frames(_media(spark, sf_dir), every=2).drop("frame_bytes")


# r12: the scalar projection of the resize IS oracle-able — the
# synthesized payloads are non-BMP, so the fake resample truncates/pads
# every payload to exactly out_w*out_h bytes and rewrites the metadata
# dims; the oracle pins that arithmetic (and would catch a payload
# mis-routed into the real BMP codec). The rewritten bytes themselves
# stay engine-side, pixel-pinned for the REAL codec in pytest.
_MEDIA_RESIZE_ORACLE = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(1024 AS BIGINT) AS n_bytes,
       CAST(32 AS INTEGER) AS width,
       CAST(32 AS INTEGER) AS height
FROM documents
"""


@register("media_resize", oracle=_MEDIA_RESIZE_ORACLE, tags=("multimodal",),
          )  # promoted to the hard window in the r13 rotation
def media_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: payload re-sampled to 32x32 with metadata
    rewritten (real nearest-neighbor for BMP, deterministic
    truncate/pad fake for other formats); output projected to scalar
    columns. FULL value-hash oracle since r12 (the fake-path size and
    dimension arithmetic replays as constants; byte content is
    pixel-pinned in pytest for the real codec)."""
    out = resize_images(_media(spark, sf_dir), 32, 32)
    from pyspark.sql import functions as F

    return out.select(
        "doc_id",
        F.length("content").cast("long").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


# ---------------------------------------------------------------------------
# Audio flavor (r11): real WAV/PCM codec, SQL-replayable synth signal
# ---------------------------------------------------------------------------

# The synth PCM is pure arithmetic of the id (n = id%800+800 samples of
# ((id*31 + i*7919) % 65536) - 32768), so DuckDB replays the DECODED
# signal with generate_series and verifies the whole WAV-parse +
# feature path value-for-value — a full hash oracle over an audio
# decode, the audio analogue of media_metadata's byte/hash columns.
_AUDIO_FEATURES_ORACLE = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, doc_id % 800 + 800 AS n
  FROM documents WHERE doc_id IS NOT NULL
),
s AS (
  SELECT doc_id, n, i,
         ((doc_id * 31 + i * 7919) % 65536) - 32768 AS v
  FROM d, UNNEST(generate_series(0, CAST(n - 1 AS BIGINT))) AS g(i)
),
lagged AS (
  SELECT *, LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM s
),
agg AS (
  SELECT doc_id, MAX(n) AS n, SUM(v * v) AS sumsq, MAX(ABS(v)) AS peak,
         SUM(CASE WHEN prev IS NOT NULL AND (prev < 0) <> (v < 0)
                  THEN 1 ELSE 0 END) AS zc
  FROM lagged GROUP BY doc_id
)
SELECT doc_id,
       CAST(44 + 2 * n AS BIGINT) AS n_bytes,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000 // 16000 AS BIGINT) AS duration_ms,
       round(sqrt(CAST(sumsq AS DOUBLE) / n), 6) AS rms,
       CAST(zc AS BIGINT) AS zero_crossings,
       CAST(peak AS BIGINT) AS peak_abs
FROM agg
"""


@register(
    "audio_features_docs",
    oracle=_AUDIO_FEATURES_ORACLE,
    tags=("multimodal", "audio"),
    late=True,  # new in r11
)
def audio_features_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio screening features over REAL WAV payloads
    (``operators/multimodal.py``: 16-bit mono PCM RIFF codec — a real
    parser, not a stub): duration, RMS level, zero crossings, peak.
    The synth signal is arithmetic of the id, so the oracle REPLAYS
    the decoded samples in SQL — proving codec and feature math
    end-to-end, the strongest check any multimodal column in this
    engine carries. Arrow-batched mapInPandas (the documented
    JVM-can't-express exception), int64 sums so a 30-minute clip
    cannot overflow."""
    from ghcn_d_etl_project_spark.operators.multimodal import (
        audio_features,
        synthesize_audio,
    )

    audio = synthesize_audio(t(spark, sf_dir, "documents"), "doc_id")
    return audio_features(audio)


# r12: the decimated WAV bytes are engine-specific, but their DECODED
# content is pure arithmetic — so the registered query runs the full
# decimation pipeline (synth WAV -> decode -> every-2nd-sample ->
# re-encode WAV -> decode again -> features) and the oracle replays the
# decimated signal with a step-2 generate_series: every output value
# (byte count, halved rate, sample count, rms, zero crossings, peak)
# verifies the codec + decimator end-to-end at value level.
_AUDIO_DOWNSAMPLE_ORACLE = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, doc_id % 800 + 800 AS n
  FROM documents WHERE doc_id IS NOT NULL
),
m AS (SELECT doc_id, n, (n + 1) // 2 AS m FROM d),
s AS (
  SELECT doc_id, m.m, i,
         ((doc_id * 31 + (2 * i) * 7919) % 65536) - 32768 AS v
  FROM m, UNNEST(generate_series(0, CAST(m.m - 1 AS BIGINT))) AS g(i)
),
lagged AS (
  SELECT *, LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM s
),
agg AS (
  SELECT doc_id, MAX(m) AS m, SUM(v * v) AS sumsq, MAX(ABS(v)) AS peak,
         SUM(CASE WHEN prev IS NOT NULL AND (prev < 0) <> (v < 0)
                  THEN 1 ELSE 0 END) AS zc
  FROM lagged GROUP BY doc_id
)
SELECT doc_id,
       CAST(44 + 2 * m AS BIGINT) AS n_bytes,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(m AS BIGINT) AS n_samples,
       CAST(m * 1000 // 8000 AS BIGINT) AS duration_ms,
       round(sqrt(CAST(sumsq AS DOUBLE) / m), 6) AS rms,
       CAST(zc AS BIGINT) AS zero_crossings,
       CAST(peak AS BIGINT) AS peak_abs
FROM agg
"""


@register(
    "audio_downsample",
    oracle=_AUDIO_DOWNSAMPLE_ORACLE,
    tags=("multimodal", "audio"),
    # promoted to the 50-slot hard window in the r13 rotation
)
def audio_downsample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x decimation of each WAV payload (every other sample, rate
    halved, re-encoded as real WAV) — the screening-pipeline
    pre-feature step; one-to-one mapInPandas over binary columns.
    Since r12 the registered form pipes the decimated WAV back through
    the feature extractor, so the FULL encode -> decode -> decimate ->
    re-encode -> decode chain carries a value-hash oracle (the
    decimated synth signal replays in SQL with a step-2 series); the
    raw decimated bytes stay byte-pinned in the round-trip pytest."""
    from ghcn_d_etl_project_spark.operators.multimodal import (
        audio_features,
        downsample_audio,
        synthesize_audio,
    )

    audio = synthesize_audio(t(spark, sf_dir, "documents"), "doc_id")
    return audio_features(downsample_audio(audio, factor=2))
