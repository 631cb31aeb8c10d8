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


@register("media_metadata", oracle=_MEDIA_META_ORACLE, tags=("multimodal",))
def media_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata via the mapInPandas feature extractor —
    the Arrow-batched Pandas-UDF path, proven byte-identical to SQL
    (octet length, sha256 content hash, typed dimensions)."""
    return image_features(_media(spark, sf_dir)).drop("mean_byte")


@register("image_features", oracle=None, tags=("multimodal",))
def image_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full image-feature extraction including the decode-dependent
    mean-byte statistic (STUB codec — deterministic fake; plumbing is
    production-shaped). Rows-only checked."""
    return image_features(_media(spark, sf_dir))


@register("frame_sample", oracle=None, tags=("multimodal",))
def frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: one-to-many mapInPandas explosion of each
    payload into every-2nd frame chunk with per-frame byte counts.
    Rows-only checked (binary output)."""
    return sample_frames(_media(spark, sf_dir), every=2).drop("frame_bytes")


@register("media_resize", oracle=None, tags=("multimodal",))
def media_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: payload re-sampled (fake codec) to 32x32 with
    metadata rewritten; output projected to scalar columns for the
    rows-only check."""
    out = resize_images(_media(spark, sf_dir), 32, 32)
    from pyspark.sql import functions as F

    return out.select(
        "doc_id",
        F.length("content").cast("long").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
