"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` columns plus a typed metadata struct; all
per-byte work happens in Arrow-batched Pandas UDFs via ``mapInPandas``
(the one legitimate UDF surface — SURVEY.md §2.11 note). The actual
codec step is STUBBED: the container has no image/audio libraries, so
``decode`` is a clearly-marked deterministic fake (or raises
``NotImplementedError`` in strict mode) while the Spark-side plumbing —
schemas, batch iteration, one-to-many frame explosion, partitioning —
is real and tested.

Scale notes: mapInPandas streams Arrow record batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` rows each) through the
Python worker — memory is bounded per batch, not per partition, which is
what lets 100 TB of media flow through fixed-size executors. Binary
payloads ride the shuffle like any column; keep them OUT of shuffle keys
and project them away before wide operations.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata contract for a media column (image flavor; audio/video
# reuse the shape with their own fields).
MEDIA_META_SCHEMA = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_byte", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from the documents corpus: content =
    UTF-8 bytes of the text (an opaque payload as far as the pipeline is
    concerned) + a typed metadata struct derived from the id. Stands in
    for `spark.read.format("binaryFile")` on a real corpus."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("content"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.pmod(F.col(id_col), F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(F.col(id_col), F.lit(48)) + 16).cast("int").alias("height"),
            (F.pmod(F.col(id_col), F.lit(8)) + 1).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes, width: int, height: int) -> dict:
    """STUB DECODER — deterministic fake standing in for PIL/libav.

    A real deployment swaps this for the actual codec; everything else in
    the operator (batching, schema, explosion) is production-shaped.
    """
    return {
        "width": width,
        "height": height,
        "mean_byte": int(sum(content) / len(content)) if content else 0,
    }


def decode_strict(*_args, **_kwargs):  # pragma: no cover - marker only
    """Real decode entry point: not available in this container."""
    raise NotImplementedError(
        "media codecs (PIL/av) are not installed; use the deterministic "
        "fake decoder (_fake_decode) for plumbing tests"
    )


def image_features(df: DataFrame) -> DataFrame:
    """Per-image features via mapInPandas: payload size, content hash,
    decoded dimensions, mean byte value. One output row per input row;
    Arrow batches stream through the Python worker."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["meta"]
            decoded = [
                _fake_decode(c, m["width"], m["height"])
                for c, m in zip(pdf["content"], metas)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "sha256": [hashlib.sha256(c).hexdigest() for c in pdf["content"]],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "mean_byte": [d["mean_byte"] for d in decoded],
                }
            )

    return df.mapInPandas(compute, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, out_width: int, out_height: int) -> DataFrame:
    """Resize plumbing: recompute metadata and (fake-)transform payload.
    The fake 'resample' truncates/pads the payload to out_w*out_h bytes —
    deterministic, size-correct, codec-free."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("content", BinaryType()),
            StructField("meta", MEDIA_META_SCHEMA),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = out_width * out_height
        for pdf in batches:
            out_content = [
                bytes(c[:target]).ljust(target, b"\0") for c in pdf["content"]
            ]
            out_meta = [
                {
                    "format": m["format"],
                    "width": out_width,
                    "height": out_height,
                    "n_frames": m["n_frames"],
                    "sample_rate": m["sample_rate"],
                }
                for m in pdf["meta"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "content": out_content, "meta": out_meta}
            )

    return df.mapInPandas(resize, out_schema)


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling: explode each 'video' payload into every-``every``-th
    frame chunk — the one-to-many mapInPandas shape (output rows ≠ input
    rows). Frame k = bytes [k*chunk, (k+1)*chunk) of the payload, chunk
    size = payload/n_frames."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs, sizes = [], [], [], []
            for doc_id, content, meta in zip(
                pdf["doc_id"], pdf["content"], pdf["meta"]
            ):
                n_frames = max(int(meta["n_frames"]), 1)
                chunk = max(len(content) // n_frames, 1)
                for k in range(0, n_frames, every):
                    blob = bytes(content[k * chunk: (k + 1) * chunk])
                    ids.append(doc_id)
                    idxs.append(k)
                    blobs.append(blob)
                    sizes.append(len(blob))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_bytes": blobs,
                    "n_bytes": sizes,
                }
            )

    return df.mapInPandas(frames, FRAME_SCHEMA)
