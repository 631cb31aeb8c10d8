"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` columns plus a typed metadata struct; all
per-byte work happens in Arrow-batched Pandas UDFs via ``mapInPandas``
(the one legitimate UDF surface — SURVEY.md §2.11 note). The codec step
is REAL for one public uncompressed format — 24-bit BI_RGB Windows BMP,
decoded/encoded with nothing but ``struct`` (the format is a 14-byte
file header + 40-byte BITMAPINFOHEADER + bottom-up rows padded to 4
bytes; public spec, no library needed). Payloads that are not BMP fall
back to a clearly-marked deterministic fake (the container has no
PIL/libav for compressed codecs), so the Spark-side plumbing — schemas,
batch iteration, one-to-many frame explosion, partitioning — runs
identically over real and synthetic media.

Scale notes: mapInPandas streams Arrow record batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` rows each) through the
Python worker — memory is bounded per batch, not per partition, which is
what lets 100 TB of media flow through fixed-size executors. Binary
payloads ride the shuffle like any column; keep them OUT of shuffle keys
and project them away before wide operations.
"""

from __future__ import annotations

import hashlib
import struct
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
    """STUB DECODER — deterministic fake standing in for PIL/libav on
    COMPRESSED formats (JPEG/PNG/video). BMP payloads never reach this:
    they take the real :func:`decode_bmp` path. Everything else in the
    operator (batching, schema, explosion) is production-shaped either
    way.
    """
    return {
        "width": width,
        "height": height,
        "mean_byte": int(sum(content) / len(content)) if content else 0,
    }


# --- real codec: 24-bit uncompressed BI_RGB Windows BMP (public spec;
# 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER + bottom-up
# BGR rows, each padded to a 4-byte boundary) -------------------------

_BMP_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res, res, px offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode rows of (R, G, B) tuples (row 0 = TOP) as a 24-bit BMP.
    Pure stdlib; inverse of :func:`decode_bmp` (pinned pixel-exact in
    tests). Rows are written bottom-up in BGR order with 4-byte padding,
    exactly as the format requires."""
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    row_size = (width * 3 + 3) & ~3
    img_size = row_size * height
    offset = _BMP_HEADER.size + _BMP_INFO.size
    out = bytearray()
    out += _BMP_HEADER.pack(b"BM", offset + img_size, 0, 0, offset)
    out += _BMP_INFO.pack(40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    pad = b"\0" * (row_size - width * 3)
    for row in reversed(pixels):  # bottom-up storage
        for r, g, b in row:
            out += bytes((b, g, r))  # BGR on disk
        out += pad
    return bytes(out)


def decode_bmp(data: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode a 24-bit uncompressed BMP to (width, height, rows of
    (R, G, B), row 0 = TOP). Raises ``ValueError`` on anything that is
    not plain 24-bit BI_RGB — compressed formats need a real codec
    library, which this container does not ship."""
    if len(data) < _BMP_HEADER.size + _BMP_INFO.size or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = _BMP_HEADER.unpack_from(data, 0)
    (hsize, width, height, _planes, bpp, compression,
     *_rest) = _BMP_INFO.unpack_from(data, _BMP_HEADER.size)
    if hsize < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (header={hsize}, bpp={bpp}, "
            f"compression={compression}); only uncompressed 24-bit BI_RGB "
            "is decodable without a codec library"
        )
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    if len(data) < offset + row_size * height:
        raise ValueError("truncated BMP payload")
    rows = []
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        base = offset + src_y * row_size
        row = [
            (data[base + 3 * x + 2], data[base + 3 * x + 1], data[base + 3 * x])
            for x in range(width)
        ]
        rows.append(row)
    return width, height, rows


def is_bmp(content: bytes) -> bool:
    return len(content) >= 2 and content[:2] == b"BM"


def _decode_any(content: bytes, meta_width: int, meta_height: int) -> dict:
    """Dispatch: real BMP decode when the payload IS a BMP (dimensions
    and mean come from actual pixels, metadata is ignored as untrusted),
    deterministic fake otherwise."""
    if is_bmp(content):
        w, h, rows = decode_bmp(content)
        n = w * h * 3
        total = sum(c for row in rows for px in row for c in px)
        return {"width": w, "height": h,
                "mean_byte": int(total / n) if n else 0}
    return _fake_decode(content, meta_width, meta_height)


def resize_nearest(
    rows: list[list[tuple[int, int, int]]], out_w: int, out_h: int
) -> list[list[tuple[int, int, int]]]:
    """Nearest-neighbor resample: output pixel (x, y) samples input pixel
    (floor(x*in_w/out_w), floor(y*in_h/out_h)) — the standard box-free
    mapping, deterministic and library-free."""
    in_h = len(rows)
    in_w = len(rows[0]) if in_h else 0
    return [
        [rows[y * in_h // out_h][x * in_w // out_w] for x in range(out_w)]
        for y in range(out_h)
    ]


def image_features(df: DataFrame) -> DataFrame:
    """Per-image features via mapInPandas: payload size, content hash,
    decoded dimensions, mean byte value. One output row per input row;
    Arrow batches stream through the Python worker. BMP payloads are
    REALLY decoded (:func:`decode_bmp` — dimensions and pixel mean come
    from the actual raster, not metadata); other formats use the
    deterministic fake."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["meta"]
            decoded = [
                _decode_any(c, m["width"], m["height"])
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
    """Resize: BMP payloads get a REAL nearest-neighbor resample
    (:func:`resize_nearest`, decode → sample → re-encode, pinned
    pixel-exact in tests); non-BMP payloads keep the fake 'resample'
    (truncate/pad to out_w*out_h bytes — deterministic, size-correct,
    codec-free)."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("content", BinaryType()),
            StructField("meta", MEDIA_META_SCHEMA),
        ]
    )

    def _resize_one(c: bytes) -> bytes:
        if is_bmp(c):
            _, _, rows = decode_bmp(c)
            return encode_bmp(resize_nearest(rows, out_width, out_height))
        target = out_width * out_height
        return bytes(c[:target]).ljust(target, b"\0")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content = [_resize_one(c) for c in pdf["content"]]
            out_meta = [
                {
                    "format": "image/bmp" if is_bmp(c) else m["format"],
                    "width": out_width,
                    "height": out_height,
                    "n_frames": m["n_frames"],
                    "sample_rate": m["sample_rate"],
                }
                for c, m in zip(pdf["content"], pdf["meta"])
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
