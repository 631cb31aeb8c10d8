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
    DoubleType,
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


# --- real codec: 16-bit mono PCM RIFF/WAVE (public spec: RIFF header,
# "fmt " chunk with audio_format=1, "data" chunk of little-endian
# int16 samples) — the audio sibling of the BMP codec above ----------

_WAV_FMT = struct.Struct("<4sI4s4sIHHIIHH4sI")

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
        StructField("peak_abs", LongType()),
    ]
)


def encode_wav(samples: list[int], sample_rate: int = 16000) -> bytes:
    """Serialize int16 samples as a mono 16-bit PCM WAV (real format —
    any audio tool opens the output)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    hdr = _WAV_FMT.pack(
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,  # PCM fmt chunk size
        1,  # audio_format = PCM
        1,  # channels
        sample_rate,
        sample_rate * 2,  # byte rate (16-bit mono)
        2,  # block align
        16,  # bits per sample
        b"data",
        len(data),
    )
    return hdr + data


def decode_wav(data: bytes) -> tuple[int, list[int]]:
    """Parse a mono 16-bit PCM WAV produced by :func:`encode_wav` (or any
    compliant writer with the canonical 44-byte header). Returns
    ``(sample_rate, samples)``; raises ValueError on a non-PCM or
    malformed payload — a real parser, not a stub."""
    if len(data) < _WAV_FMT.size:
        raise ValueError("not a WAV: truncated header")
    (
        riff,
        _size,
        wave_,
        fmt_,
        fmt_len,
        audio_fmt,
        channels,
        rate,
        _brate,
        _align,
        bits,
        data_,
        dlen,
    ) = _WAV_FMT.unpack_from(data)
    if riff != b"RIFF" or wave_ != b"WAVE" or fmt_ != b"fmt ":
        raise ValueError("not a WAV: bad magic")
    if (audio_fmt, channels, bits, fmt_len) != (1, 1, 16, 16):
        raise ValueError("unsupported WAV flavor (need 16-bit mono PCM)")
    if data_ != b"data":
        raise ValueError("unsupported WAV layout (expected canonical data chunk)")
    body = data[_WAV_FMT.size: _WAV_FMT.size + dlen]
    return rate, list(struct.unpack(f"<{len(body) // 2}h", body))


def synthesize_audio(
    df: DataFrame, id_col: str, sample_rate: int = 16000
) -> DataFrame:
    """Deterministic fake audio table: REAL WAV payloads whose PCM
    samples come from a pure-arithmetic formula of the id —
    ``n = id % 800 + 800`` samples of
    ``((id * 31 + i * 7919) % 65536) - 32768`` — so a SQL oracle can
    REPLAY the decoded signal with generate_series and verify the
    whole decode + feature path value-for-value (the audio analogue of
    the documents-derived image payload). Stands in for
    ``binaryFile`` on a real speech corpus."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 800 + 800
                i = np.arange(n, dtype=np.int64)
                vals = ((d * 31 + i * 7919) % 65536) - 32768
                ids.append(d)
                blobs.append(encode_wav([int(v) for v in vals], sample_rate))
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    out_schema = StructType(
        [StructField("doc_id", LongType()), StructField("content", BinaryType())]
    )
    return df.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        synth, out_schema
    )


def audio_features(df: DataFrame) -> DataFrame:
    """Decode each WAV payload (REAL parser) and compute the standard
    audio-corpus screening features: duration, RMS level, zero-crossing
    rate numerator, peak amplitude. Arrow-batched; sums in int64 so a
    30-minute 16 kHz clip cannot overflow. RMS is
    ``round(sqrt(sumsq/n), 6)`` with the division done in double —
    sqrt and divide are correctly-rounded IEEE, so the value matches a
    SQL restatement bit-for-bit; ``duration_ms`` is exact integer
    ``n * 1000 div rate``."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in AUDIO_FEATURES_SCHEMA}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                blob = bytes(content)
                rate, samples = decode_wav(blob)
                x = np.asarray(samples, dtype=np.int64)
                n = len(x)
                sumsq = int((x * x).sum())
                rows["doc_id"].append(int(doc_id))
                rows["n_bytes"].append(len(blob))
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(n * 1000 // rate)
                rows["rms"].append(
                    round(math.sqrt(sumsq / n), 6) if n else 0.0
                )
                rows["zero_crossings"].append(
                    int(((x[:-1] < 0) != (x[1:] < 0)).sum()) if n > 1 else 0
                )
                rows["peak_abs"].append(int(np.abs(x).max()) if n else 0)
            yield pd.DataFrame(rows)

    return df.mapInPandas(compute, AUDIO_FEATURES_SCHEMA)


def downsample_audio(df: DataFrame, factor: int = 2) -> DataFrame:
    """Decimate each WAV payload by ``factor`` (every k-th sample,
    re-encoded at rate/factor — the cheap anti-aliasing-free decimator
    a screening pipeline uses before feature extraction; a production
    resampler would low-pass first). Output schema mirrors the input:
    ``(doc_id, content)`` with real WAV bytes."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                rate, samples = decode_wav(bytes(content))
                ids.append(int(doc_id))
                blobs.append(
                    encode_wav(samples[::factor], max(rate // factor, 1))
                )
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    out_schema = StructType(
        [StructField("doc_id", LongType()), StructField("content", BinaryType())]
    )
    return df.select("doc_id", "content").mapInPandas(resample, out_schema)
