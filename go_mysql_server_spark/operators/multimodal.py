"""Multimodal column operators: image/audio/video as opaque binary columns.

The Spark-side plumbing is real and scale-correct: binary payloads travel as
BinaryType columns, metadata as typed columns, and decode/feature-extract
runs as Arrow-batched ``mapInPandas`` (one Python worker per partition, zero
driver involvement — the 100 TB path).

Decoding (r7): UNCOMPRESSED formats decode for real — pure-Python parsers
for 24bpp BMP (_parse_bmp: header fields, bottom-up padded BGR pixel array)
and binary PPM/P6 (_parse_ppm) walk actual image bytes and produce real
width/height/per-channel statistics (oracle entry multimodal_decode_bmp).
Compressed formats (jpeg/png/webp) remain a deterministic md5-derived fake
— this container has no codec libraries; swapping in PIL/ffmpeg changes
only the ``_decode_one`` dispatch, never schema/batching/partitioning.

Reference parity note: go-mysql-server stores BLOBs (sql/types/strings.go
binary tiers) but has no media operators; this module is part of the
additive LLM-pipeline surface.
"""

from __future__ import annotations

import hashlib
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

FAKE_FORMATS = ("jpeg", "png", "webp")

DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("luma_hash", LongType()),
])

PATCH_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("patch_id", IntegerType()),
    StructField("patch_bytes", BinaryType()),
])


def documents_as_images(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Synthesize an image-bearing table: (doc_id, image binary).

    Stands in for `spark.read.format("binaryFile")` / a parquet column of
    encoded bytes.
    """
    return docs.select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("image")
    )


def _decode_one(payload: bytes) -> tuple[int, str, int, int, int]:
    """Decode one payload's metadata. Uncompressed formats (BMP, PPM)
    decode FOR REAL via the pure-Python parsers below; anything else
    falls back to the deterministic md5 fake (this container has no
    compressed-image codecs — swapping in PIL/ffmpeg changes only this
    dispatch)."""
    real = _parse_bmp(payload) or _parse_ppm(payload)
    if real is not None:
        fmt, w, h, means = real
        luma = int(0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2])
        return len(payload), fmt, w, h, luma
    h = hashlib.md5(payload).hexdigest()
    width = 64 + int(h[:4], 16) % 1024
    height = 64 + int(h[4:8], 16) % 1024
    fmt = FAKE_FORMATS[int(h[8:10], 16) % len(FAKE_FORMATS)]
    luma = int(h[10:25], 16)  # 60-bit, matches md5_int60-style derivation
    return len(payload), fmt, width, height, luma


# ---- real uncompressed-format codecs (pure Python) --------------------------

def _parse_bmp(payload: bytes):
    """24bpp BITMAPINFOHEADER BMP → ('bmp', w, h, (mean_r, mean_g,
    mean_b)). Walks the actual pixel array (bottom-up rows, 4-byte row
    padding, BGR order). Returns None for anything that isn't a BMP this
    parser handles."""
    import struct
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24 or w <= 0 or h == 0:
        return None
    rows = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if off + rows * stride > len(payload):
        return None
    rs = gs = bs = 0
    for y in range(rows):
        base = off + y * stride
        row = payload[base:base + w * 3]
        bs += sum(row[0::3])
        gs += sum(row[1::3])
        rs += sum(row[2::3])
    n = w * rows
    return "bmp", w, rows, (rs / n, gs / n, bs / n)


def _parse_ppm(payload: bytes):
    """Binary PPM (P6, maxval <= 255) → ('ppm', w, h, channel means)."""
    if payload[:2] != b"P6":
        return None
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> pixels;
    # '#' comments may appear inside the header whitespace
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(payload):
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(payload[start:pos])
    try:
        w, h, maxval = (int(f) for f in fields)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or maxval > 255:
        return None
    pos += 1  # the single whitespace after maxval
    pix = payload[pos:pos + w * h * 3]
    if len(pix) < w * h * 3:
        return None
    n = w * h
    return ("ppm", w, h,
            (sum(pix[0::3]) / n, sum(pix[1::3]) / n, sum(pix[2::3]) / n))


def make_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """A real 24bpp BMP: file header + BITMAPINFOHEADER + padded
    bottom-up BGR pixel array, solid `rgb` fill (fixture builder for the
    decode oracle — the bytes are a valid image any viewer opens)."""
    import struct
    stride = (width * 3 + 3) // 4 * 4
    pixels = bytearray()
    row = bytes((rgb[2], rgb[1], rgb[0])) * width + b"\x00" * (
        stride - width * 3)
    for _ in range(height):
        pixels += row
    size = 54 + len(pixels)
    header = (b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            len(pixels), 2835, 2835, 0, 0))
    return bytes(header + pixels)


BMP_DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
])


def synthesize_bmp(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id) → (doc_id, image) where image is a REAL BMP whose
    dimensions and solid fill derive from doc_id (deterministic, so the
    oracle can state expected stats in closed form)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [
                make_bmp(4 + int(d) % 5, 3 + int(d) % 4,
                         (int(d) % 256, int(d) * 3 % 256, int(d) * 5 % 256))
                for d in pdf[id_col]
            ]
            yield pd.DataFrame({"doc_id": pdf[id_col].values,
                                "image": blobs})

    return docs.select(id_col).mapInPandas(
        build,
        StructType([StructField("doc_id", LongType()),
                    StructField("image", BinaryType())]))


def decode_images_rgb(images: DataFrame, id_col: str = "doc_id",
                      bin_col: str = "image") -> DataFrame:
    """binary → real decoded stats (width/height/per-channel means) via
    Arrow-batched mapInPandas, using the pure-Python BMP/PPM parsers."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                parsed = _parse_bmp(bytes(payload)) or _parse_ppm(
                    bytes(payload))
                if parsed is None:
                    rows.append((doc_id, None, None, None,
                                 None, None, None))
                    continue
                fmt, w, h, (mr, mg, mb) = parsed
                rows.append((doc_id, fmt, w, h, mr, mg, mb))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "format", "width", "height",
                "mean_r", "mean_g", "mean_b"])

    return images.mapInPandas(decode_batches, BMP_DECODED_SCHEMA)


def decode_images(images: DataFrame, id_col: str = "doc_id",
                  bin_col: str = "image") -> DataFrame:
    """binary → typed metadata via Arrow-batched mapInPandas.

    Each batch arrives as a pandas DataFrame (Arrow transfer, not pickled
    rows); output schema is fixed so Catalyst can prune/push above it.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_one(b) for b in pdf[bin_col]]
            out = pd.DataFrame(
                meta, columns=["n_bytes", "format", "width", "height", "luma_hash"]
            )
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return images.mapInPandas(decode_batches, DECODED_SCHEMA)


def patch_images(images: DataFrame, patch_size: int = 32,
                 id_col: str = "doc_id", bin_col: str = "image") -> DataFrame:
    """Frame/patch sampling: split each payload into fixed-size byte patches
    (the shape of image-patching / audio frame-sampling — 1→N rows per
    input, done partition-local with no shuffle)."""

    def patch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pids, blobs = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                for i in range(0, len(payload), patch_size):
                    ids.append(doc_id)
                    pids.append(i // patch_size)
                    blobs.append(bytes(payload[i:i + patch_size]))
            yield pd.DataFrame(
                {"doc_id": ids, "patch_id": pids, "patch_bytes": blobs}
            )

    return images.mapInPandas(patch_batches, PATCH_SCHEMA)


def decode_images_sql(table: str = "documents") -> str:
    """DuckDB twin of documents_as_images + decode_images (fake decode is
    md5-derived, so SQL reproduces it exactly)."""
    return f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       (['jpeg','png','webp'])[1 + ('0x' || substr(md5(text), 9, 2))::BIGINT % 3] AS format,
       CAST(64 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 1024 AS INTEGER) AS width,
       CAST(64 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 1024 AS INTEGER) AS height,
       ('0x' || substr(md5(text), 11, 15))::BIGINT AS luma_hash
FROM {table}
"""


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_ord", IntegerType()),
    StructField("frame_hash", StringType()),
])

FRAME_LEN = 64
FRAME_STRIDE = 256


def framesample(images: DataFrame, frame_len: int = FRAME_LEN,
                stride: int = FRAME_STRIDE, id_col: str = "doc_id",
                bin_col: str = "image") -> DataFrame:
    """Video-style keyframe sampling: one frame of `frame_len` bytes every
    `stride` bytes, with ordinality and a per-frame content hash.

    1→N rows per payload, computed partition-local in Arrow batches (no
    shuffle, no driver). A real codec would replace the byte-slice with an
    ffmpeg keyframe extraction — the schema, ordinality, and batch shape
    are already the production ones."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ords, hashes = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                for n, i in enumerate(range(0, len(payload), stride)):
                    ids.append(doc_id)
                    ords.append(n)
                    hashes.append(
                        hashlib.md5(bytes(payload[i:i + frame_len])).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_ord": ords, "frame_hash": hashes})

    return images.mapInPandas(frame_batches, FRAME_SCHEMA)


def framesample_sql(table: str = "documents", frame_len: int = FRAME_LEN,
                    stride: int = FRAME_STRIDE) -> str:
    """DuckDB twin: same frames via substr over the text payload (the fake
    'video' is the UTF-8 bytes, so string slicing = byte slicing)."""
    return f"""
SELECT doc_id,
       CAST(f.i AS INTEGER) AS frame_ord,
       md5(substr(text, 1 + f.i * {stride}, {frame_len})) AS frame_hash
FROM {table}
JOIN LATERAL (
  SELECT unnest(generate_series(
    0, CAST(floor((length(text) - 1) / {stride}) AS INTEGER))) AS i
) f ON length(text) > 0
"""
