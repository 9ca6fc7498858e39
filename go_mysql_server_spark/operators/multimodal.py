"""Multimodal column operators: image/audio/video as opaque binary columns.

The Spark-side plumbing is real and scale-correct: binary payloads travel as
BinaryType columns, metadata as typed columns, and decode/feature-extract
runs as Arrow-batched ``mapInPandas`` (one Python worker per partition, zero
driver involvement — the 100 TB path). The decode itself is STUBBED with a
deterministic fake (this container has no image/audio codecs): fake "decode"
derives width/height/format from the md5 of the bytes, so tests and the
DuckDB oracle can verify the plumbing end-to-end bit-for-bit.

Swapping the stub for a real decoder (PIL/ffmpeg) changes only the body of
``_decode_one`` — schema, batching, partitioning are already production
shaped.

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
    """Deterministic fake decode: metadata derived from md5(payload).

    STUB — NotImplementedError territory for real codecs; the fake keeps
    every downstream stage (schema, batching, oracle) fully testable.
    """
    h = hashlib.md5(payload).hexdigest()
    width = 64 + int(h[:4], 16) % 1024
    height = 64 + int(h[4:8], 16) % 1024
    fmt = FAKE_FORMATS[int(h[8:10], 16) % len(FAKE_FORMATS)]
    luma = int(h[10:25], 16)  # 60-bit, matches md5_int60-style derivation
    return len(payload), fmt, width, height, luma


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
