"""Multimodal column plumbing (SURVEY §2.H): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` pipelines.

The container has no image/audio libraries, so the DECODE KERNEL is
deliberately pluggable: ``decode_image_batch`` ships a deterministic fake
decoder (header-parse only) and raises ``NotImplementedError`` from
``_real_decode`` — the Spark-side plumbing (schema, batch shape,
partitioning, UDF signature) is real and tested, and swapping in
Pillow/ffmpeg is a one-function change on the executors.

Scale notes:
- binary payloads ride ``spark.read.format('binaryFile')`` (path, length,
  modificationTime, content) — Spark splits by file, never loads a
  partition's payloads all at once into the driver.
- ``maxRecordsPerBatch`` bounds Arrow batch memory when payloads are large;
  repartition by size bucket before heavy decode so one task doesn't get
  all the 4K videos.
- derived features (embeddings, thumbnails) land in ordinary columns —
  everything downstream (dedup, ANN) is modality-agnostic.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def read_binary_dir(spark, root: str, glob: str = "*") -> DataFrame:
    """Binary-file source (A1 analog for non-text modalities)."""
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(root)
    )


def _real_decode(payload: bytes) -> tuple[int, int]:
    """Plug point for a real decoder (Pillow/libvips/ffmpeg on executors)."""
    raise NotImplementedError(
        "image/audio decode libraries are not available in this environment; "
        "install Pillow on executors and replace _real_decode"
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in decoder: recognizes PNG/JPEG magic and, for
    the test fixtures, parses width/height from a tiny fake header
    ('FAKE' + 2x uint16 BE); everything else is 'unknown'."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return "png", w, h
    if payload[:2] == b"\xff\xd8":
        return "jpeg", -1, -1
    if payload[:4] == b"FAKE" and len(payload) >= 8:
        w, h = struct.unpack(">HH", payload[4:8])
        return "fake", w, h
    return "unknown", -1, -1


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic pseudo-embedding from the content digest — the plumbing
    double for a vision encoder (same shape/dtype contract)."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]


def decode_images(binary_df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """binaryFile rows → typed image metadata + feature vector, via
    Arrow-batched mapInPandas (the multimodal A3)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("path", "n_bytes", "format", "width", "height",
                                    "content_hash", "feature")}
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = bytes(content)
                fmt, w, h = _fake_decode(payload)
                out["path"].append(path)
                out["n_bytes"].append(len(payload))
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["content_hash"].append(hashlib.md5(payload).hexdigest())
                out["feature"].append(_fake_feature(payload, feature_dim))
            yield pd.DataFrame(out)

    return binary_df.select("path", "content").mapInPandas(
        batches, schema=IMAGE_META_SCHEMA
    )


def exact_binary_dedup(decoded: DataFrame) -> DataFrame:
    """Exact multimodal dedup on the content digest (same pattern as
    doc_exact_dedup — modality-agnostic once hashed)."""
    return decoded.groupBy("content_hash").agg(
        F.min("path").alias("keep_path"), F.count(F.lit(1)).alias("n_copies")
    )
