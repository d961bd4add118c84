"""Multimodal-column catalog entry (SURVEY §2.H, driver-checkable).

The container ships no image/audio codecs and the driver's fixture set has
no binary-file directory, so the oracle-checked query manufactures the
opaque ``binary`` payload column from ``documents.text`` (UTF-8 bytes) and
runs it through the REAL multimodal plumbing from
``operators/multimodal.py``: Arrow-batched ``mapInPandas`` decode
(``parse_header`` — real stdlib PNG/JPEG/GIF/BMP/WAV container-header
parsing — + ``_fake_feature`` sha256-derived embedding) followed by
modality-agnostic exact binary dedup on the content digest. The oracle
mirrors the sniff's ASCII-visible branches (BM/GIF/RIFF/FAKE prefixes);
PNG and JPEG magic bytes are invalid UTF-8 leads and can never occur in
text-derived payloads. Everything the pipeline does — batch shape, schema, hashing,
feature arithmetic — is bit-reproducible in ANSI SQL, so this is a full
value-hash oracle row, not a rows-only pass.

Reference parity: binary ingestion + per-payload metadata mirrors the
reference's per-file source fan-out (run_mutiprocess.py:19-25) applied to
non-text modalities; dedup matches doc_exact_dedup's B-series merge shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codegraphdb_spark.operators.multimodal import _fake_feature, parse_header
from codegraphdb_spark.queries.text import _par_guard
from codegraphdb_spark.registry import query
from codegraphdb_spark.sources.tables import load_table

_DECODED_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, format STRING, content_hash STRING, f0 DOUBLE"
)


def decode_payloads(payloads: DataFrame) -> DataFrame:
    """(doc_id, payload binary) → typed metadata + first feature component,
    via the same Arrow-batched decode kernel as operators/multimodal.py.
    The feature vector is emitted as its first component (a scalar) because
    driver canonicalizers hash cells — array cells are unhashable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "n_bytes", "format", "content_hash", "f0")}
            for doc_id, content in zip(pdf["doc_id"], pdf["payload"]):
                if content is None:
                    # NULL payload mirrors the SQL semantics: NULL LIKE
                    # falls through to 'unknown'; hash/length/feature NULL
                    out["doc_id"].append(doc_id)
                    out["n_bytes"].append(None)
                    out["format"].append("unknown")
                    out["content_hash"].append(None)
                    out["f0"].append(None)
                    continue
                payload = bytes(content)
                fmt, _w, _h = parse_header(payload)
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(payload))
                out["format"].append(fmt)
                out["content_hash"].append(hashlib.md5(payload).hexdigest())
                out["f0"].append(_fake_feature(payload, dim=1)[0])
            yield pd.DataFrame(out)

    return payloads.mapInPandas(batches, schema=_DECODED_SCHEMA)


@query(
    "multimodal_dedup",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             OCTET_LENGTH(CAST(text AS BLOB)) AS n_bytes,
             CASE
               WHEN text LIKE 'BM%'
                    AND OCTET_LENGTH(CAST(text AS BLOB)) >= 26 THEN 'bmp'
               WHEN (text LIKE 'GIF87a%' OR text LIKE 'GIF89a%')
                    AND OCTET_LENGTH(CAST(text AS BLOB)) >= 10 THEN 'gif'
               -- BYTE offsets, not characters: substr(text, 9, 4) counts
               -- code points and diverges from payload[8:12] when any of
               -- the first 8 bytes is multi-byte UTF-8; hex space is
               -- byte-exact (bytes 9..12 = hex chars 17..24, 'WAVE')
               WHEN text LIKE 'RIFF%'
                    AND substr(to_hex(encode(text)), 17, 8) = '57415645'
                    THEN 'wav'
               WHEN text LIKE 'FAKE%'
                    AND OCTET_LENGTH(CAST(text AS BLOB)) >= 8 THEN 'fake'
               ELSE 'unknown'
             END AS format,
             md5(text) AS content_hash,
             CAST(CAST('0x' || substr(sha256(text), 1, 8) AS BIGINT) AS DOUBLE)
               / 4294967296 AS f0
      FROM documents
    )
    SELECT content_hash,
           MIN(doc_id) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(n_bytes) AS n_bytes,
           MIN(format) AS format,
           MIN(f0) AS f0
    FROM m
    GROUP BY content_hash
    ORDER BY keep_doc_id
    """,
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode + exact multimodal dedup: payload column →
    mapInPandas decode (format sniff, content digest, deterministic
    feature) → hash-groupBy dedup keeping the lowest doc_id.

    Scale: the decode is embarrassingly parallel over Arrow batches
    (maxRecordsPerBatch bounds memory for large payloads); the DEDUP
    shuffle moves 32-byte digests + scalars, never payloads — the same
    100 TB-safe shape as doc_exact_dedup. Small-SF exception (ADVICE
    r7): the _par_guard below fires only when the scan has fewer splits
    than cores, and its round-robin DOES move the payloads once — the
    price of parallelizing the decode on a narrow test scan. On a
    production-wide scan the guard is a no-op and the never-shuffle-
    payloads contract holds unconditionally."""
    d = load_table(spark, sf_dir, "documents")
    # _par_guard: the documents scan is a handful of splits at test SFs,
    # which would serialize the Arrow decode on 1-2 cores (at cluster
    # scale the scan is already wide and the guard is a no-op)
    payloads = _par_guard(
        d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    )
    decoded = decode_payloads(payloads)
    return (
        decoded.groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_bytes").alias("n_bytes"),
            F.min("format").alias("format"),
            F.min("f0").alias("f0"),
        )
        .orderBy("keep_doc_id")
    )


_META_SCHEMA = "doc_id BIGINT, format STRING, width INT, height INT, n_bytes INT"


@query(
    "multimodal_meta_extract",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp'
             ELSE 'wav' END AS format,
           CAST(CASE WHEN doc_id % 4 = 3 THEN 8000 + (doc_id % 8) * 4000
                     ELSE 16 + doc_id % 64 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 4 = 3 THEN 1 + doc_id % 2
                     ELSE 16 + (doc_id * 7) % 48 END AS INT) AS height,
           CAST(CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN 24 WHEN 1 THEN 10 WHEN 2 THEN 26
             ELSE 28 END AS INT) AS n_bytes
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL binary container-header round-trip under the value-hash gate:
    each doc_id deterministically synthesizes a genuine PNG / GIF / BMP /
    WAV header (struct-packed magic bytes + geometry fields, exactly as
    the formats specify), and parse_header — the same stdlib kernel the
    binaryFile ingestion path uses — must recover the format and
    dimensions the oracle predicts from doc_id arithmetic alone. A parser
    regression in any branch (endianness, offset, magic) hash-fails this
    row. Both synthesis and parse run in ONE Arrow mapInPandas stage —
    embarrassingly parallel, no shuffle before the presentation sort."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "format", "width", "height", "n_bytes")}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                mod = d % 4
                if mod == 3:
                    rate, ch = 8000 + (d % 8) * 4000, 1 + d % 2
                    payload = (
                        b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"fmt "
                        + b"\x00" * 6 + struct.pack("<H", ch) + struct.pack("<I", rate)
                    )
                else:
                    w, h = 16 + d % 64, 16 + (d * 7) % 48
                    if mod == 0:
                        payload = (
                            b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0d" + b"IHDR"
                            + struct.pack(">II", w, h)
                        )
                    elif mod == 1:
                        payload = b"GIF89a" + struct.pack("<HH", w, h)
                    else:
                        payload = b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h)
                fmt, pw, ph = parse_header(payload)
                out["doc_id"].append(d)
                out["format"].append(fmt)
                out["width"].append(pw)
                out["height"].append(ph)
                out["n_bytes"].append(len(payload))
            yield pd.DataFrame(out)

    d = _par_guard(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.mapInPandas(batches, schema=_META_SCHEMA).orderBy("doc_id")


@query(
    "multimodal_resolution_filter",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp'
               ELSE 'wav' END AS format,
             CAST(CASE WHEN doc_id % 4 = 3 THEN 8000 + (doc_id % 8) * 4000
                       ELSE 16 + doc_id % 64 END AS INT) AS width,
             CAST(CASE WHEN doc_id % 4 = 3 THEN 1 + doc_id % 2
                       ELSE 16 + (doc_id * 7) % 48 END AS INT) AS height
      FROM documents)
    SELECT format,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN width >= 32 AND height >= 32
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN width >= 32 AND height >= 32
                         THEN CAST(width AS BIGINT) * height
                         ELSE 0 END) AS BIGINT) AS kept_pixels,
           CAST(MAX(width) AS INT) AS max_width
    FROM meta
    GROUP BY format
    ORDER BY format
    """,
)
def multimodal_resolution_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-gated corpus filter — the 'drop tiny images before the
    expensive decode' step of a multimodal training pipeline. The REAL
    parse_header kernel recovers geometry from genuine container headers
    (same synthesized payloads as multimodal_meta_extract), then a
    conditional aggregate reports keep-rates and kept-pixel volume per
    format. The quality gate runs on header metadata ONLY — at 100 TB
    this is the step that lets the pipeline skip full-payload decode for
    rejected assets: one Arrow stage over headers, one tiny-key shuffle,
    payload bytes never move."""
    meta = multimodal_meta_extract(spark, sf_dir)
    kept = (F.col("width") >= 32) & (F.col("height") >= 32)
    return (
        meta.groupBy("format")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(
                F.when(kept, F.col("width").cast("bigint") * F.col("height")).otherwise(0)
            )
            .cast("bigint")
            .alias("kept_pixels"),
            F.max("width").cast("int").alias("max_width"),
        )
        .orderBy("format")
    )


@query(
    "multimodal_frame_census",
    oracle="""
    WITH f AS (
      SELECT doc_id, CAST(1 + doc_id % 50 AS INT) AS n_frames FROM documents
    )
    SELECT doc_id, n_frames,
           CAST((n_frames + 3) // 4 AS INT) AS n_sampled,
           CAST(4 * ((n_frames - 1) // 4) AS INT) AS last_frame_idx,
           CAST(40 * 4 * ((n_frames - 1) // 4) AS INT) AS last_ts_ms
    FROM f ORDER BY doc_id
    """,
)
def multimodal_frame_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling census through the REAL sample_frames operator
    (operators/multimodal.py): each doc_id synthesizes a deterministic
    'video' payload of 1 + doc_id%50 KiB (the frame-count double is one
    frame per KiB), the operator expands it 1→many with every_n=4 frame
    stride on a 25 fps clock, and the census re-aggregates per document.
    The oracle predicts sampled counts, last stride index, and last
    timestamp from doc_id arithmetic alone — a stride or clock regression
    in the expansion hash-fails; the frame digests themselves are pinned
    by tests/test_operators.py. Scale shape: map-only synthesis, map-only
    expansion (bounded by every_n), ONE doc-keyed aggregate."""
    from codegraphdb_spark.operators.multimodal import sample_frames

    d = _par_guard(load_table(spark, sf_dir, "documents").select("doc_id"))

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "path": [str(int(x)) for x in pdf["doc_id"]],
                    "content": [
                        b"V" * (1024 * (1 + int(x) % 50)) for x in pdf["doc_id"]
                    ],
                }
            )

    binary = d.mapInPandas(synth, schema="path STRING, content BINARY")
    frames = sample_frames(binary, every_n=4)
    return (
        frames.groupBy(F.col("path").cast("bigint").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_sampled"),
            F.max("frame_idx").cast("int").alias("last_frame_idx"),
            F.max("ts_ms").cast("int").alias("last_ts_ms"),
        )
        .select(
            "doc_id",
            (1 + F.col("doc_id") % 50).cast("int").alias("n_frames"),
            "n_sampled",
            "last_frame_idx",
            "last_ts_ms",
        )
        .orderBy("doc_id")
    )
