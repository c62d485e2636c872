"""Multimodal column plumbing (north-star B11).

Media (image/audio/video) is carried as opaque ``binary`` columns with
typed metadata structs.  The decode/feature-extraction step is a
clearly-marked STUB (no media libraries in this container) — but the
Spark-side plumbing is real and tested: schema, Arrow batch shape,
``mapInPandas`` signature, partition behavior.

``multimodal_meta`` is oracle-checkable (byte-level metadata via
built-ins); ``media_decode_stub`` is registered rows-only (sql=None).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.parquet import load_table

CHUNK_BYTES = 64

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("format", StringType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-cast as an opaque media blob column + metadata
    (the binary-column carrier pattern for 100 TB media lakes: blobs
    stay columnar, metadata is queryable without touching bytes)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level metadata over the blob column — all built-ins."""
    media = media_table(spark, sf_dir)
    n_bytes = F.length("payload")
    return media.select(
        "doc_id",
        "media_type",
        n_bytes.alias("n_bytes"),
        F.ceil(n_bytes / CHUNK_BYTES).cast("bigint").alias("n_chunks"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 8))).alias("header_hex"),
    ).orderBy("doc_id")


MULTIMODAL_META_SQL = f"""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type,
       octet_length(encode(text)) AS n_bytes,
       CAST(ceil(octet_length(encode(text)) / {CHUNK_BYTES}.0) AS BIGINT) AS n_chunks,
       lower(substr(hex(encode(text)), 1, 16)) AS header_hex
FROM documents ORDER BY doc_id
"""


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int, str]:
    """Deterministic STUB decode.

    Real deployments plug pillow/ffmpeg/soundfile in here; this
    container has none, so we derive fake-but-stable dimensions from
    the payload bytes.  The Spark plumbing around it (Arrow batches,
    schema, partitioning) is the real deliverable.
    """
    if payload is None:
        raise NotImplementedError("media decode requires a payload")
    n = len(payload)
    kind = media_type.split("/")[0]
    if kind == "image":
        return (n % 640 + 1, n % 480 + 1, 1, "png")
    if kind == "audio":
        return (0, 0, n % 1000 + 1, "wav")
    return (n % 1920 + 1, n % 1080 + 1, n % 240 + 1, "mp4")


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow-batched, per-partition, no shuffle."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "format": [d[3] for d in decoded],
                }
            )

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


def media_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only query: full decode pipeline with the stubbed decoder."""
    return decode_media(media_table(spark, sf_dir)).orderBy("doc_id")


QUERIES: dict[str, tuple] = {
    "multimodal_meta": (multimodal_meta, MULTIMODAL_META_SQL),
    "media_decode_stub": (media_decode_stub, None),
}


def media_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking for blob processing: fixed CHUNK_BYTES windows with a
    per-chunk md5 (content-addressable chunk store pattern — dedupe
    and transfer at chunk granularity at 100 TB).  Chunk slicing is
    done in hex space (2 hex chars per byte) so the DuckDB twin is
    exact without BLOB substring support."""
    media = media_table(spark, sf_dir)
    hexed = media.select(
        "doc_id", F.lower(F.hex(F.col("payload"))).alias("hx"), F.length("payload").alias("n_bytes")
    )
    hex_chunk = 2 * CHUNK_BYTES
    chunks = hexed.select(
        "doc_id",
        "n_bytes",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, CAST(ceil(length(hx) / {hex_chunk}.0) AS INT)), "
                f"i -> substring(hx, (i - 1) * {hex_chunk} + 1, {hex_chunk}))"
            )
        ).alias("chunk_idx", "chunk_hex"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        (F.length("chunk_hex") / 2).cast("bigint").alias("chunk_bytes"),
        F.md5(F.col("chunk_hex").cast("binary")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


MEDIA_CHUNKS_SQL = f"""
WITH hexed AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(range(1, CAST(ceil(length(hx) / {2 * CHUNK_BYTES}.0) AS INT) + 1),
                i -> substr(hx, (i - 1) * {2 * CHUNK_BYTES} + 1, {2 * CHUNK_BYTES}))) AS chunk_hex,
         generate_subscripts(list_transform(range(1, CAST(ceil(length(hx) / {2 * CHUNK_BYTES}.0) AS INT) + 1),
                i -> i), 1) AS chunk_idx_1
  FROM hexed
)
SELECT doc_id, chunk_idx_1 - 1 AS chunk_idx,
       CAST(length(chunk_hex) / 2 AS BIGINT) AS chunk_bytes,
       md5(chunk_hex) AS chunk_md5
FROM chunks
ORDER BY doc_id, chunk_idx
"""

QUERIES.update({"media_chunks": (media_chunks, MEDIA_CHUNKS_SQL)})
