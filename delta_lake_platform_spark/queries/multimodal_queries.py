"""Multimodal plumbing exposed to the driver.

The binary payloads are synthesized in-query (UTF-8 bytes of document
text) since the test corpus has no media table; everything downstream —
binary column handling, metadata extraction, Arrow-batched decode —
is the real production path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal
from ..sources.catalog import load_table
from .registry import register


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            F.col("doc_id").alias("media_id"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        )
    )


MEDIA_META_ORACLE = """
SELECT doc_id AS media_id,
  octet_length(encode(text))::BIGINT AS byte_len,
  sha256(text) AS content_sha,
  'application/octet-stream' AS sniffed_type
FROM documents
ORDER BY media_id
"""


@register("media_metadata", MEDIA_META_ORACLE)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary media columns (JVM-side)."""
    return multimodal.with_media_metadata(_payloads(spark, sf_dir)).orderBy(
        "media_id"
    )


FRAME_SAMPLE_ORACLE = """
WITH media AS (
  SELECT doc_id AS media_id, text, octet_length(encode(text)) AS byte_len
  FROM documents
),
idx AS (
  SELECT media_id, text,
         unnest(range(0, GREATEST(CAST(CEIL(byte_len / 512.0) AS BIGINT), 1), 4)) AS frame_idx
  FROM media
),
frames AS (
  SELECT media_id, frame_idx,
         substring(text, CAST(frame_idx * 512 + 1 AS BIGINT), 512) AS chunk
  FROM idx
)
SELECT media_id, frame_idx,
       octet_length(encode(chunk))::BIGINT AS frame_len,
       sha256(chunk) AS frame_sha
FROM frames
ORDER BY media_id, frame_idx
"""


@register("media_frame_sample", FRAME_SAMPLE_ORACLE)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided video-frame sampling: each media row explodes to one row
    per sampled 512-byte 'frame' (stride 4) via Arrow-batched
    mapInPandas. The corpus is ASCII, so the DuckDB oracle reproduces
    the byte slicing with substring+generate_series and the frame
    hashes match exactly — the row-multiplying decode path is value-
    checked end to end, not just row-counted."""
    frames = multimodal.sample_frames(
        _payloads(spark, sf_dir), frame_size=512, stride=4, fake=True
    )
    return frames.orderBy("media_id", "frame_idx")


@register("media_decode_features")
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode->features (deterministic fake
    codec; see operators/multimodal.py). No SQL oracle: the feature
    vector derivation is not expressible in DuckDB — rows-only check;
    determinism + shape are asserted in tests/test_multimodal.py."""
    feats = multimodal.decode_features(_payloads(spark, sf_dir), fake=True)
    return feats.orderBy("media_id")
