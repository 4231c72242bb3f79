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


# The fake codec's feature i is the i-th little-endian uint16 of
# sha256(payload), scaled to [0,1] as float32. DuckDB has no hex->int
# builtin, so the oracle parses hex digits via strpos over the digit
# alphabet and rebuilds each uint16; the comparison happens on the raw
# uint16 lattice (exactly recoverable from the float32 by
# round(f*65535) — float32's 6e-8 relative error is far below the 0.5
# integer threshold), which sidesteps float32-vs-double ROUND edges.
_HEXD = "strpos('0123456789abcdef', substr(sha, {pos}, 1)) - 1"

DECODE_ORACLE = f"""
WITH h AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text))::BIGINT AS n_bytes,
         sha256(text) AS sha
  FROM documents
),
i AS (SELECT unnest(range(0, 16)) AS feat_idx)
SELECT media_id, n_bytes, feat_idx,
  (
      ({_HEXD.format(pos='4*feat_idx+1')}) * 16
    + ({_HEXD.format(pos='4*feat_idx+2')})
    + 256 * (
        ({_HEXD.format(pos='4*feat_idx+3')}) * 16
      + ({_HEXD.format(pos='4*feat_idx+4')})
    )
  )::BIGINT AS feat_u16
FROM h CROSS JOIN i
ORDER BY media_id, feat_idx
"""


@register("media_decode_features", DECODE_ORACLE)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode->features (deterministic fake
    codec; see operators/multimodal.py), value-oracled end to end: the
    16-wide float32 feature vector is exploded and mapped back to its
    exact uint16 lattice, which the DuckDB oracle reconstructs from
    sha256 hex — every decoded value is hash-compared, not just row
    counts."""
    feats = multimodal.decode_features(_payloads(spark, sf_dir), fake=True)
    return (
        feats.select(
            "media_id",
            "n_bytes",
            F.posexplode("features").alias("feat_idx", "__f"),
        )
        .select(
            "media_id",
            "n_bytes",
            F.col("feat_idx").cast("long").alias("feat_idx"),
            F.round(F.col("__f") * 65535).cast("long").alias("feat_u16"),
        )
        .orderBy("media_id", "feat_idx")
    )
