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


@register("media_decode_features")
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode->features (deterministic fake
    codec; see operators/multimodal.py). No SQL oracle: the feature
    vector derivation is not expressible in DuckDB — rows-only check;
    determinism + shape are asserted in tests/test_multimodal.py."""
    feats = multimodal.decode_features(_payloads(spark, sf_dir), fake=True)
    return feats.orderBy("media_id")
