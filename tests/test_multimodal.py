"""Multimodal plumbing: metadata extraction, Arrow decode path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.operators import multimodal
from delta_lake_platform_spark.sources.catalog import load_table


def _payloads(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def test_metadata_sniffing(spark, sf_dir):
    png = bytes([0x89, 0x50, 0x4E, 0x47, 1, 2, 3])
    jpg = bytes([0xFF, 0xD8, 0xFF, 0xE0, 9])
    df = spark.createDataFrame(
        [(1, png), (2, jpg), (3, b"plain text")], "media_id long, payload binary"
    )
    got = {
        r.media_id: (r.sniffed_type, r.byte_len)
        for r in multimodal.with_media_metadata(df).collect()
    }
    assert got[1] == ("image/png", 7)
    assert got[2] == ("image/jpeg", 5)
    assert got[3] == ("application/octet-stream", 10)


def test_decode_features_deterministic_shape(spark, sf_dir):
    feats = multimodal.decode_features(_payloads(spark, sf_dir), fake=True)
    rows = feats.orderBy("media_id").limit(5).collect()
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in rows)
    again = (
        multimodal.decode_features(_payloads(spark, sf_dir), fake=True)
        .orderBy("media_id")
        .limit(5)
        .collect()
    )
    assert [r.features for r in rows] == [r.features for r in again]


def test_decode_without_codec_raises(spark, sf_dir):
    feats = multimodal.decode_features(_payloads(spark, sf_dir), fake=False)
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        feats.limit(1).collect()
