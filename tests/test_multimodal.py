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


def test_resize_media_shape_and_determinism(spark, sf_dir):
    resized = multimodal.resize_media(
        _payloads(spark, sf_dir).limit(10), width=8, height=4, fake=True
    )
    rows = resized.collect()
    assert len(rows) == 10
    assert all(len(r.pixels) == 8 * 4 for r in rows)
    again = multimodal.resize_media(
        _payloads(spark, sf_dir).limit(10), width=8, height=4, fake=True
    ).collect()
    assert {(r.media_id, bytes(r.pixels)) for r in rows} == {
        (r.media_id, bytes(r.pixels)) for r in again
    }


def test_resize_media_real_codec_gated(spark, sf_dir):
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        multimodal.resize_media(
            _payloads(spark, sf_dir).limit(1), width=2, height=2
        ).collect()


def test_sample_frames_explosion(spark, sf_dir):
    """One media row -> ceil(n_frames/stride) rows; slice lengths and
    hashes recomputable from the payload."""
    import hashlib

    src = _payloads(spark, sf_dir).limit(5)
    frames = multimodal.sample_frames(src, frame_size=100, stride=2, fake=True)
    by_media = {}
    for r in frames.collect():
        by_media.setdefault(r.media_id, []).append(r)
    payloads = {r.media_id: bytes(r.payload) for r in src.collect()}
    for mid, raw in payloads.items():
        n_frames = max(1, -(-len(raw) // 100))
        expect_idx = list(range(0, n_frames, 2))
        got = sorted(by_media[mid], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == expect_idx
        for r in got:
            chunk = raw[r.frame_idx * 100 : (r.frame_idx + 1) * 100]
            assert r.frame_len == len(chunk)
            assert r.frame_sha == hashlib.sha256(chunk).hexdigest()
