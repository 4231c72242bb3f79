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


def _pil_installed() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_without_codec_raises(spark, sf_dir):
    if _pil_installed():
        pytest.skip("Pillow installed: the real decode path applies")
    feats = multimodal.decode_features(_payloads(spark, sf_dir), fake=False)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
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
    if _pil_installed():
        pytest.skip("Pillow installed: the real resize path applies")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
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


def _tiny_png(pixels) -> bytes:
    """Hand-rolled valid grayscale PNG (stdlib zlib only) so the real
    Pillow decode path can be tested without an image library to WRITE
    files. ``pixels``: list of rows of 0-255 ints."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + bytes(row) for row in pixels)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_png_decode_with_pillow(spark):
    """Skips unless Pillow is installed (it is not in this sandbox);
    with it, decode_features must return real 4x4 patch means in [0,1]
    — a solid white PNG decodes to all-ones, solid black to all-zeros."""
    pytest.importorskip("PIL")
    white = _tiny_png([[255] * 8 for _ in range(8)])
    black = _tiny_png([[0] * 8 for _ in range(8)])
    df = spark.createDataFrame(
        [(1, white), (2, black)], "media_id long, payload binary"
    )
    got = {
        r.media_id: r.features
        for r in multimodal.decode_features(df, fake=False).collect()
    }
    assert len(got[1]) == multimodal.FEATURE_DIM
    assert all(abs(v - 1.0) < 1e-6 for v in got[1])
    assert all(abs(v) < 1e-6 for v in got[2])
    resized = multimodal.resize_media(df, width=3, height=2, fake=False).collect()
    assert all(len(bytes(r.pixels)) == 6 for r in resized)
