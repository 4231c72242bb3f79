"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata. The Spark-side
plumbing — schema contracts, Arrow-batched mapInPandas, partitioning —
is real and tested. The codec step has three tiers:

- ``fake=True``: a deterministic hash-derived stand-in with the exact
  shape a real decoder would produce (what the oracle queries use).
- real image decode: when Pillow is importable on the executors,
  ``decode_features`` / ``resize_media`` decode actual PNG/JPEG bytes
  (import-guarded; this environment does not ship Pillow, so the tests
  for it skip cleanly).
- video frame sampling has no real backend here (no ffmpeg); it raises
  NotImplementedError unless ``fake=True``.

Swapping decoder tiers changes only the body of the pandas function,
never the plan, schema, or batch shape.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("content_sha", StringType()),
        StructField("sniffed_type", StringType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def with_media_metadata(
    df: DataFrame, id_col: str = "media_id", bin_col: str = "payload"
) -> DataFrame:
    """Typed metadata over an opaque binary column — all JVM-side
    (no decode): byte length, content hash, magic-byte sniffing."""
    b = F.col(bin_col)
    prefix = F.hex(F.substring(b, 1, 4))
    sniffed = (
        F.when(prefix.startswith("89504E47"), "image/png")
        .when(prefix.startswith("FFD8FF"), "image/jpeg")
        .when(prefix.startswith("52494646"), "audio/wav")
        .when(prefix.startswith("66747970"), "video/mp4")
        .otherwise("application/octet-stream")
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.length(b).cast("long").alias("byte_len"),
        F.sha2(b, 256).alias("content_sha"),
        sniffed.alias("sniffed_type"),
    )


def _pil_image_features(payload: bytes) -> list[float]:
    """Real image decode -> FEATURE_DIM grayscale patch means in [0,1].
    Requires Pillow (ImportError propagates to the caller's guard)."""
    import io

    import numpy as np
    from PIL import Image

    side = int(FEATURE_DIM**0.5)  # 16 -> 4x4 patch grid
    with Image.open(io.BytesIO(payload)) as img:
        small = img.convert("L").resize((side, side), Image.BILINEAR)
        arr = np.asarray(small, dtype=np.float32) / 255.0
    return arr.reshape(-1).tolist()


def decode_features(
    df: DataFrame,
    id_col: str = "media_id",
    bin_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Arrow-batched decode -> feature-extract over mapInPandas.

    ``fake=True``: deterministic per-byte-content vector (the oracle
    path). Otherwise a REAL image decode via Pillow when it is
    importable on the executor (grayscale 4x4 patch means — the minimal
    honest visual feature); NotImplementedError when no codec exists,
    so a misconfigured cluster fails loudly instead of silently
    fabricating features.
    """

    def decode(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        if not fake:
            try:
                import PIL  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "no image codec available (Pillow not installed); "
                    "pass fake=True for the deterministic stand-in"
                ) from exc
        for pdf in batches:
            feats = []
            for payload in pdf[bin_col]:
                if fake:
                    h = hashlib.sha256(bytes(payload)).digest()
                    vec = (
                        np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16)
                        .astype(np.float32)
                        / 65535.0
                    )
                    feats.append(vec.tolist())
                else:
                    feats.append(_pil_image_features(bytes(payload)))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[bin_col].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return df.mapInPandas(decode, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("pixels", BinaryType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_sha", StringType()),
    ]
)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    bin_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Image resize over mapInPandas: one output row per input, fixed
    ``width*height``-byte grayscale pixel buffer. With Pillow available
    (and ``fake=False``) this is a REAL ``Image.resize``; the stand-in
    tiles the payload bytes to the target size, preserving the contract
    a real decoder obeys (deterministic, shape-exact, 1:1)."""

    def resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        if not fake:
            try:
                import PIL  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "no image codec available (Pillow not installed); "
                    "pass fake=True for the stand-in"
                ) from exc
        size = width * height
        for pdf in batches:
            out = []
            for payload in pdf[bin_col]:
                if fake:
                    raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                    reps = -(-size // max(len(raw), 1))  # ceil
                    out.append(np.tile(raw, reps)[:size].tobytes())
                else:
                    import io

                    from PIL import Image

                    with Image.open(io.BytesIO(bytes(payload))) as img:
                        small = img.convert("L").resize(
                            (width, height), Image.BILINEAR
                        )
                        out.append(
                            np.asarray(small, dtype=np.uint8).tobytes()
                        )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "pixels": out,
                }
            )

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    frame_size: int = 512,
    stride: int = 4,
    id_col: str = "media_id",
    bin_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling over mapInPandas: each media row EXPLODES
    into one row per sampled frame (indices 0, stride, 2*stride, ...
    over ``ceil(byte_len/frame_size)`` frames) — the row-multiplying
    batch shape a real ffmpeg keyframe sampler produces. The stand-in
    "frame" is the corresponding byte slice; its length and sha256 are
    deterministic, so the full explosion is oracle-checkable in SQL."""

    def frames(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codecs not available; pass fake=True for the stand-in"
                )
            ids, idxs, lens, shas = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload)
                n_frames = max(1, -(-len(raw) // frame_size))
                for i in range(0, n_frames, stride):
                    chunk = raw[i * frame_size : (i + 1) * frame_size]
                    ids.append(int(mid))
                    idxs.append(i)
                    lens.append(len(chunk))
                    shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "frame_sha": pd.Series(shas, dtype="object"),
                }
            )

    return df.mapInPandas(frames, schema=FRAME_SCHEMA)
