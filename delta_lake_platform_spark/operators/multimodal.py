"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata. The Spark-side
plumbing — schema contracts, Arrow-batched mapInPandas, partitioning —
is real and tested; the actual codec step is STUBBED (image/audio
libraries are not available in this environment): ``decode_features``
raises NotImplementedError unless ``fake=True``, which substitutes a
deterministic hash-derived feature vector with the exact shape a real
decoder would produce. Swapping in a real decoder changes only the
body of the pandas function, not the plan, schema, or batch shape.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
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


def decode_features(
    df: DataFrame,
    id_col: str = "media_id",
    bin_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Arrow-batched decode -> feature-extract over mapInPandas.

    Real decoders (PIL/librosa/ffmpeg) are not installed here; with
    ``fake=True`` a deterministic per-byte-content vector stands in so
    the distributed plumbing (batch iteration, schema, partition
    parallelism) is fully exercised and testable.
    """

    def decode(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "pass fake=True for the deterministic stand-in"
                )
            feats = []
            for payload in pdf[bin_col]:
                h = hashlib.sha256(bytes(payload)).digest()
                vec = (
                    np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16)
                    .astype(np.float32)
                    / 65535.0
                )
                feats.append(vec.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[bin_col].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return df.mapInPandas(decode, schema=FEATURES_SCHEMA)
