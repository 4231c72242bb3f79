"""Vector column expressions over array<float>/array<double> columns.

All JVM-side (F.zip_with / F.aggregate / F.transform) — no Python UDFs
in the hot path, so whole-stage codegen applies and 100 TB scans stay
vectorized. Inputs are cast to double before arithmetic so Spark and
DuckDB (list_cosine_similarity etc.) agree to double precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("array<double>")


def dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def max_abs(a: str | Column) -> Column:
    return F.array_max(F.transform(_d(a), lambda x: F.abs(x)))


def quantize_int8(a: str | Column, scale: Column | None = None) -> Column:
    """Symmetric int8 quantization: q_i = floor(x_i * 127 / max|x| + 0.5)
    (explicit floor+0.5, not round() — identical semantics everywhere,
    no banker's-rounding divergence). Cuts vector bytes 4x, which at
    100 TB is 4x less shuffle and 4x more vectors per broadcast; pair
    with a full-precision re-rank of the top candidates."""
    s = max_abs(a) if scale is None else scale
    return F.transform(_d(a), lambda x: F.floor(x * 127.0 / s + 0.5).cast("int"))


def dequantize_int8(q: str | Column, scale: Column) -> Column:
    """Inverse map: x̂_i = q_i * scale / 127."""
    qc = F.col(q) if isinstance(q, str) else q
    return F.transform(qc, lambda x: x.cast("double") * scale / 127.0)
