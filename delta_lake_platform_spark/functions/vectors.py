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
