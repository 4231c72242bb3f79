"""Data layout for scan pruning: partitioned writes and Z-ordering.

- ``write_partitioned``: hive-style directory partitioning; a filter on
  the partition column becomes a PartitionFilter — pruned before any
  file I/O (directory listing level). The workhorse layout for
  date-partitioned 100 TB fact tables.
- ``zorder_frame``: interleaves the bits of N integer-ish columns into
  a Z-value and range-partitions + sorts by it, so parquet row-group
  min/max stats become selective on EVERY Z-ordered column at once
  (multi-dimensional data skipping — the OPTIMIZE ZORDER BY analogue;
  reference gap noted in SURVEY.md §4.3).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _zvalue(
    cols: Sequence[str],
    ranges: dict[str, tuple[float, float]],
    bits_per_col: int = 12,
) -> Column:
    """Interleave bits of min/max-NORMALIZED columns. Normalization is
    essential: raw interleaving lets the column with the larger domain
    own the high bits, collapsing Z-order into single-column order
    (observed: every file spanned the full small-column domain)."""
    terms = []
    n = len(cols)
    top = (1 << bits_per_col) - 1
    for ci, c in enumerate(cols):
        lo, hi = ranges[c]
        span = max(hi - lo, 1e-12)
        v = F.round(
            (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span) * top
        ).cast("long")
        for b in range(bits_per_col):
            bit = F.call_function("shiftright", v, F.lit(b)).bitwiseAND(F.lit(1))
            terms.append(F.call_function("shiftleft", bit, F.lit(b * n + ci)))
    return reduce(lambda a, x: a.bitwiseOR(x), terms).alias("__zvalue")


def z_surrogate(df: DataFrame, col: str) -> Column:
    """Order-preserving NUMERIC surrogate for a Z-order column — what
    lets OPTIMIZE ZORDER BY / CLUSTER BY accept strings, dates, and
    timestamps like Delta does. Strings map to their first 7 UTF-8
    bytes read as a base-16 integer (lexicographic prefix order
    preserved; 56 bits keeps the value positive in a long); temporal
    types map to epoch seconds. The surrogate only drives LAYOUT —
    collisions past the prefix merely co-locate similar keys, which is
    the point."""
    t = dict(df.dtypes)[col]
    if t == "string":
        return F.expr(
            f"conv(substring(hex(encode({col}, 'UTF-8')) || "
            "'00000000000000', 1, 14), 16, 10)"
        ).cast("double")
    if t == "date" or t.startswith("timestamp"):
        return F.col(col).cast("timestamp").cast("double")
    if t == "boolean":
        return F.col(col).cast("int").cast("double")
    return F.col(col).cast("double")


def zorder_frame(
    df: DataFrame, zorder_cols: Sequence[str], n_files: int = 8
) -> DataFrame:
    """Return df reordered by Z-value across ``n_files`` range
    partitions (each written file covers a compact hyper-rectangle of
    the key space -> min/max stats prune on every dimension). One extra
    min/max aggregation pass computes the normalization ranges.
    Non-numeric columns Z-order through order-preserving surrogates
    (``z_surrogate``)."""
    surr = {c: f"__zs_{i}" for i, c in enumerate(zorder_cols)}
    df2 = df.select(
        "*", *[z_surrogate(df, c).alias(surr[c]) for c in zorder_cols]
    )
    row = df2.agg(
        *[F.min(surr[c]).alias(f"min_{surr[c]}") for c in zorder_cols],
        *[F.max(surr[c]).alias(f"max_{surr[c]}") for c in zorder_cols],
    ).first()
    ranges = {}
    for c in zorder_cols:
        lo, hi = row[f"min_{surr[c]}"], row[f"max_{surr[c]}"]
        # An all-NULL column contributes a constant (no layout signal).
        ranges[surr[c]] = (
            (float(lo), float(hi)) if lo is not None else (0.0, 1.0)
        )
    with_z = df2.withColumn("__z", _zvalue(list(surr.values()), ranges))
    return (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *surr.values())
    )
