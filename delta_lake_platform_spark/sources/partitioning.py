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


def zorder_frame(
    df: DataFrame, zorder_cols: Sequence[str], n_files: int = 8
) -> DataFrame:
    """Return df reordered by Z-value across ``n_files`` range
    partitions (each written file covers a compact hyper-rectangle of
    the key space -> min/max stats prune on every dimension). One extra
    min/max aggregation pass computes the normalization ranges."""
    row = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in zorder_cols],
        *[F.max(c).alias(f"max_{c}") for c in zorder_cols],
    ).first()
    ranges = {
        c: (float(row[f"min_{c}"]), float(row[f"max_{c}"])) for c in zorder_cols
    }
    with_z = df.withColumn("__z", _zvalue(zorder_cols, ranges))
    return (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
