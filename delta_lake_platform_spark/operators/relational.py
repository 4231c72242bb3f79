"""Reusable relational operator helpers.

Derived from the reference's dataflow idioms:
- ``latest_per_key`` — the dedupe-to-latest window pattern
  (scd_handler.py:73-74: row_number over partitionBy(pk) orderBy desc,
  filter rn==1).
- ``topk_per_group`` — the same pattern generalized to k rows.
- ``split_matched`` — the inner + left_anti split of incoming rows vs
  an existing keyset (scd_handler.py:111-134).

All are pure DataFrame compositions: Catalyst plans the window with a
single shuffle on the partition keys, and Spark >= 3.3 inserts a
WindowGroupLimit (partial top-k on the map side) for rank<=k filters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """One row per key: the first under ``order``. Reference A4/W1."""
    return topk_per_group(df, keys, order, 1).drop("__rn")


def topk_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int
) -> DataFrame:
    """Top-k rows per key group; keeps helper column ``__rn`` (1-based)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)


def split_matched(
    incoming: DataFrame, existing: DataFrame, on: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """(rows whose key exists in ``existing``, rows that are new).

    Mirrors the reference's inner/left_anti pair (scd_handler.py:111-134).
    ``existing`` should be pre-projected to the key columns so the semi
    side stays small (broadcastable when the keyset fits).
    """
    keyset = existing.select(*on).distinct()
    matched = incoming.join(keyset, on=list(on), how="left_semi")
    new = incoming.join(keyset, on=list(on), how="left_anti")
    return matched, new
