"""Bucketed (pre-shuffled) tables: co-located joins without exchanges.

At 100 TB the dominant cost of a fact-fact join (lineitem x orders) is
the shuffle of both sides. Writing both tables bucketed by their join
key with the same bucket count moves that shuffle to write time, once;
every subsequent join is exchange-free (bucket i joins bucket i).

``write_bucketed`` + ``bucketed_join_ready`` wrap the Spark API;
tests/test_bucketing.py asserts the join plan has ZERO shuffle
exchanges — the artifact that matters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) managed
    table. Sorting by the join key additionally removes the join-time
    sort for sort-merge joins."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
