"""Executor block-storage hygiene for localCheckpoint-heavy code.

``DataFrame.localCheckpoint`` persists the materialized RDD in executor
block storage, and ``DataFrame.unpersist`` cannot reach it — the blocks
live until the JVM-side RDD object is garbage collected, which for a
long-lived driver holding py4j references is effectively never. A
session that runs many checkpoint-bearing queries therefore accumulates
dead blocks without bound: storage-evicted execution memory, GC
pressure, and steadily inflating query times (guide §5: "Cached data
competes with execution memory; unpersist when done").

Two idioms:

- scoped (streaming folds): snapshot ids before creating a checkpoint,
  unpersist exactly those after the fold's commit —
  ``snapshot_persisted`` + ``unpersist_new_since``.
- bulk (bench / REPL hygiene between independent queries):
  ``free_persisted_rdds`` drops every persisted RDD. Safe whenever no
  live DataFrame still needs a checkpointed lineage — e.g. between
  fully-collected queries.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def snapshot_persisted(spark: SparkSession) -> set:
    """Ids of currently persisted RDDs (localCheckpoint included)."""
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())


def unpersist_new_since(
    spark: SparkSession, before: set, blocking: bool = False
) -> int:
    """Unpersist every RDD persisted since ``before`` was snapshotted.
    Returns how many were freed."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for rid in set(jmap.keySet()) - set(before):
        jr = jmap.get(rid)
        if jr is not None:
            jr.unpersist(blocking)
            n += 1
    return n


def free_persisted_rdds(spark: SparkSession, blocking: bool = False) -> int:
    """Unpersist EVERY persisted RDD. Only call when no live DataFrame
    depends on a checkpointed lineage (between fully-collected
    queries). Returns how many were freed."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for rid in set(jmap.keySet()):
        jr = jmap.get(rid)
        if jr is not None:
            jr.unpersist(blocking)
            n += 1
    return n
