"""Structured Streaming surface over the ``events`` stream.

The reference has no streaming (SURVEY.md §2.9) — its "stream" is
successive batch calls to apply_scd. This module supplies the idiomatic
Spark upgrade path:

- ``windowed_counts``: event-time tumbling-window aggregation with a
  watermark for late data;
- ``deduped_stream``: dropDuplicatesWithinWatermark on event_id;
- ``streaming_scd``: foreachBatch -> apply_scd — each micro-batch runs
  the SCD engine against a ManagedTable, fusing the reference's batch
  semantics with a streaming source (the natural end-state of the
  reference design).

Tests drive these with a file source reading the driver's events
parquet (converted through the same catalog ns->us normalization) and
an in-memory sink. The same code runs unchanged against Kafka at scale:
swap ``readStream.format``.

``windowed_counts_batch`` is the batch-equivalent of the streaming
aggregation (identical results on a static frame) and is what the
driver's oracle checks — streaming and batch share one logical plan in
Spark, so the batch check certifies the aggregation logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-(window, event_type) count + value sum with late-data bound.

    ``events`` may be a streaming or a static DataFrame — the plan is
    identical (Spark's unified batch/streaming semantics)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def deduped_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-event_id stream within the watermark horizon."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based). Works batch or streaming."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", "2 hours")
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def streaming_scd(events_stream: DataFrame, table, cfg, checkpoint_dir: str,
                  mode: str = "single_commit"):
    """Run the SCD engine on every micro-batch (streaming dimension
    maintenance). Returns the StreamingQuery; caller awaits/stops it."""
    from ..scd.engine import apply_scd

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            apply_scd(batch_df, table, cfg, mode=mode)

    return (
        events_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup_ingest(
    stream: DataFrame, table, key_cols: list[str], checkpoint_dir: str
):
    """Idempotent streaming ingest into a ManagedTable: each micro-batch
    is deduped within itself, then anti-joined against the keys already
    in the table, so replayed batches (at-least-once sources) insert
    nothing twice — end-to-end exactly-once on the key domain.

    The anti-join probes only the key projection of the target (column-
    pruned parquet scan); at scale that side would be a bucketed/z-
    ordered key index rather than a full snapshot scan. Returns the
    StreamingQuery."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.dropDuplicates(key_cols)
        if table.exists():
            existing = table.read().select(*key_cols).distinct()
            fresh = batch.join(existing, on=key_cols, how="left_anti")
            if not fresh.isEmpty():
                table.append(fresh)
        else:
            table.create(batch)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_txn_ingest(
    stream: DataFrame, table, checkpoint_dir: str, app_id: str
):
    """Exactly-once streaming appends via the transactional-writer
    protocol (Delta's ``txnAppId``/``txnVersion``): each micro-batch
    commits with ``txn_version = batch_id``; a replayed batch (source
    retry, driver restart, checkpoint re-read) sees its version already
    recorded in the TARGET table's log and becomes a no-op. Unlike
    ``streaming_dedup_ingest`` this needs no key scan of the target —
    idempotence costs one log read regardless of table size, and rows
    need no natural key. The table must already exist (create it with
    the stream's schema)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        table.append(batch_df, txn_app=app_id, txn_version=batch_id)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_mv_maintenance(
    stream: DataFrame, base, view, checkpoint_dir: str
):
    """Continuously-maintained materialized view: each micro-batch is
    appended to the base ManagedTable, then the view folds in exactly
    that commit's change feed (sources/materialized_view.py) — the
    Materialize/Databricks "live table" shape. The view state is
    |groups|-sized, so per-batch cost is O(|batch| + |groups|)
    regardless of base size; replaying from the checkpoint is safe
    because refresh() is a no-op when already at the base's version.
    Returns the StreamingQuery."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        base.append(batch_df)
        view.refresh()

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
