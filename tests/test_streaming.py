"""Structured Streaming: stream results must equal batch results
(unified semantics), dedup-within-watermark, and streaming SCD."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from delta_lake_platform_spark.scd import ScdConfig
from delta_lake_platform_spark.sources.catalog import load_table
from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.scd.engine import create_scd_target
from delta_lake_platform_spark.streaming.events import (
    deduped_stream,
    streaming_scd,
    windowed_counts,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _stream_dir(spark, sf_dir):
    """Materialize events (ns->us normalized) as a streaming source dir."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(f"{d}/in")
    return d


def test_stream_equals_batch_windowed_counts(spark, sf_dir):
    d = _stream_dir(spark, sf_dir)
    try:
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(f"{d}/in")
        q = (
            windowed_counts(stream)
            .writeStream.format("memory")
            .queryName("wc_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
            for r in spark.table("wc_stream").collect()
        }
        expected = {
            (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
            for r in windowed_counts(load_table(spark, sf_dir, "events")).collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_within_watermark(spark, sf_dir):
    d = _stream_dir(spark, sf_dir)
    try:
        # duplicate every event, then stream-dedup on event_id
        ev = spark.read.parquet(f"{d}/in")
        ev.unionByName(ev).write.mode("overwrite").parquet(f"{d}/dup")
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(f"{d}/dup")
        q = (
            deduped_stream(stream)
            .writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n_unique = ev.select("event_id").distinct().count()
        assert spark.table("dedup_stream").count() == n_unique
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_scd(spark, sf_dir):
    """foreachBatch -> apply_scd: the streaming dimension-maintenance
    fusion (SURVEY.md §7.6)."""
    d = _stream_dir(spark, sf_dir)
    try:
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(f"{d}/in")
            .select("user_id", "event_type", "value", "ts")
        )
        cfg = ScdConfig(
            pk_cols=["user_id"],
            scd_cols=["event_type"],
            select_cols=["user_id", "event_type", "value"],
            effective_from_col="ts",
            clock=lambda: datetime(2026, 1, 1),
        )
        table = ManagedTable(spark, f"{d}/dim")
        batch_proto = spark.read.parquet(f"{d}/in").select(
            "user_id", "event_type", "value", "ts"
        )
        create_scd_target(table, batch_proto, cfg)
        q = streaming_scd(stream, table, cfg, f"{d}/ckpt")
        q.awaitTermination(180)
        final = table.read()
        n_users = batch_proto.select("user_id").distinct().count()
        actives = final.filter(
            (F.col("record_status") == "A") & F.col("effective_to").isNull()
        )
        # one active row per user — the SCD invariant held under streaming
        assert actives.count() == n_users
        assert actives.select("user_id").distinct().count() == n_users
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_static_join_equals_batch(spark, sf_dir):
    """Stream-static enrichment: a streaming fact joined to a static
    dimension (broadcast per micro-batch, no stream state). Results
    must equal the batch join."""
    d = _stream_dir(spark, sf_dir)
    try:
        static_dim = (
            load_table(spark, sf_dir, "events")
            .select("user_id")
            .distinct()
            .withColumn("user_tier", F.when(F.col("user_id") % 3 == 0, "gold").otherwise("std"))
        )
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(f"{d}/in")
        enriched = (
            stream.join(F.broadcast(static_dim), on="user_id")
            .groupBy("user_tier")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            enriched.writeStream.format("memory")
            .queryName("ss_join")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r.user_tier, r.n) for r in spark.table("ss_join").collect()}
        batch = (
            load_table(spark, sf_dir, "events")
            .join(static_dim, on="user_id")
            .groupBy("user_tier")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert got == {(r.user_tier, r.n) for r in batch.collect()}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_mv_maintenance(spark, sf_dir):
    """Stream-fed materialized view: after the stream drains, the view
    state must equal a from-scratch aggregation of everything ingested,
    with one refresh commit per non-empty micro-batch."""
    from delta_lake_platform_spark.sources.materialized_view import (
        MaterializedAggView,
    )
    from delta_lake_platform_spark.streaming.events import (
        streaming_mv_maintenance,
    )

    d = tempfile.mkdtemp(prefix="mv_stream_")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round(F.col("value") * 100).cast("long").alias("value_cents")
    )
    ev.repartition(4).write.mode("overwrite").parquet(f"{d}/in")

    base = ManagedTable(spark, f"{d}/base")
    base.create(ev.limit(0))
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["event_type"], sum_cols=["value_cents"]
    )
    mv.create()

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/in")
    )
    q = streaming_mv_maintenance(stream, base, mv, f"{d}/ckpt")
    q.awaitTermination(120)

    got = mv.state.read().select("event_type", "n_rows", "sum_value_cents")
    want = (
        base.read()
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("value_cents").alias("sum_value_cents"),
        )
    )
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    refreshes = [
        h for h in mv.state.history() if h["operation"] == "MV_REFRESH"
    ]
    assert len(refreshes) >= 2  # maxFilesPerTrigger=1 -> several batches
    assert not mv.is_stale()
    shutil.rmtree(d, ignore_errors=True)
