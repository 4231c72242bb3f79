"""Age-based VACUUM retention, bloom-filter runtime join pruning, the
rate source, and idempotent streaming ingest into a ManagedTable."""

from __future__ import annotations

import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.catalog import load_table
from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.streaming.events import streaming_dedup_ingest


def test_vacuum_age_retention(spark):
    d = tempfile.mkdtemp(prefix="vacuum_age_")
    try:
        t = ManagedTable(spark, f"{d}/t")
        df = spark.range(10)
        t.create(df)
        # v1 widens the schema — explicit opt-in required since the
        # overwriteSchema guard landed.
        t.overwrite(df.withColumn("x", F.lit(1)), overwrite_schema=True)
        t.overwrite(df.withColumn("x", F.lit(2)))
        # Everything is seconds old: a 1-hour retention removes nothing.
        assert t.vacuum(keep_last=1, older_than_s=3600) == []
        assert t.read(version=0).count() == 10
        # Zero retention: versions 0 and 1 go, latest survives.
        assert t.vacuum(keep_last=1, older_than_s=0) == [0, 1]
        assert t.read().count() == 10
        with pytest.raises(Exception):
            t.read(version=0).count()
        # History (the commit log) remains queryable after vacuum.
        assert len(t.history()) == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime bloom-filter injection: a selective dim-side filter is
    turned into a might_contain() pre-filter on the fact scan, cutting
    the shuffled fact rows before the join — at 100 TB this is the
    difference between shuffling the whole fact table and shuffling the
    matching slice. Thresholds forced to 0 because sf0.001/sf0.01 scans
    are below the 10 GB default application-side threshold."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load_table(spark, sf_dir, "orders")
        customer = load_table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        joined = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
            "o_orderkey", "c_name"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        # And it still computes the right thing.
        n = joined.count()
        expected = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .filter(F.col("c_mktsegment") == "BUILDING")
            .count()
        )
        assert n == expected
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_rate_source_produces_rows(spark):
    """The kafka-less load-generator source (format='rate'): proves the
    streaming surface runs against a live unbounded source, not only
    replayed files."""
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .withColumn("bucket", F.col("value") % 10)
        .writeStream.format("memory")
        .queryName("rate_demo")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("rate_demo").isEmpty():
            time.sleep(0.5)
        rows = spark.table("rate_demo")
        assert not rows.isEmpty()
        assert set(rows.columns) == {"timestamp", "value", "bucket"}
    finally:
        q.stop()


def test_streaming_dedup_ingest_is_idempotent(spark, sf_dir):
    """Two micro-batch rounds with overlapping event_ids: the second
    round's duplicates are dropped by the anti-join against the table's
    existing keys (at-least-once source -> exactly-once table)."""
    d = tempfile.mkdtemp(prefix="ingest_")
    try:
        ev = load_table(spark, sf_dir, "events").limit(200).cache()
        first = ev.filter(F.col("event_id") % 2 == 0)  # evens
        second = ev  # everything: replays the evens, adds the odds
        first.write.parquet(f"{d}/in/batch1")
        table = ManagedTable(spark, f"{d}/table")
        schema = ev.schema

        def run_round():
            stream = spark.readStream.schema(schema).parquet(f"{d}/in/*")
            q = streaming_dedup_ingest(
                stream, table, ["event_id"], f"{d}/chk"
            )
            q.awaitTermination(120)

        run_round()
        n_first = table.read().count()
        assert n_first == first.count()

        second.write.parquet(f"{d}/in/batch2")
        run_round()
        got = table.read()
        assert got.count() == ev.count()  # no duplicated evens
        assert got.select("event_id").distinct().count() == ev.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_txn_append_is_idempotent(spark):
    d = tempfile.mkdtemp(prefix="txn_append_")
    try:
        t = ManagedTable(spark, f"{d}/t")
        t.create(spark.range(0, 5).selectExpr("id"))
        v1 = t.append(spark.range(5, 8).selectExpr("id"),
                      txn_app="loader", txn_version=1)
        assert t.read().count() == 8
        # Replay of the same (or an older) txn version: no-op.
        assert t.append(spark.range(100, 200).selectExpr("id"),
                        txn_app="loader", txn_version=1) == v1
        assert t.append(spark.range(100, 200).selectExpr("id"),
                        txn_app="loader", txn_version=0) == v1
        assert t.read().count() == 8
        # A NEW txn version commits; an unrelated app is independent.
        t.append(spark.range(8, 10).selectExpr("id"),
                 txn_app="loader", txn_version=2)
        t.append(spark.range(10, 11).selectExpr("id"),
                 txn_app="other", txn_version=0)
        assert t.read().count() == 11
        assert t.last_txn_version("loader") == 2
        assert t.last_txn_version("other") == 0
        assert t.last_txn_version("nobody") is None
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_txn_ingest_exactly_once(spark):
    from delta_lake_platform_spark.streaming.events import streaming_txn_ingest

    d = tempfile.mkdtemp(prefix="txn_stream_")
    try:
        src = f"{d}/src"
        import os as _os
        _os.makedirs(src)
        spark.range(0, 20).selectExpr("id").write.parquet(f"{src}/b0")
        stream = spark.readStream.schema("id long").parquet(f"{src}/b*")
        t = ManagedTable(spark, f"{d}/t")
        t.create(spark.createDataFrame([], "id long"))

        q = streaming_txn_ingest(stream, t, f"{d}/ckpt", app_id="ingest")
        q.awaitTermination(60)
        n1 = t.read().count()
        assert n1 == 20

        # Restart from the same checkpoint with no new data: the replayed
        # planning commits nothing (txn versions already recorded).
        q = streaming_txn_ingest(stream, t, f"{d}/ckpt", app_id="ingest")
        q.awaitTermination(60)
        assert t.read().count() == 20

        # New file -> exactly its rows land.
        spark.range(20, 25).selectExpr("id").write.parquet(f"{src}/b1")
        q = streaming_txn_ingest(stream, t, f"{d}/ckpt", app_id="ingest")
        q.awaitTermination(60)
        assert t.read().count() == 25
        assert {r.id for r in t.read().collect()} == set(range(25))
    finally:
        shutil.rmtree(d, ignore_errors=True)
