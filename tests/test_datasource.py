"""The Spark 4 Python DataSource over ManagedTable: batch snapshot
reads (deletion vectors applied in the scan), time travel via option,
and the append-only streaming tail with Delta-source semantics."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources import datasource
from delta_lake_platform_spark.sources.managed_table import ManagedTable


@pytest.fixture()
def table(spark):
    datasource.register(spark)
    d = tempfile.mkdtemp(prefix="ds_table_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(0, 200).select(
            "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
        ).repartition(3)
    )
    return t


def _load(spark, t, **opts):
    r = spark.read.format("managed_table").option("path", t.path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_matches_table_read(table, spark):
    got = _load(spark, table)
    assert got.count() == 200
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, table.read().collect())
    )


def test_batch_read_applies_deletion_vector(table, spark):
    table.delete("k = 2", rewrite=False)
    table.append(spark.range(500, 510).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")))
    got = _load(spark, table)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, table.read().collect())
    )
    assert got.filter("k = 2 AND id < 500").count() == 0
    # Time travel through the version option.
    assert _load(spark, table, version=0).count() == 200


def test_stream_tail_appends_exactly_once(table, spark):
    d = tempfile.mkdtemp(prefix="ds_stream_")

    def run():
        q = (
            spark.readStream.format("managed_table")
            .option("path", table.path)
            .load()
            .writeStream.format("parquet")
            .option("path", f"{d}/out")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run()
    assert spark.read.parquet(f"{d}/out").count() == 200

    table.append(spark.range(1000, 1020).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")))
    table.append(spark.range(2000, 2005).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")))
    run()
    # Exactly the two appended batches arrive — nothing replayed.
    out = spark.read.parquet(f"{d}/out")
    assert out.count() == 225
    assert out.filter("id >= 1000").count() == 25


def test_stream_tail_rejects_non_append_commits(table, spark):
    d = tempfile.mkdtemp(prefix="ds_stream2_")

    def run(out, ignore_changes=False):
        r = spark.readStream.format("managed_table").option("path", table.path)
        if ignore_changes:
            r = r.option("ignoreChanges", "true")
        q = (
            r.load()
            .writeStream.format("parquet")
            .option("path", f"{d}/{out}")
            .option("checkpointLocation", f"{d}/ckpt_{out}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return q

    run("a")
    table.delete("k = 1")  # full rewrite commit
    table.append(spark.range(3000, 3003).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")))
    with pytest.raises(Exception):
        run("a")

    # With ignoreChanges (fresh checkpoint) the rewrite is skipped and
    # the current snapshot (post-delete, incl. append) flows.
    run("b", ignore_changes=True)
    assert spark.read.parquet(f"{d}/b").count() == table.read().count()
