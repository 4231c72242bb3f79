"""streaming/quarantine.py — expectations as a foreachBatch sink with
idempotent-writer appends."""

from __future__ import annotations

import os
import tempfile

from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.streaming.quarantine import (
    expectations_stream,
)

RULES = {"v_pos": "v > 0", "name_ok": "name IS NOT NULL"}


def _setup(spark):
    d = tempfile.mkdtemp(prefix="dlp_qstream_")
    src = os.path.join(d, "src")
    spark.createDataFrame(
        [(1, 5, "a"), (2, -1, "b"), (3, 2, None), (4, 7, "d")],
        "id long, v long, name string",
    ).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    kept = ManagedTable(spark, os.path.join(d, "kept"))
    quarantine = ManagedTable(spark, os.path.join(d, "quarantine"))
    return d, stream, kept, quarantine


def test_stream_routes_and_replays_are_noops(spark):
    d, stream, kept, quarantine = _setup(spark)
    n = expectations_stream(
        stream, RULES, kept, quarantine, os.path.join(d, "ckpt"),
        stream_id="t1",
    )
    assert n >= 1
    assert {r.id for r in kept.read().collect()} == {1, 4}
    q = {r.id: sorted(r.failed_rules) for r in quarantine.read().collect()}
    assert q == {2: ["v_pos"], 3: ["name_ok"]}
    kept_v, quar_v = kept.latest_version(), quarantine.latest_version()

    # same checkpoint, no new data: the drained stream appends nothing
    stream2 = spark.readStream.schema(
        spark.read.parquet(os.path.join(d, "src")).schema
    ).parquet(os.path.join(d, "src"))
    expectations_stream(
        stream2, RULES, kept, quarantine, os.path.join(d, "ckpt"),
        stream_id="t1",
    )
    assert kept.read().count() == 2
    assert quarantine.read().count() == 2

    # a REPLAYED batch id (fresh checkpoint, same stream_id) is a
    # no-op append on both destinations: the txn watermark lives in
    # the tables' own logs
    stream3 = spark.readStream.schema(
        spark.read.parquet(os.path.join(d, "src")).schema
    ).parquet(os.path.join(d, "src"))
    expectations_stream(
        stream3, RULES, kept, quarantine, os.path.join(d, "ckpt2"),
        stream_id="t1",
    )
    assert kept.read().count() == 2
    assert quarantine.read().count() == 2
    assert kept.latest_version() == kept_v
    assert quarantine.latest_version() == quar_v


def test_precreated_destinations_do_not_fail_the_sink(spark):
    # simulates a batch replayed after a crash BETWEEN create and
    # append: the destination already exists and the sink must treat
    # creation as idempotent (mode="ignore"), not raise
    d, stream, kept, quarantine = _setup(spark)
    from pyspark.sql import functions as F

    empty = spark.createDataFrame([], "id long, v long, name string")
    kept.create(empty)
    quarantine.create(
        empty.withColumn(
            "failed_rules", F.array().cast("array<string>")
        )
    )
    expectations_stream(
        stream, RULES, kept, quarantine, os.path.join(d, "ckpt"),
        stream_id="t2",
    )
    assert kept.read().count() == 2
    assert quarantine.read().count() == 2
