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


def test_batch_writer_create_append_overwrite(table, spark):
    d = tempfile.mkdtemp(prefix="ds_write_")
    path = f"{d}/w"
    df = spark.range(0, 100).select("id", (F.col("id") % 3).alias("k"))

    # Create (first write), then append, then overwrite.
    df.write.format("managed_table").option("path", path).mode("overwrite").save()
    t = ManagedTable(spark, path)
    assert t.read().count() == 100
    assert t.history(1)[0]["operation"] == "CREATE OR OVERWRITE"

    spark.range(100, 120).select("id", (F.col("id") % 3).alias("k")) \
        .write.format("managed_table").option("path", path).mode("append").save()
    assert t.read().count() == 120
    h = t.history(1)[0]
    assert h["operation"] == "APPEND"
    assert h["operationMetrics"]["numAppendedRows"] == 20
    # Incremental: the append referenced the prior dir.
    assert len(t._data_dirs(t.latest_version())) == 2

    spark.range(0, 7).select("id", (F.col("id") % 3).alias("k")) \
        .write.format("managed_table").option("path", path).mode("overwrite").save()
    assert t.read().count() == 7
    # Time travel across writer commits.
    assert t.read(0).count() == 100
    assert t.read(1).count() == 120


def test_batch_writer_roundtrips_through_reader(table, spark):
    d = tempfile.mkdtemp(prefix="ds_write2_")
    path = f"{d}/w"
    src = table.read()
    src.write.format("managed_table").option("path", path).mode("overwrite").save()
    back = spark.read.format("managed_table").option("path", path).load()
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_batch_writer_append_preserves_deletion_vector(table, spark):
    d = tempfile.mkdtemp(prefix="ds_write3_")
    path = f"{d}/w"
    table.read().write.format("managed_table").option("path", path).mode("overwrite").save()
    t = ManagedTable(spark, path)
    t.delete("k = 1", rewrite=False)
    # Exact-typed batch: the sink-created table now records its schema
    # in the log, so the commit-time check (correctly) refuses a batch
    # whose int-typed literals drift from the table's long columns.
    spark.range(5000, 5010).select(
        "id",
        F.lit(1).cast("bigint").alias("k"),
        F.lit(0).cast("bigint").alias("v"),
    ).write.format("managed_table").option("path", path).mode("append").save()
    got = t.read()
    # Old k=1 rows stay masked; the appended k=1 rows are visible.
    assert got.filter("k = 1").count() == 10
    assert got.count() == 170


def test_stream_tail_fails_explicitly_on_schema_change(table, spark):
    """Delta fails a stream when the source schema changes so the user
    restarts it — silently casting wide batches down to the
    stream-start schema would narrow values (r5 ADVICE #4)."""
    d = tempfile.mkdtemp(prefix="ds_schema_")

    def run(tag, ignore_changes=True):
        r = (
            spark.readStream.format("managed_table")
            .option("path", table.path)
            .option("ignoreChanges", "true" if ignore_changes else "false")
        )
        q = (
            r.load()
            .writeStream.format("parquet")
            .option("path", f"{d}/{tag}")
            .option("checkpointLocation", f"{d}/ckpt_{tag}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run("a")
    table.alter_add_column("extra", "double")
    table.append(
        spark.range(5000, 5003).select(
            "id",
            (F.col("id") % 5).alias("k"),
            (F.col("id") * 3).alias("v"),
            F.lit(1.5).alias("extra"),
        )
    )
    with pytest.raises(Exception, match="schema changed"):
        run("a")
    # A FRESH stream (new checkpoint) pins the new schema and works.
    run("b")
    assert spark.read.parquet(f"{d}/b").count() == table.read().count()


def test_sink_commit_conflicting_with_overwrite_raises(table, spark):
    """A streaming/batch sink append losing the race to a full
    OVERWRITE must abort, not land on the redefined table (r5 ADVICE
    #2). Simulated by interleaving the overwrite at the sink's first
    entry-create."""
    from delta_lake_platform_spark.sources.datasource import _BatchWriter
    from delta_lake_platform_spark.sources.managed_table import (
        ConcurrentWriteError,
    )

    path = table.path
    writer = _BatchWriter({"path": path}, table.read().schema, overwrite=False)
    assert writer.read_version == table.latest_version()
    # Stage one real file via the writer's own write path.
    rows = [tuple(r) for r in table.read().limit(3).collect()]
    msg = writer.write(iter(rows))
    assert msg.n_rows == 3

    # The overwrite lands AFTER the writer's plan-time snapshot read
    # but BEFORE its commit — the window the read_version anchor exists
    # for (the sink's entry create does not even clash).
    ManagedTable(spark, path).overwrite(
        spark.range(7).select(
            "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
        )
    )
    with pytest.raises(ConcurrentWriteError):
        writer.commit([msg])
    # The overwrite's snapshot stands untouched.
    assert ManagedTable(spark, path).read().count() == 7


def test_sink_commit_racing_blind_append_commits(table, spark):
    """Symmetric positive case: losing the race to another APPEND is
    fine — the sink re-aims at the next version."""
    from delta_lake_platform_spark.sources.datasource import _BatchWriter

    path = table.path
    n0 = table.read().count()
    writer = _BatchWriter({"path": path}, table.read().schema, overwrite=False)
    rows = [(9000 + i, 0, 1) for i in range(4)]
    msg = writer.write(iter(rows))

    orig = ManagedTable._write_entry
    state = {"fired": False}

    def interleave(self, version, entry):
        if not state["fired"] and entry.get("operation") == "APPEND" and "addPaths" in entry:
            state["fired"] = True
            ManagedTable(spark, path).append(
                spark.range(8000, 8002).select(
                    "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
                )
            )
        return orig(self, version, entry)

    from unittest import mock

    with mock.patch.object(ManagedTable, "_write_entry", interleave):
        writer.commit([msg])
    t = ManagedTable(spark, path)
    assert t.read().count() == n0 + 2 + 4
    assert t.read().filter("id >= 9000").count() == 4


def test_stream_max_files_per_trigger_chunks_the_backfill(table, spark):
    """Delta's maxFilesPerTrigger: the initial snapshot AND the tail
    are admitted at most N files per micro-batch — the backfill over a
    huge table arrives as incrementally-checkpointed chunks instead of
    one giant batch. Every row still arrives exactly once."""
    d = tempfile.mkdtemp(prefix="ds_mft_")
    # Snapshot = 3 files (fixture repartition(3)); two appends add one
    # file each -> 5 files total.
    table.append(spark.range(1000, 1020).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ).coalesce(1), fast=True)
    table.append(spark.range(2000, 2005).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ).coalesce(1), fast=True)

    import time as _time

    # Keyed by epoch: q.stop() below can land after the sink ran but
    # before the epoch's commit is recorded, and the restart then
    # replays that SAME epoch id — foreachBatch's documented
    # at-least-once contract, which a list-append sink double-counts.
    # An idempotent sink still catches real offset bugs: re-served
    # data arrives under NEW epoch ids and inflates the sum.
    by_epoch: dict[int, int] = {}

    def sink(df, epoch_id):
        by_epoch[epoch_id] = df.count()

    def batches():
        return list(by_epoch.values())

    def run_until(total, timeout=120):
        # Python DataSource streams fall back to single-batch execution
        # under Trigger.AvailableNow, so a capped stream needs a
        # continuous trigger: run until all expected rows arrived.
        # streamId persists the planner position, so the cap governs
        # from the FIRST batch and across restarts (without it the
        # Python API's latestOffset cannot know the start position and
        # the first trigger is an uncapped catch-up).
        q = (
            spark.readStream.format("managed_table")
            .option("path", table.path)
            .option("maxFilesPerTrigger", "2")
            .option("streamId", "mft_test")
            # The engine asks latestOffset before initialOffset ever
            # runs; assumeFresh lets the FIRST backfill batch be capped
            # too (we promise no prior checkpoint exists). The sidecar
            # then carries the position across the restart below.
            .option("assumeFresh", "true")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = _time.time() + timeout
            while sum(batches()) < total and _time.time() < deadline:
                _time.sleep(0.5)
        finally:
            q.stop()

    run_until(225)
    assert sum(batches()) == 225  # 200 snapshot + 20 + 5, exactly once
    nonempty = [b for b in batches() if b]
    assert len(nonempty) >= 3, (
        f"2-file admission over 5 files needs >=3 batches, got {by_epoch}"
    )
    # No batch may exceed 2 files' worth of rows (the snapshot's 200
    # rows span 3 files, so any two files hold < 200).
    assert all(b < 200 for b in nonempty), by_epoch

    # The tail keeps exactly-once across a checkpoint restart: two more
    # single-file appends resume from the stored (version, idx) offset.
    start_total = sum(batches())
    table.append(spark.range(3000, 3003).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ).coalesce(1), fast=True)
    table.append(spark.range(4000, 4002).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ).coalesce(1), fast=True)
    run_until(start_total + 5)
    assert sum(batches()) == start_total + 5  # 3 + 2, nothing replayed


def test_stream_uncapped_behavior_unchanged(table, spark):
    """Without maxFilesPerTrigger the tail serves whole-version units
    exactly as before (one snapshot batch, then one batch per append)."""
    d = tempfile.mkdtemp(prefix="ds_nocap_")
    batches: list[int] = []

    def sink(df, epoch_id):
        batches.append(df.count())

    def run():
        q = (
            spark.readStream.format("managed_table")
            .option("path", table.path)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert sum(batches) == 200
    table.append(spark.range(1000, 1010).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ))
    run()
    assert sum(batches) == 210


def test_stream_starting_version_latest_skips_snapshot(table, spark):
    """startingVersion=latest: a CDC-style consumer gets only commits
    made AFTER the stream started — the existing snapshot never flows."""
    d = tempfile.mkdtemp(prefix="ds_sv_")
    batches: list[int] = []

    def run():
        q = (
            spark.readStream.format("managed_table")
            .option("path", table.path)
            .option("startingVersion", "latest")
            .load()
            .writeStream.foreachBatch(lambda df, e: batches.append(df.count()))
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run()
    assert sum(batches) == 0  # snapshot skipped
    table.append(spark.range(1000, 1010).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ))
    run()
    assert sum(batches) == 10  # only the post-start append


def test_stream_starting_version_integer(table, spark):
    """startingVersion=N serves the appends of versions >= N — resuming
    a pipeline at a known log position without replaying the snapshot."""
    table.append(spark.range(1000, 1010).select(  # v1
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ))
    table.append(spark.range(2000, 2005).select(  # v2
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ))
    d = tempfile.mkdtemp(prefix="ds_svi_")
    batches: list[int] = []
    q = (
        spark.readStream.format("managed_table")
        .option("path", table.path)
        .option("startingVersion", "2")
        .load()
        .writeStream.foreachBatch(lambda df, e: batches.append(df.count()))
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert sum(batches) == 5  # v2's append only — not v1, not the snapshot


@pytest.mark.parametrize("cap", [1, 2, 3, 7])
def test_capped_offset_walk_partitions_the_uncapped_set(table, spark, cap):
    """Reader-level invariant behind exactly-once under rate limiting:
    for ANY cap, walking latestOffset() and collecting partitions()
    between consecutive offsets yields exactly the uncapped file set —
    same files, no duplicates, no gaps, every chunk within the cap."""
    from delta_lake_platform_spark.sources.datasource import _TailReader

    table.append(spark.range(1000, 1020).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(2), fast=True)
    table.delete("k = 4", rewrite=False)  # non-append: needs ignoreChanges
    table.append(spark.range(2000, 2005).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ).coalesce(1), fast=True)

    def walk(opts):
        r = _TailReader({"path": table.path, **opts})
        prev = r.initialOffset()
        served = []
        for _ in range(100):
            cur = r.latestOffset()
            if cur == prev:
                break
            served.append([p.file_path for p in r.partitions(prev, cur)])
            prev = cur
        else:
            raise AssertionError("offset walk did not converge")
        return served

    uncapped = [f for chunk in walk({"ignorechanges": "true"}) for f in chunk]
    chunks = walk({
        "ignorechanges": "true", "maxfilespertrigger": str(cap)
    })
    capped = [f for chunk in chunks for f in chunk]
    assert sorted(capped) == sorted(uncapped)
    assert len(capped) == len(set(capped)), "a file was served twice"
    assert all(len(c) <= cap for c in chunks), chunks


def test_batch_read_partitioned_table(spark):
    """Hive-partitioned tables through the native format: partition
    columns come from the `k=v` path segments, typed against the log
    schema — including after a MOR delete and a fast append."""
    datasource.register(spark)
    d = tempfile.mkdtemp(prefix="ds_part_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(0, 120).select(
            "id",
            (F.col("id") % 4).alias("bucket"),
            F.concat(F.lit("s"), (F.col("id") % 3)).alias("tag"),
        ),
        partition_by=["bucket", "tag"],
    )
    got = _load(spark, t)
    assert sorted(map(tuple, got.select("id", "bucket", "tag").collect())) \
        == sorted(map(tuple, t.read().select("id", "bucket", "tag").collect()))
    assert dict(got.dtypes)["bucket"] == "bigint"  # typed, not string

    t.delete("id % 10 = 0", rewrite=False)
    t.append(
        spark.range(1000, 1006).select(
            "id",
            (F.col("id") % 4).alias("bucket"),
            F.concat(F.lit("s"), (F.col("id") % 3)).alias("tag"),
        ),
        fast=True,
    )
    got = _load(spark, t)
    assert sorted(map(tuple, got.select("id", "bucket", "tag").collect())) \
        == sorted(map(tuple, t.read().select("id", "bucket", "tag").collect()))


def test_stream_tail_partitioned_table(spark):
    """The streaming tail serves partitioned appends with their
    partition columns reconstructed."""
    datasource.register(spark)
    d = tempfile.mkdtemp(prefix="ds_part_stream_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(0, 40).select(
            "id", (F.col("id") % 2).alias("bucket")
        ),
        partition_by=["bucket"],
    )

    def run():
        q = (
            spark.readStream.format("managed_table")
            .option("path", t.path)
            .load()
            .writeStream.format("parquet")
            .option("path", f"{d}/out")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run()
    out = spark.read.parquet(f"{d}/out")
    assert out.count() == 40
    assert out.filter("bucket = 1").count() == 20
    t.append(
        spark.range(100, 110).select("id", (F.col("id") % 2).alias("bucket"))
    )
    run()
    out = spark.read.parquet(f"{d}/out")
    assert out.count() == 50
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, t.read().select(*out.columns).collect())
    )


def test_capped_restart_without_sidecar_never_replays(table, spark):
    """Reader-level pin of the exactly-once rule behind streamId: a
    fresh stream's initialOffset seeds the sidecar, so a LOST sidecar
    can only mean a restart with an unknown checkpoint position —
    latestOffset must fall back to an uncapped catch-up (a legacy
    head offset), never re-pin the snapshot (which would make
    partitions() replay everything the checkpoint already served)."""
    from delta_lake_platform_spark.sources.datasource import _TailReader

    opts = {
        "path": table.path,
        "maxfilespertrigger": "2",
        "streamid": "restart_test",
    }
    # Fresh stream: initialOffset (possibly on another process's
    # instance) seeds the sidecar; a DIFFERENT instance's latestOffset
    # picks it up and caps from the very first batch.
    a = _TailReader(opts)
    a.initialOffset()
    b = _TailReader(opts)
    off = b.latestOffset()
    assert "idx" in off and off["snap"] == table.latest_version()

    # Sidecar lost (or capping enabled on a pre-existing stream): a
    # fresh instance must NOT assume "fresh stream".
    import os as _os

    _os.remove(
        _os.path.join(table.path, "_streams", "restart_test.json")
    )
    c = _TailReader(opts)
    off = c.latestOffset()
    assert off == {"version": table.latest_version()}, (
        "lost sidecar must degrade to an uncapped catch-up, not a "
        "snapshot re-pin"
    )


def test_partition_values_ignore_internal_kv_dirs(spark):
    """data/v=0/... is an internal layout dir, not a hive partition:
    only DECLARED partition columns may come from path segments (a
    data column named `v` must never receive the version number)."""
    from delta_lake_platform_spark.sources.datasource import (
        _partition_values_of,
    )

    d = tempfile.mkdtemp(prefix="ds_kv_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(0, 10).select(
            "id", (F.col("id") % 2).alias("bucket")
        ),
        partition_by=["bucket"],
    )
    f = t._all_data_files(0)[0]
    assert "data/v=0" in f.replace("\\", "/")
    vals = _partition_values_of(t, f)
    assert set(vals) == {"bucket"}, vals


def test_sink_partitioned_append_and_overwrite(spark):
    """Hive-partitioned tables through the SINK: executors split their
    rows by partition value and write k=v dirs (partition columns live
    in the path, not the files); appended files carry the exact
    partition stats so pruning works; overwrite records the schema so
    the DataSource can read the new snapshot back."""
    import glob as g

    import pyarrow.parquet as pq

    datasource.register(spark)
    d = tempfile.mkdtemp(prefix="ds_part_sink_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(0, 40).select(
            "id", (F.col("id") % 3).alias("bucket")
        ),
        partition_by=["bucket"],
    )
    spark.range(100, 106).select(
        "id", (F.col("id") % 3).alias("bucket")
    ).write.format("managed_table").option("path", t.path).mode(
        "append"
    ).save()
    assert t.read().count() == 46
    got = _load(spark, t)
    assert (
        got.filter("bucket = 1").count()
        == t.read().filter("bucket = 1").count()
    )
    # The batch files live under k=v dirs and EXCLUDE the column.
    batch_files = [
        f
        for f in g.glob(f"{t.path}/data/v=1/**/*.parquet", recursive=True)
        if "bucket=" in f
    ]
    assert batch_files
    assert "bucket" not in pq.read_schema(batch_files[-1]).names
    # Exact partition stats -> pruning selects only bucket=2 files.
    kept, total = t.prune_files("bucket", 2, 2)
    assert kept and len(kept) < total

    spark.range(0, 9).select(
        "id", (F.col("id") % 3).alias("bucket")
    ).write.format("managed_table").option("path", t.path).mode(
        "overwrite"
    ).save()
    assert t.read().count() == 9
    assert _load(spark, t).count() == 9  # schema in log: DS reads it
    assert dict(_load(spark, t).dtypes)["bucket"] == "bigint"


def test_sink_partitioned_rejects_unescapable_values(spark):
    datasource.register(spark)
    d = tempfile.mkdtemp(prefix="ds_part_bad_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.createDataFrame([(1, "ok")], "id bigint, tag string"),
        partition_by=["tag"],
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="hive path escaping"):
        try:
            spark.createDataFrame(
                [(2, "has space")], "id bigint, tag string"
            ).write.format("managed_table").option("path", t.path).mode(
                "append"
            ).save()
        except Exception as e:  # py4j wraps the executor error
            raise RuntimeError(str(e)) from e


def test_stream_starting_timestamp(table, spark):
    """startingTimestamp: the stream begins at the earliest commit AT
    or AFTER the timestamp — here, between v0 and v1, so the snapshot
    never flows and both appends do."""
    import datetime

    table.append(spark.range(1000, 1010).select(  # v1
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ))
    table.append(spark.range(2000, 2005).select(  # v2
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ))
    ts = {e["version"]: e["timestamp"] for e in table.history()}
    mid01 = datetime.datetime.utcfromtimestamp(
        (ts[0] + ts[1]) / 2
    ).isoformat()
    d = tempfile.mkdtemp(prefix="ds_sts_")
    batches: list[int] = []
    q = (
        spark.readStream.format("managed_table")
        .option("path", table.path)
        .option("startingTimestamp", mid01)
        .load()
        .writeStream.foreachBatch(lambda df, e: batches.append(df.count()))
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert sum(batches) == 15  # v1 + v2 appends; snapshot skipped


def test_stream_starting_timestamp_validation(table, spark):
    import datetime

    from delta_lake_platform_spark.sources.datasource import _TailReader

    future = (
        datetime.datetime.now() + datetime.timedelta(days=1)
    ).isoformat()
    r = _TailReader({"path": table.path, "startingtimestamp": future})
    with pytest.raises(ValueError, match="after the table's latest"):
        r._initial_off()
    with pytest.raises(ValueError, match="not both"):
        _TailReader(
            {
                "path": table.path,
                "startingtimestamp": future,
                "startingversion": "1",
            }
        )
    # A timestamp before the first commit = snapshot-start semantics.
    past = datetime.datetime.utcfromtimestamp(0).isoformat()
    r2 = _TailReader({"path": table.path, "startingtimestamp": past})
    assert r2._initial_off() == {"version": -1}


@pytest.mark.parametrize("byte_cap", [1, 2000, 10**9])
def test_byte_capped_offset_walk_partitions_the_uncapped_set(
    table, spark, byte_cap
):
    """maxBytesPerTrigger: same exactly-once partition invariant as the
    file cap — the walk serves the uncapped set with no dupes/gaps —
    plus Delta's soft-max admission rule: a file is admitted whenever
    bytes-so-far are under the budget, so a chunk may exceed the cap by
    exactly its last (crossing) file, never more."""
    import os as _os

    from delta_lake_platform_spark.sources.datasource import _TailReader

    table.append(spark.range(1000, 1020).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(2), fast=True)
    table.append(spark.range(2000, 2005).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("v")
    ).coalesce(1), fast=True)

    def walk(opts):
        r = _TailReader({"path": table.path, **opts})
        prev = r.initialOffset()
        served = []
        for _ in range(200):
            cur = r.latestOffset()
            if cur == prev:
                break
            served.append([p.file_path for p in r.partitions(prev, cur)])
            prev = cur
        else:
            raise AssertionError("offset walk did not converge")
        return served

    uncapped = [f for chunk in walk({}) for f in chunk]
    chunks = walk({"maxbytespertrigger": str(byte_cap)})
    capped = [f for chunk in chunks for f in chunk]
    assert sorted(capped) == sorted(uncapped)
    assert len(capped) == len(set(capped)), "a file was served twice"
    for c in chunks:
        # Everything BEFORE the crossing file was under budget; the
        # crossing file itself is included (Delta's admission rule).
        assert sum(_os.path.getsize(f) for f in c[:-1]) < byte_cap, chunks


def test_byte_cap_includes_the_crossing_file(table, spark):
    """The file that crosses the remaining byte budget lands in the
    CURRENT batch (Delta admits while bytes-so-far < cap); deferring it
    to the next trigger would systematically undershoot the budget."""
    import os as _os

    from delta_lake_platform_spark.sources.datasource import _TailReader

    # Serve order comes from an uncapped walk, not directory order.
    r0 = _TailReader({"path": table.path})
    files = [
        p.file_path
        for p in r0.partitions(r0.initialOffset(), r0.latestOffset())
    ]
    assert len(files) >= 2
    sizes = [_os.path.getsize(f) for f in files]
    # Budget: strictly more than the first file, less than first+second
    # — under the admission rule both land in batch one.
    cap = sizes[0] + 1
    assert cap < sizes[0] + sizes[1]
    r = _TailReader({"path": table.path, "maxbytespertrigger": str(cap)})
    prev = r.initialOffset()
    cur = r.latestOffset()
    parts = r.partitions(prev, cur)
    assert len(parts) == 2, "crossing file was deferred to the next trigger"
    got = sum(_os.path.getsize(p.file_path) for p in parts)
    assert got > cap  # the batch crossed the cap by its last file


def test_byte_and_file_caps_compose(table, spark):
    """Both caps set: whichever budget exhausts first ends the batch."""
    from delta_lake_platform_spark.sources.datasource import _TailReader

    r = _TailReader(
        {
            "path": table.path,
            "maxfilespertrigger": "2",
            "maxbytespertrigger": str(10**9),
        }
    )
    prev = r.initialOffset()
    cur = r.latestOffset()
    parts = r.partitions(prev, cur)
    assert len(parts) <= 2  # the file budget binds


def test_batch_read_timestamp_as_of(table, spark):
    import datetime

    table.delete("k = 1")  # v1
    ts = {e["version"]: e["timestamp"] for e in table.history()}
    mid = datetime.datetime.utcfromtimestamp(
        (ts[0] + ts[1]) / 2
    ).isoformat()
    got = _load(spark, table, timestampAsOf=mid)
    assert got.count() == 200  # pre-delete snapshot
    future = (
        datetime.datetime.now() + datetime.timedelta(days=1)
    ).isoformat()
    assert _load(spark, table, timestampAsOf=future).count() == table.read().count()
    past = datetime.datetime.utcfromtimestamp(0).isoformat()
    with pytest.raises(Exception, match="precedes"):
        _load(spark, table, timestampAsOf=past).count()
    with pytest.raises(Exception, match="not both"):
        _load(spark, table, timestampAsOf=future, version="0").count()
