"""ChangeFeedStream: durable-offset log tailing (Delta readChangeFeed
streaming analogue) — resume, bounded batches, idempotent effect."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.streaming.cdf import ChangeFeedStream


@pytest.fixture
def tdir():
    d = tempfile.mkdtemp(prefix="cdf_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk_table(spark, tdir):
    t = ManagedTable(spark, f"{tdir}/t")
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    return t


def test_initial_load_then_incremental(spark, tdir):
    t = _mk_table(spark, tdir)
    stream = ChangeFeedStream(t, f"{tdir}/ckpt", key_cols=["id"])
    seen = []
    stream.process_available(
        lambda df, fv, tv: seen.append((fv, tv, {(r.id, r._change_type) for r in df.collect()}))
    )
    assert seen[0][0] == -1  # initial snapshot batch
    assert seen[0][2] == {(1, "insert"), (2, "insert")}

    t.overwrite(spark.createDataFrame([(1, "a2"), (3, "c")], "id long, v string"))
    n = stream.process_available(
        lambda df, fv, tv: seen.append((fv, tv, {(r.id, r._change_type) for r in df.collect()}))
    )
    assert n == 1
    assert seen[1][2] == {
        (1, "update_preimage"),
        (1, "update_postimage"),
        (2, "delete"),
        (3, "insert"),
    }
    # caught up: no batch delivered, offset stable
    assert stream.process_available(lambda *a: pytest.fail("no new data")) == 0


def test_resume_from_checkpoint_after_restart(spark, tdir):
    t = _mk_table(spark, tdir)
    s1 = ChangeFeedStream(t, f"{tdir}/ckpt", key_cols=["id"])
    s1.process_available(lambda df, fv, tv: df.count())
    t.append(spark.createDataFrame([(9, "z")], "id long, v string"))
    # new object, same checkpoint dir == process restart
    s2 = ChangeFeedStream(t, f"{tdir}/ckpt", key_cols=["id"])
    batches = []
    s2.process_available(lambda df, fv, tv: batches.append(df.collect()))
    assert len(batches) == 1
    assert {(r.id, r._change_type) for r in batches[0]} == {(9, "insert")}


def test_bounded_batches_catch_up(spark, tdir):
    t = _mk_table(spark, tdir)
    for i in range(4):
        t.append(spark.createDataFrame([(10 + i, "x")], "id long, v string"))
    stream = ChangeFeedStream(
        t, f"{tdir}/ckpt", key_cols=["id"], max_versions_per_batch=2
    )
    spans = []
    stream.process_available(lambda df, fv, tv: spans.append((fv, tv)))
    # initial snapshot batch at v0, then 2-version steps to the head
    assert spans[0] == (-1, 0)
    assert spans[1:] == [(0, 2), (2, 4)]
    assert stream.offset() == t.latest_version()


def test_failed_sink_does_not_advance_offset(spark, tdir):
    t = _mk_table(spark, tdir)
    stream = ChangeFeedStream(t, f"{tdir}/ckpt", key_cols=["id"])

    def boom(df, fv, tv):
        raise RuntimeError("sink crashed")

    with pytest.raises(RuntimeError):
        stream.process_available(boom)
    assert stream.offset() is None  # replays the same batch next run
    got = []
    stream.process_available(lambda df, fv, tv: got.append(df.count()))
    assert got == [2]


def test_cdc_replicate_follows_upstream_dml(spark):
    import tempfile

    from delta_lake_platform_spark.streaming.cdf import cdc_replicate

    d = tempfile.mkdtemp(prefix="cdc_rep_")
    up = ManagedTable(spark, f"{d}/up")
    rep = ManagedTable(spark, f"{d}/rep")
    up.create(
        spark.range(0, 50).select(
            "id", (F.col("id") * 10).alias("v")
        )
    )
    assert cdc_replicate(up, rep, f"{d}/ckpt", ["id"]) == 1
    assert sorted(map(tuple, rep.read().collect())) == sorted(
        map(tuple, up.read().collect())
    )

    # Upstream DML across several commits -> one net-effect batch.
    up.update({"v": "v + 1"}, "id < 10")
    up.delete("id >= 45")
    up.append(spark.range(100, 105).select("id", (F.col("id") * 10).alias("v")))
    assert cdc_replicate(up, rep, f"{d}/ckpt", ["id"]) >= 1
    assert sorted(map(tuple, rep.read().collect())) == sorted(
        map(tuple, up.read().collect())
    )
    # The replica followed via MoR commits, not rewrites.
    assert rep.history(1)[0]["operation"].startswith(("MERGE", "DELETE"))

    # Replay from a fresh checkpoint: idempotent (exactly-once effect).
    assert cdc_replicate(up, rep, f"{d}/ckpt2", ["id"]) == 1
    assert sorted(map(tuple, rep.read().collect())) == sorted(
        map(tuple, up.read().collect())
    )


def test_cdc_replicate_bounded_catchup(spark):
    import tempfile

    from delta_lake_platform_spark.streaming.cdf import cdc_replicate

    d = tempfile.mkdtemp(prefix="cdc_rep2_")
    up = ManagedTable(spark, f"{d}/up")
    rep = ManagedTable(spark, f"{d}/rep")
    up.create(spark.range(0, 10).select("id", F.lit(0).alias("v")))
    for i in range(1, 5):
        up.update({"v": str(i)}, f"id % {i + 1} = 0")
    # 1 initial batch + ceil(4/2) catch-up batches.
    n = cdc_replicate(up, rep, f"{d}/ckpt", ["id"], max_versions_per_batch=2)
    assert n == 3
    assert sorted(map(tuple, rep.read().collect())) == sorted(
        map(tuple, up.read().collect())
    )
