"""REORG TABLE ... APPLY (PURGE): rewrite only DV-carrying files,
materialize their deletes, clear the deletion-vector pointer. The
work list comes from the DV sidecar itself (no table scan), kept
files are untouched bytes, and old versions still read their DVs."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.sql import PlatformSQL


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="reorg_table_")
    t = ManagedTable(spark, f"{d}/t")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 2).alias("val")
    )
    # Range layout: a low-id delete touches exactly one file.
    t.create(df.repartitionByRange(4, "id"))
    return t


def test_purge_rewrites_only_dv_files(table):
    files_v0 = table._all_data_files(0)
    table.delete("id < 250", rewrite=False)  # MOR: DV on one file
    assert table._state(1)["dv"] is not None
    mtimes = {f: os.path.getmtime(f) for f in files_v0}

    v = table.reorg_purge()
    assert v == 2
    st = table._state(v)
    assert st["dv"] is None  # pointer explicitly cleared
    got = sorted(r["id"] for r in table.read().collect())
    assert got == list(range(250, 1000))

    h = table.history(1)[0]
    assert h["operation"] == "REORG PURGE"
    m = h["operationMetrics"]
    assert m["numRewrittenFiles"] == 1
    assert m["numKeptFiles"] == 3
    assert m["numPurgedRows"] == 250
    assert m["numOutputRows"] == 750  # row accounting unchanged

    # Kept files are the same bytes; only the DV-bearing file is gone.
    live = {os.path.abspath(f) for f in table._all_data_files(v)}
    kept = live & {os.path.abspath(f) for f in files_v0}
    assert len(kept) == 3
    for f in kept:
        assert os.path.getmtime(f) == mtimes[f]

    # Time travel: pre-purge version still applies its DV; v0 is full.
    assert table.read(1).count() == 750
    assert table.read(0).count() == 1000


def test_purge_without_dv_is_none(table):
    assert table.reorg_purge() is None
    assert table.latest_version() == 0


def test_purge_clears_dangling_only_dv(table):
    table.delete("id < 10", rewrite=False)  # DV on file 1
    # COW update rewrites that same file; the DV pointer is carried
    # forward but every row in it now dangles.
    table.update({"val": "val + 1"}, "id < 250", rewrite=True)
    assert table._state(2)["dv"] is not None

    before = {r["id"]: r["val"] for r in table.read().collect()}
    v = table.reorg_purge()
    assert v == 3
    assert table._state(v)["dv"] is None
    assert table.history(1)[0]["operationMetrics"]["numRewrittenFiles"] == 0
    # Zero data movement: the live file set is unchanged.
    assert table._all_data_files(v) == table._all_data_files(2)
    assert {r["id"]: r["val"] for r in table.read().collect()} == before


def test_purge_idempotent_second_call_noop(table):
    table.delete("id >= 750", rewrite=False)
    assert table.reorg_purge() == 2
    assert table.reorg_purge() is None  # nothing left to purge
    assert table.read().count() == 750


def test_sql_reorg_purge(spark, table):
    table.delete("id < 250", rewrite=False)
    sess = PlatformSQL(spark)
    sess.register("t", table)
    row = sess.sql("REORG TABLE t APPLY (PURGE)").first()
    assert row["purged"] is True
    assert row["numPurgedRows"] == 250
    assert table._state(table.latest_version())["dv"] is None
    assert table.read().count() == 750
    # Second purge: nothing to do.
    row2 = sess.sql("REORG TABLE t APPLY (PURGE)").first()
    assert row2["purged"] is False


def test_change_feed_across_purge_is_empty(table):
    """REORG PURGE changes layout, not content: the change feed across
    the purge commit must net to zero rows (rewritten rows cancel)."""
    table.delete("id < 250", rewrite=False)   # v1
    v = table.reorg_purge()                    # v2
    feed = table.change_feed(1, v)
    assert feed.count() == 0


def test_mv_refresh_across_purge_stays_exact(spark):
    """A refresh whose span includes a REORG PURGE commit must still
    land exactly on the full recompute (the purge's rewritten rows
    cancel in the feed; the delete still dirties its groups)."""
    from delta_lake_platform_spark.sources.materialized_view import (
        MaterializedAggView,
    )

    b = tempfile.mkdtemp(prefix="reorg_mvbase_")
    base = ManagedTable(spark, f"{b}/t")
    base.create(
        spark.range(0, 1000)
        .select(
            F.col("id"),
            (F.col("id") % 5).alias("bucket"),
            (F.col("id") * 2).alias("val"),
        )
        .repartitionByRange(4, "id")
    )
    view = MaterializedAggView(
        base, f"{b}/mv", group_cols=["bucket"], sum_cols=["val"],
        minmax_cols=["val"],
    )
    view.create()
    base.delete("id < 100", rewrite=False)  # dirties min-holding groups
    base.reorg_purge()
    view.refresh()
    got = view.read().drop("avg_val")
    want = view._aggregate(base.read())
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_purge_on_partitioned_table(spark):
    d = tempfile.mkdtemp(prefix="reorg_part_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(0, 300).select(
            F.col("id"),
            (F.col("id") % 3).cast("string").alias("part"),
            (F.col("id") * 2).alias("val"),
        ),
        partition_by=["part"],
    )
    t.delete("part = '1' AND id < 100", rewrite=False)
    before = {(r["id"], r["part"], r["val"]) for r in t.read().collect()}
    v = t.reorg_purge()
    assert v is not None and t._state(v)["dv"] is None
    after = {(r["id"], r["part"], r["val"]) for r in t.read().collect()}
    assert after == before
    # Partition columns still prune after the purge.
    assert t.read().filter("part = '2'").count() == 100
