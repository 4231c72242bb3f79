"""Metadata-only RESTORE (Delta semantics: RESTORE writes add/remove
actions, never data — restoring a 100 TB table is one log write).

Pinned here:
- RESTORE writes ZERO new data files; the new entry re-references the
  target version's files (numRewrittenFiles == 0 in the metrics).
- A restore target whose files were reclaimed by VACUUM raises an
  explicit error (the bytes are gone — Delta fails the same way).
- The deletion-vector pointer restores with the state: restoring to a
  MOR-delete version brings back exactly its post-delete row set.
- Column mapping restores with the state: restoring to a pre-rename
  version brings back the old logical name.
- CDF across a restore reports the net row changes.
- VACUUM protects the restored files even when their ORIGIN version is
  past the retention horizon (live-file rule, covered again here at
  the API level in addition to the SQL-level pin).
"""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable

# `spark` comes from conftest.py (session-scoped local[8]) — a
# module-local fixture would shift the singleton's parallelism and the
# file layouts every later test module sees.


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="restore_meta_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _data_files(path: str) -> set[str]:
    return {
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.sep + "_log" + os.sep not in f
    }


def test_restore_writes_no_data(spark, tdir):
    t = ManagedTable(spark, f"{tdir}/t")
    t.create(spark.range(100).selectExpr("id", "id % 7 as k"))       # v0
    t.overwrite(spark.range(10).selectExpr("id", "id % 7 as k"))      # v1
    before = _data_files(t.path)
    v = t.restore(0)                                                  # v2
    assert _data_files(t.path) == before, "RESTORE must not write data"
    assert t.read().count() == 100
    m = t.history(1)[0]["operationMetrics"]
    assert m["restoredVersion"] == 0
    assert m["numRewrittenFiles"] == 0
    assert m["numRestoredFiles"] >= 1
    # Metadata-only row accounting survives the restore.
    assert t.row_count() == 100
    # Forward-written: the pre-restore state is still time-travelable.
    assert t.read(version=v - 1).count() == 10


def test_restore_after_vacuum_raises(spark, tdir):
    t = ManagedTable(spark, f"{tdir}/t")
    t.create(spark.range(50).selectExpr("id"))                        # v0
    t.overwrite(spark.range(5).selectExpr("id"))                      # v1
    t.overwrite(spark.range(6).selectExpr("id"))                      # v2
    t.vacuum(keep_last=1, older_than_s=0.0)
    with pytest.raises(FileNotFoundError, match="VACUUM"):
        t.restore(0)
    # The failed restore must not have committed anything.
    assert t.latest_version() == 2
    assert t.read().count() == 6


def test_restore_brings_back_dv_state(spark, tdir):
    t = ManagedTable(spark, f"{tdir}/t")
    t.create(spark.range(100).selectExpr("id", "id % 5 as k"))        # v0
    t.delete("id < 20", rewrite=False)                                # v1 (DV)
    assert t.read().count() == 80
    t.overwrite(spark.range(3).selectExpr("id", "id % 5 as k"))       # v2
    before = _data_files(t.path)
    t.restore(1)                                                      # v3
    assert _data_files(t.path) == before
    assert t.read().count() == 80
    assert t.read().filter("id < 20").count() == 0


def test_restore_resets_column_mapping(spark, tdir):
    t = ManagedTable(spark, f"{tdir}/t")
    t.create(spark.range(10).selectExpr("id", "id * 2 as v"))         # v0
    t.alter_rename_column("v", "val")                                 # v1
    assert t.read().columns == ["id", "val"]
    t.restore(0)                                                      # v2
    assert t.read().columns == ["id", "v"]
    assert t.read().agg(F.sum("v")).first()[0] == 90
    # And restoring forward to the renamed version works too.
    t.restore(1)
    assert t.read().columns == ["id", "val"]


def test_change_feed_across_restore(spark, tdir):
    t = ManagedTable(spark, f"{tdir}/t")
    t.create(spark.range(10).selectExpr("id"))                        # v0
    t.delete("id >= 5", rewrite=True)                                 # v1
    t.restore(0)                                                      # v2
    feed = t.change_feed(1, 2)
    ins = feed.filter(F.col("_change_type") == "insert")
    assert ins.count() == 5
    assert {r.id for r in ins.collect()} == {5, 6, 7, 8, 9}


def test_vacuum_protects_restored_files(spark, tdir):
    t = ManagedTable(spark, f"{tdir}/t")
    t.create(spark.range(40).selectExpr("id"))                        # v0
    t.overwrite(spark.range(4).selectExpr("id"))                      # v1
    t.overwrite(spark.range(5).selectExpr("id"))                      # v2
    t.restore(0)                                                      # v3
    removed = t.vacuum(keep_last=2, older_than_s=0.0)
    # v0's files are the live head: only v1's snapshot is reclaimable.
    assert removed == [1]
    assert t.read().count() == 40
    assert t.read(version=2).count() == 5  # retained version intact


def test_restore_on_row_tracked_table_pretracking_target(spark, tdir):
    t = ManagedTable(spark, f"{tdir}/t")
    t.create(spark.range(30).selectExpr("id"))                        # v0
    t.append(spark.range(30, 40).selectExpr("id"), fast=True)         # v1
    t.enable_row_tracking()                                           # v2
    t.delete("id >= 35", rewrite=False)                               # v3
    ids_before = {
        r.id: r._row_id for r in t.read_row_ids().collect()
    }
    before = _data_files(t.path)
    t.restore(0)                                                      # v4: pre-tracking
    assert _data_files(t.path) == before, "span backfill is metadata-only"
    rows = t.read_row_ids().collect()
    assert len(rows) == 30
    ids = [r._row_id for r in rows]
    assert len(set(ids)) == 30, "restored pre-tracking rows get unique ids"
    # Fresh rows: every backfilled id sits ABOVE everything ever minted.
    assert min(ids) >= max(ids_before.values()) + 1
