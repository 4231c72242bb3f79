"""Merge-on-read DELETE via deletion vectors (ManagedTable.delete
rewrite=False): no data-file rewrite, sidecar applied on every read
path, cleared by the next full rewrite, safe under vacuum/clone."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="dv_table_")
    t = ManagedTable(spark, f"{d}/t")
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 10).alias("bucket"),
        (F.col("id") * 2).alias("val"),
    )
    t.create(df.repartition(4))
    return t


def _data_files(t: ManagedTable, version: int) -> list[str]:
    return sorted(glob.glob(os.path.join(t._data_dir(version), "*.parquet")))


def test_dv_delete_hides_rows_without_rewriting_files(table):
    files_before = _data_files(table, 0)
    mtimes = {f: os.path.getmtime(f) for f in files_before}

    v = table.delete("bucket = 3", rewrite=False)
    assert v == 1
    # Data files untouched — same paths, same mtimes (merge-on-read).
    assert _data_files(table, 1) == files_before
    assert {f: os.path.getmtime(f) for f in files_before} == mtimes

    got = table.read()
    assert got.count() == 900
    assert got.filter("bucket = 3").count() == 0
    # Unrelated rows intact, values included.
    assert got.filter("id = 4").select("val").first()[0] == 8

    h = table.history(1)[0]
    assert h["operation"] == "DELETE (DV)"
    assert h["operationMetrics"]["numDeletedRows"] == 100
    assert h["operationMetrics"]["numOutputRows"] == 900
    assert table.detail()["numDeletionVectorRows"] == 100


def test_dv_deletes_accumulate_and_time_travel_sees_each_state(table):
    table.delete("bucket = 3", rewrite=False)
    table.delete("id < 50", rewrite=False)  # overlaps bucket 3 rows

    assert table.read(0).count() == 1000
    assert table.read(1).count() == 900
    # 45 of id<50 not already deleted (5 of them are bucket 3).
    assert table.read(2).count() == 855
    m = table.history(1)[0]["operationMetrics"]
    assert m["numDeletedRows"] == 45
    assert m["numDeletionVectorRows"] == 145


def test_full_rewrite_materializes_survivors_and_clears_dv(table):
    table.delete("bucket = 3", rewrite=False)
    v = table.compact(target_partitions=2)
    assert "deletionVector" not in table._entry(v)
    assert table.read().count() == 900
    assert table.read().filter("bucket = 3").count() == 0
    # The rewrite owns fresh local files.
    assert table._data_dir(v) == table._local_data_dir(v)


def test_read_pruned_applies_dv(table):
    # Lay out files by bucket range so pruning actually skips files.
    table.overwrite(table.read().repartitionByRange(4, "bucket").sortWithinPartitions("bucket"))
    table.delete("id = 500", rewrite=False)
    b = (500 * 2) % 10 // 2  # noqa: F841  (bucket of id 500 is 0)
    pruned = table.read_pruned("bucket", lo=0, hi=0)
    assert pruned.filter("id = 500").count() == 0
    assert pruned.count() == 99


def test_vacuum_keeps_data_referenced_by_dv_commit(table):
    table.delete("bucket = 3", rewrite=False)  # v1: dataPaths -> v0 files
    table.append(table.spark.range(1).select(
        F.lit(5000).alias("id"), F.lit(1).alias("bucket"), F.lit(0).alias("val")
    ), fast=False)  # v2: full snapshot (drops the reference to v0's files)
    table.delete("bucket = 4", rewrite=False)  # v3: dataPaths -> v2 files
    removed = table.vacuum(keep_last=2)  # retains v2, v3
    assert 0 in removed  # v0's files are unreferenced by v2/v3
    # v2's files survive (v3 references them); v3 still readable.
    assert table.read(3).count() == 801
    assert table.read().filter("bucket = 4").count() == 0


def test_clone_carries_deletion_vector(table, spark):
    table.delete("bucket = 7", rewrite=False)
    d = tempfile.mkdtemp(prefix="dv_clone_")
    c = table.clone(f"{d}/c")
    assert c.read().count() == 900
    assert c.read().filter("bucket = 7").count() == 0


def test_dml_on_top_of_dv_sees_filtered_state(table):
    table.delete("bucket = 9", rewrite=False)
    table.update({"val": "val + 1"}, "bucket = 0")
    got = table.read()
    assert got.count() == 900
    assert got.filter("bucket = 9").count() == 0
    assert got.filter("id = 10").select("val").first()[0] == 21


def test_change_feed_reports_dv_deletes(table):
    table.delete("id in (1, 2)", rewrite=False)
    feed = table.change_feed(0, 1)
    rows = feed.collect()
    assert len(rows) == 2
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert sorted(r["id"] for r in rows) == [1, 2]


def test_mor_update_rewrites_only_matched_rows(table):
    files_before = _data_files(table, 0)
    mtimes = {f: os.path.getmtime(f) for f in files_before}
    v = table.update({"val": "val + 1000000"}, "bucket = 5", rewrite=False)
    assert v == 1
    assert {f: os.path.getmtime(f) for f in files_before} == mtimes

    got = table.read()
    assert got.count() == 1000
    assert got.filter("val >= 1000000").count() == 100
    assert got.filter("id = 5").select("val").first()[0] == 1000010
    assert got.filter("id = 4").select("val").first()[0] == 8
    m = table.history(1)[0]["operationMetrics"]
    assert m["numUpdatedRows"] == 100
    assert m["numDeletionVectorRows"] == 100
    # The rewritten batch landed in its own dir alongside v0's files.
    import os as _os
    dirs = table._data_dirs(1)
    assert dirs[0] == table._local_data_dir(0)
    assert len(dirs) == 2 and _os.path.basename(dirs[1]).startswith("batch-")


def test_mor_update_after_dv_delete_composes(table):
    table.delete("bucket = 1", rewrite=False)
    table.update({"val": "0 - val"}, "bucket = 2", rewrite=False)
    got = table.read()
    assert got.count() == 900
    assert got.filter("bucket = 1").count() == 0
    assert got.filter("bucket = 2 AND val > 0").count() == 0
    assert got.filter("bucket = 2").count() == 100
    # Updating an already-updated row hits the REWRITTEN copy, not the
    # DV-masked original.
    table.update({"val": "val - 1"}, "bucket = 2", rewrite=False)
    assert table.read().filter("id = 2").select("val").first()[0] == -5


def test_mor_update_time_travel_and_compaction(table):
    table.update({"val": "val * 0"}, "id < 10", rewrite=False)
    assert table.read(0).filter("id < 10").agg(F.sum("val")).first()[0] == 90
    assert table.read(1).filter("id < 10").agg(F.sum("val")).first()[0] == 0
    v = table.compact(target_partitions=2)
    assert "deletionVector" not in table._entry(v)
    assert table.read().count() == 1000
    assert table.read().filter("id < 10").agg(F.sum("val")).first()[0] == 0


def test_mor_merge_update_delete_insert(table, spark):
    files_before = _data_files(table, 0)
    mtimes = {f: os.path.getmtime(f) for f in files_before}
    src = spark.createDataFrame(
        [(1, 111), (2, -1), (5000, 7)], "id long, newval long"
    )
    from delta_lake_platform_spark.sources.managed_table import MergeClauses

    v = table.merge(
        src,
        MergeClauses(
            condition="target.id = updates.id",
            matched_update={"val": "updates.newval"},
            matched_delete_condition="updates.newval < 0",
            not_matched_insert={
                "id": "updates.id", "bucket": "updates.id % 10",
                "val": "updates.newval",
            },
        ),
        rewrite=False,
    )
    assert v == 1
    assert {f: os.path.getmtime(f) for f in files_before} == mtimes
    got = table.read()
    assert got.count() == 1000  # -1 deleted +1 inserted
    assert got.filter("id = 1").select("val").first()[0] == 111
    assert got.filter("id = 2").count() == 0
    assert got.filter("id = 5000").select("val").first()[0] == 7
    m = table.history(1)[0]["operationMetrics"]
    assert (m["numTargetRowsUpdated"], m["numTargetRowsDeleted"],
            m["numTargetRowsInserted"]) == (1, 1, 1)
    assert m["numDeletionVectorRows"] == 2
    assert m["numOutputRows"] == 1000


def test_mor_merge_composes_with_prior_mor_dml(table, spark):
    from delta_lake_platform_spark.sources.managed_table import MergeClauses

    table.delete("id = 1", rewrite=False)
    table.update({"val": "val + 1"}, "id = 3", rewrite=False)
    src = spark.createDataFrame([(1, 50), (3, 60)], "id long, newval long")
    table.merge(
        src,
        MergeClauses(
            condition="target.id = updates.id",
            matched_update={"val": "updates.newval"},
            not_matched_insert={
                "id": "updates.id", "bucket": "updates.id % 10",
                "val": "updates.newval",
            },
        ),
        rewrite=False,
    )
    got = table.read()
    # id=1 was DV-deleted -> merge re-inserts it.
    assert got.filter("id = 1").select("val").first()[0] == 50
    assert got.filter("id = 1").count() == 1
    # id=3's rewritten copy (val=7) is the one updated.
    assert got.filter("id = 3").select("val").first()[0] == 60
    assert got.count() == 1000
    # Full rewrite settles everything.
    table.compact()
    assert table.read().count() == 1000
    assert table.read().filter("id = 3").select("val").first()[0] == 60


def test_mor_merge_multi_match_still_raises(table, spark):
    from delta_lake_platform_spark.sources.managed_table import (
        MergeClauses, MergeError,
    )

    src = spark.createDataFrame([(1, 5), (1, 6)], "id long, newval long")
    with pytest.raises(MergeError):
        table.merge(
            src,
            MergeClauses(
                condition="target.id = updates.id",
                matched_update={"val": "updates.newval"},
            ),
            rewrite=False,
        )


def test_mor_replace_where(table, spark):
    files_before = _data_files(table, 0)
    mtimes = {f: os.path.getmtime(f) for f in files_before}
    new_slice = spark.range(0, 40).select(
        (F.col("id") * 10 + 3).alias("id"),   # bucket 3 ids: 3, 13, 23...
        F.lit(3).alias("bucket"),
        F.lit(-1).alias("val"),
    )
    v = table.overwrite_where(new_slice, "bucket = 3", rewrite=False)
    assert v == 1
    assert {f: os.path.getmtime(f) for f in files_before} == mtimes
    got = table.read()
    # 900 untouched + 40 replacement rows.
    assert got.count() == 940
    assert got.filter("bucket = 3").count() == 40
    assert got.filter("bucket = 3 AND val != -1").count() == 0
    # Validation still applies on the MoR path.
    with pytest.raises(ValueError):
        table.overwrite_where(
            spark.range(1).select(F.lit(1).alias("id"), F.lit(9).alias("bucket"),
                                  F.lit(0).alias("val")),
            "bucket = 3",
            rewrite=False,
        )


def test_maybe_compact_bounds_read_amplification(table, spark):
    for lo in range(0, 5):
        table.append(spark.range(2000 + lo, 2001 + lo).select(
            "id", F.lit(0).alias("bucket"), F.lit(0).alias("val")))
    assert table.maybe_compact(max_data_dirs=16) is None   # under threshold
    v = table.maybe_compact(max_data_dirs=3)
    assert v is not None
    # All live files collapsed into one root (accumulated dead batch
    # dirs in the entry's dataPaths cost readers nothing).
    live_roots = {
        os.path.dirname(f) for f in table._all_data_files(v)
    }
    assert len(live_roots) == 1
    assert table.maybe_compact(max_data_dirs=3) is None  # trigger reset
    assert table.read().count() == 1005
    # DV-size trigger: routed to REORG PURGE (only DV-bearing files
    # rewritten), whose entry records an explicit deletionVector clear.
    table.delete("bucket = 1", rewrite=False)
    assert table.maybe_compact(max_data_dirs=16, max_dv_rows=50) is not None
    assert table._state(table.latest_version())["dv"] is None
    assert table.read().filter("bucket = 1").count() == 0


def test_enable_deletion_vectors_property_switches_dml_default(table):
    table.set_property("enableDeletionVectors", "true")
    v = table.delete("bucket = 6")           # no rewrite arg
    assert table._entry(v)["operation"] == "DELETE (DV)"
    v = table.update({"val": "val + 1"}, "bucket = 0")
    assert table._entry(v)["operation"] == "UPDATE (MOR)"
    # Explicit rewrite overrides the property.
    v = table.delete("bucket = 7", rewrite=True)
    assert table._entry(v)["operation"] == "DELETE"
    assert table.read().count() == 800
