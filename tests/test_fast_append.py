"""Incremental (fast) appends: a commit writes only its batch and
references all prior data dirs — O(batch) ingest, Iceberg add-files
model — composing with DV deletes, pruning stats, vacuum, and
compaction."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="fastappend_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(0, 100).select(
            "id", (F.col("id") % 5).alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    return t


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 10).alias("v")
    )


def test_fast_append_writes_only_the_batch(table, spark):
    files_v0 = sorted(glob.glob(os.path.join(table._local_data_dir(0), "*.parquet")))
    mtimes = {f: os.path.getmtime(f) for f in files_v0}
    v = table.append(_batch(spark, 100, 130))
    assert v == 1
    # Old files untouched; new version references them plus its own
    # version-independent batch dir (appends never contend on data
    # paths, so a version clash retries the log entry alone).
    assert {f: os.path.getmtime(f) for f in files_v0} == mtimes
    dirs = table._data_dirs(1)
    assert dirs[0] == table._local_data_dir(0)
    assert len(dirs) == 2 and os.path.basename(dirs[1]).startswith("batch-")
    assert table.read().count() == 130
    assert table.read(0).count() == 100
    m = table.history(1)[0]["operationMetrics"]
    assert m["numAppendedRows"] == 30
    assert m["numOutputRows"] == 130


def test_chained_fast_appends_and_column_max(table, spark):
    for lo in range(100, 200, 25):
        table.append(_batch(spark, lo, lo + 25))
    assert table.read().count() == 200
    assert len(table._data_dirs(table.latest_version())) == 5
    # Footer-stat HWM covers all referenced dirs.
    assert table.column_max("id") == 199
    assert table.detail()["numRows"] == 200


def test_fast_append_then_dv_delete_then_compact(table, spark):
    table.append(_batch(spark, 100, 150))
    table.delete("k = 2", rewrite=False)
    assert table.read().count() == 120
    v = table.compact(target_partitions=2)
    assert table.read().count() == 120
    assert len(table._data_dirs(v)) == 1
    assert "deletionVector" not in table._entry(v)


def test_dv_delete_then_fast_append_keeps_dv(table, spark):
    table.delete("k = 2", rewrite=False)   # 20 rows masked in v0 files
    table.append(_batch(spark, 100, 120))  # adds 4 rows with k=2
    got = table.read()
    assert got.count() == 100  # 80 survivors + 20 new
    # The carried DV masks only old files: new k=2 rows are visible.
    assert got.filter("k = 2").count() == 4
    assert got.filter("k = 2 AND id < 100").count() == 0


def test_vacuum_respects_fast_append_references(table, spark):
    table.append(_batch(spark, 100, 130))          # v1 refs v0
    table.overwrite(table.read())                  # v2 full rewrite
    removed = table.vacuum(keep_last=1)            # only v2 retained
    assert sorted(removed) == [0, 1]
    assert table.read().count() == 130
    # Retaining a fast-append version keeps every dir it references.
    table.append(_batch(spark, 130, 140))          # v3 refs v2
    removed = table.vacuum(keep_last=1)            # retain v3 only
    assert removed == []
    assert table.read().count() == 140


def test_prune_files_spans_all_batch_dirs(table, spark):
    # Each append's footer stats land in the merged fileStats map.
    table.append(_batch(spark, 1000, 1100))
    table.append(_batch(spark, 2000, 2100))
    kept, total = table.prune_files("id", lo=2000, hi=2100)
    assert 0 < len(kept) < total
    got = table.read_pruned("id", lo=2000, hi=2099)
    assert got.count() == 100


def test_copy_into_is_incremental(spark):
    d = tempfile.mkdtemp(prefix="fastcopy_")
    src = os.path.join(d, "landing")
    os.makedirs(src)
    spark.createDataFrame([(1, "a")], "id long, v string").toPandas().to_parquet(
        f"{src}/f1.parquet"
    )
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.createDataFrame([], "id long, v string"))
    t.copy_into(src)
    batch_dir_v1 = t._data_dirs(1)[-1]
    files_v1 = set(glob.glob(os.path.join(batch_dir_v1, "*.parquet")))
    assert files_v1
    spark.createDataFrame([(2, "b")], "id long, v string").toPandas().to_parquet(
        f"{src}/f2.parquet"
    )
    t.copy_into(src)
    # Second ingest did not rewrite the first batch's files.
    assert files_v1 == set(glob.glob(os.path.join(batch_dir_v1, "*.parquet")))
    assert {r.id for r in t.read().collect()} == {1, 2}


def test_fast_append_rejects_schema_drift(spark):
    """An append whose batch schema diverges from the table must error
    at write time (Delta semantics), never silently drop the extra
    column or corrupt the snapshot with a missing one."""
    import tempfile

    import pytest

    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="fa_drift_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(3).selectExpr("id", "id * 2 as v"))
    with pytest.raises(ValueError, match="extra columns \\['w'\\]"):
        t.append(
            spark.createDataFrame([(10, 20, "x")], "id long, v long, w string"),
            fast=True,
        )
    with pytest.raises(ValueError, match="missing \\['v'\\]"):
        t.append(spark.range(2).selectExpr("id"), fast=True)
    # table untouched by the rejected writes
    assert t.read().count() == 3 and t.latest_version() == 0
    # merge_schema is the sanctioned widening path
    t.append(
        spark.createDataFrame([(10, 20, "x")], "id long, v long, w string"),
        merge_schema=True,
        fast=False,
    )
    assert t.read().columns == ["id", "v", "w"] and t.read().count() == 4
