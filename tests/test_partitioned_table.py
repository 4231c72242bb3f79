"""Hive-partitioned managed tables: partitioned layout on every write
path, partition values as exact skipping stats, partition pruning in
the physical plan, and composition with fast appends + MoR DML."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="part_table_")
    t = ManagedTable(spark, f"{d}/t")
    df = spark.range(0, 300).select(
        "id", (F.col("id") % 3).alias("region"), (F.col("id") * 2).alias("val")
    )
    t.create(df, partition_by=["region"])
    return t


def test_layout_and_roundtrip(table):
    # Hive dirs exist; partition column round-trips through read().
    subdirs = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(table._local_data_dir(0), "region=*"))
    )
    assert subdirs == ["region=0", "region=1", "region=2"]
    got = table.read()
    assert got.count() == 300
    assert set(got.columns) == {"id", "region", "val"}
    assert got.filter("region = 1").count() == 100


def test_partition_values_become_skipping_stats(table):
    kept, total = table.prune_files("region", lo=2, hi=2)
    assert total > len(kept) > 0
    assert all("region=2" in f for f in kept)
    # column_max for the partition column comes from the log alone.
    assert table.column_max("region") == 2


def test_partition_pruning_in_plan(table):
    plan = table.read().filter("region = 1")._jdf.queryExecution().executedPlan().toString()
    # Spark's dir-level pruning: the scan's partition filter is present.
    assert "region" in plan
    assert table.read_pruned("region", lo=1, hi=1).count() == 100


def test_fast_append_keeps_partitioned_layout(table, spark):
    batch = spark.range(300, 330).select(
        "id", (F.col("id") % 3).alias("region"), (F.col("id") * 2).alias("val")
    )
    v = table.append(batch)
    batch_dir = table._data_dirs(v)[-1]
    assert os.path.basename(batch_dir).startswith("batch-")
    assert glob.glob(os.path.join(batch_dir, "region=*"))
    got = table.read()
    assert got.count() == 330
    assert got.filter("region = 0").count() == 110


def test_mor_dml_on_partitioned_table(table, spark):
    table.delete("id < 30", rewrite=False)
    assert table.read().count() == 270
    table.update({"val": "val + 1"}, "region = 2", rewrite=False)
    got = table.read()
    assert got.count() == 270
    assert got.filter("id = 32").select("val").first()[0] == 65
    assert got.filter("id = 31").select("val").first()[0] == 62
    v = table.compact()
    assert table.read().count() == 270
    assert "deletionVector" not in table._entry(v)
    # Compaction preserves the partitioned layout.
    assert glob.glob(os.path.join(table._local_data_dir(v), "region=*"))


def test_clone_preserves_partition_spec(table, spark):
    d = tempfile.mkdtemp(prefix="part_clone_")
    c = table.clone(f"{d}/c")
    assert c.partition_spec() == ["region"]
    assert c.read().count() == 300
    c.append(
        spark.range(1000, 1003).select(
            "id", (F.col("id") % 3).alias("region"), (F.col("id") * 2).alias("val")
        )
    )
    assert c.read().count() == 303
    assert table.read().count() == 300
