"""CONVERT (Delta's ``CONVERT TO DELTA``): catalog an existing parquet
directory as a managed table IN PLACE — a metadata-only operation that
rewrites zero data bytes. The converted table must be a full citizen:
stats-pruned reads, appends, DML, time travel, and vacuum all work on
top of the files exactly where they already are."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.sql import PlatformSQL


def _write_plain_parquet(spark, d, partitioned=False):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("bucket"),
        (F.col("id") * 10).alias("v"),
    )
    w = df.repartition(4, "bucket").write.mode("overwrite")
    if partitioned:
        w = w.partitionBy("bucket")
    w.parquet(d)
    return df


def test_convert_flat_dir_is_metadata_only(spark):
    root = tempfile.mkdtemp(prefix="convert_flat_")
    d = f"{root}/t"
    _write_plain_parquet(spark, d)
    files_before = sorted(glob.glob(f"{d}/**/*.parquet", recursive=True))
    mtimes_before = {f: os.path.getmtime(f) for f in files_before}

    t = ManagedTable.convert(spark, d)
    # Zero data movement: the exact same files, untouched.
    files_after = sorted(glob.glob(f"{d}/**/*.parquet", recursive=True))
    assert files_after == files_before
    assert {f: os.path.getmtime(f) for f in files_after} == mtimes_before

    assert t.read().count() == 1000
    assert t.read().agg(F.sum("v")).first()[0] == sum(i * 10 for i in range(1000))
    h = t.history(1)[0]
    assert h["operation"] == "CONVERT"
    assert h["operationMetrics"]["numOutputRows"] == 1000
    # Footer stats were recorded: a range prune outside the data reads
    # zero files.
    kept, total = t.prune_files("k", 5000, 6000)
    assert total == len(files_before) and kept == []
    shutil.rmtree(root, ignore_errors=True)


def test_convert_refuses_existing_table_and_empty_dir(spark):
    root = tempfile.mkdtemp(prefix="convert_bad_")
    d = f"{root}/t"
    _write_plain_parquet(spark, d)
    ManagedTable.convert(spark, d)
    with pytest.raises(FileExistsError):
        ManagedTable.convert(spark, d)
    with pytest.raises(FileNotFoundError):
        ManagedTable.convert(spark, f"{root}/empty")
    shutil.rmtree(root, ignore_errors=True)


def test_converted_table_supports_append_dml_time_travel(spark):
    root = tempfile.mkdtemp(prefix="convert_ops_")
    d = f"{root}/t"
    _write_plain_parquet(spark, d)
    t = ManagedTable.convert(spark, d)

    t.append(
        spark.createDataFrame(
            [(10_000, 9, 1)], "k bigint, bucket bigint, v bigint"
        ),
        fast=True,
    )
    assert t.read().count() == 1001
    t.delete("k < 100", rewrite=False)  # MOR on converted files
    assert t.history(1)[0]["operationMetrics"]["numDeletedRows"] == 100
    assert t.read().count() == 901
    t.update({"v": "v + 1"}, condition="k = 10000")
    assert t.read().filter("k = 10000").first()["v"] == 2
    # Time travel back to the converted snapshot.
    assert t.read(version=0).count() == 1000
    shutil.rmtree(root, ignore_errors=True)


def test_convert_partitioned_dir_detects_spec_and_prunes(spark):
    root = tempfile.mkdtemp(prefix="convert_part_")
    d = f"{root}/t"
    _write_plain_parquet(spark, d, partitioned=True)
    t = ManagedTable.convert(spark, d)
    assert t.partition_spec() == ["bucket"]
    got = t.read()
    assert "bucket" in got.columns
    assert got.count() == 1000
    assert got.filter("bucket = 2").count() == 250
    # Partition values double as exact stats: pruning on the partition
    # column keeps only that partition's files.
    kept, total = t.prune_files("bucket", 2, 2)
    assert 0 < len(kept) < total
    assert all("bucket=2" in f for f in kept)
    # Appends and reads compose after conversion.
    t.append(
        spark.createDataFrame([(10_000, 2, 1)], "k bigint, bucket bigint, v bigint"),
        fast=True,
    )
    assert t.read().filter("bucket = 2").count() == 251
    shutil.rmtree(root, ignore_errors=True)


def test_vacuum_reclaims_dead_converted_files_but_never_the_root(spark):
    root = tempfile.mkdtemp(prefix="convert_vac_")
    d = f"{root}/t"
    _write_plain_parquet(spark, d)
    t = ManagedTable.convert(spark, d)
    converted = sorted(glob.glob(f"{d}/*.parquet"))
    assert converted
    # Rewrite the whole table: the converted originals are now dead.
    t.create(
        spark.createDataFrame([(1, 1, 1)], "k bigint, bucket bigint, v bigint"),
        mode="overwrite",
    )
    t.vacuum(keep_last=1, older_than_s=0)
    assert not any(os.path.isfile(f) for f in converted), (
        "dead converted files must be reclaimed file-by-file"
    )
    # The table itself (log + live head) survives.
    assert t.read().count() == 1
    assert os.path.isdir(d)
    shutil.rmtree(root, ignore_errors=True)


def test_vacuum_keeps_converted_files_while_referenced(spark):
    root = tempfile.mkdtemp(prefix="convert_vac_live_")
    d = f"{root}/t"
    _write_plain_parquet(spark, d)
    t = ManagedTable.convert(spark, d)
    converted = sorted(glob.glob(f"{d}/*.parquet"))
    t.append(
        spark.createDataFrame([(10_000, 9, 1)], "k bigint, bucket bigint, v bigint"),
        fast=True,
    )
    t.vacuum(keep_last=1, older_than_s=0)
    # The head still references every converted file (fast append adds
    # on top): nothing may vanish.
    assert all(os.path.isfile(f) for f in converted)
    assert t.read().count() == 1001
    shutil.rmtree(root, ignore_errors=True)


def test_sql_convert_statement(spark):
    root = tempfile.mkdtemp(prefix="convert_sql_")
    d = f"{root}/t"
    _write_plain_parquet(spark, d)
    p = PlatformSQL(spark)
    out = p.sql(f"CONVERT TO MANAGED PARQUET '{d}' AS ext").first()
    assert out["numConvertedFiles"] >= 1
    assert out["numOutputRows"] == 1000
    assert p.sql("SELECT COUNT(*) AS n FROM ext").first()["n"] == 1000
    p.sql("DELETE FROM ext WHERE k < 100")
    assert p.sql("SELECT COUNT(*) AS n FROM ext").first()["n"] == 900
    shutil.rmtree(root, ignore_errors=True)


def test_converted_partitioned_table_through_datasource(spark):
    """Feature interplay: a hive dir converted in place is readable
    through the native format too — partition values come from the
    same k=v segments the convert recorded as stats."""
    from delta_lake_platform_spark.sources import datasource

    datasource.register(spark)
    root = tempfile.mkdtemp(prefix="convert_ds_")
    d = f"{root}/t"
    _write_plain_parquet(spark, d, partitioned=True)
    t = ManagedTable.convert(spark, d)
    got = (
        spark.read.format("managed_table").option("path", t.path).load()
    )
    assert got.count() == 1000
    assert got.filter("bucket = 3").count() == 250
    # Typed (partition-discovery infers int for integral dir values),
    # never a raw string.
    assert dict(got.dtypes)["bucket"] in ("int", "bigint")
    shutil.rmtree(root, ignore_errors=True)


def test_vacuum_reclaims_converted_files_after_log_expiry(
    spark, monkeypatch
):
    """Log retention can expire the CONVERT entry itself; the
    per-version sweep then can't name the converted files, so the
    orphan sweep must reclaim dead root-level parquet (age-guarded)
    instead of leaking it forever."""
    import time as _time

    from delta_lake_platform_spark.sources import managed_table as mt

    monkeypatch.setattr(mt, "_CKPT_INTERVAL", 2)
    root = tempfile.mkdtemp(prefix="convert_expiry_")
    d = f"{root}/t"
    _write_plain_parquet(spark, d)
    t = ManagedTable.convert(spark, d)
    converted = sorted(glob.glob(f"{d}/*.parquet"))
    # Rewrite twice so a checkpoint lands and v0 becomes expirable.
    for i in range(2):
        t.create(
            spark.createDataFrame(
                [(i, i, i)], "k bigint, bucket bigint, v bigint"
            ),
            mode="overwrite",
        )
    removed = t.expire_log_entries(older_than_s=0.0)
    assert 0 in removed, "test needs the CONVERT entry expired"
    # Age the dead files past the orphan-retention floor.
    old = _time.time() - 7200
    for f in converted:
        os.utime(f, (old, old))
    t.vacuum(keep_last=1, older_than_s=0)
    assert not any(os.path.isfile(f) for f in converted), (
        "expired-conversion originals must not leak"
    )
    assert t.read().count() == 1
    shutil.rmtree(root, ignore_errors=True)
