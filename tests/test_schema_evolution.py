"""Metadata-only schema evolution (Delta's ADD COLUMN / type widening).

With the snapshot schema recorded in the log, ADD COLUMN and read-safe
type widening are O(1) metadata commits: zero data files touched, old
files fill NULLs / upcast at scan time. Pinned here:

- ADD COLUMN writes no data (file set and mtimes unchanged), reads show
  the NULL column, time travel shows the pre-evolution schema;
- widening int->bigint keeps old INT32 files readable and new appends
  land wide; disallowed conversions (narrowing, string->int) raise;
- evolution composes with hive partitioning and the change feed.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.sql import PlatformSQL


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="schemaevo_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _data_files(t: ManagedTable):
    return sorted(t._abs(rel) for rel in t._state(t.latest_version())["files"])


def test_add_column_is_metadata_only(spark, tmpdir):
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(
        spark.range(10).select("id", (F.col("id") * 2).alias("v")).coalesce(2)
    )
    files = _data_files(t)
    mtimes = {f: os.path.getmtime(f) for f in files}
    v = t.alter_add_column("note", "string")
    entry = json.load(open(t._entry_path(v)))
    assert entry["logMode"] == "delta" and not entry["add"] and not entry["remove"]
    assert entry["operationMetrics"]["metadataOnly"] is True
    assert _data_files(t) == files  # zero files written or removed
    assert {f: os.path.getmtime(f) for f in files} == mtimes
    got = t.read()
    assert dict(got.dtypes)["note"] == "string"
    assert [r.note for r in got.collect()] == [None] * 10
    # Time travel: the old snapshot keeps the old schema.
    assert "note" not in t.read(v - 1).columns


def test_widen_int_to_bigint_keeps_old_files_readable(spark, tmpdir):
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(spark.createDataFrame([(1, 10), (2, 20)], "id long, v int").coalesce(1))
    files = _data_files(t)
    v = t.alter_widen_column("v", "bigint")
    assert _data_files(t) == files  # metadata-only
    got = t.read()
    assert dict(got.dtypes)["v"] == "bigint"
    assert sorted(r.v for r in got.collect()) == [10, 20]
    # New appends land wide (cast to the widened table schema).
    t.append(
        spark.createDataFrame([(3, 2**40)], "id long, v long").coalesce(1),
        fast=True,
    )
    assert sorted(r.v for r in t.read().collect()) == [10, 20, 2**40]
    # And the old narrow batch is still in play after more evolution.
    t.alter_add_column("w", "double")
    assert t.read().filter("v = 10").count() == 1


def test_widen_rejects_unsafe_conversions(spark, tmpdir):
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(spark.createDataFrame([(1, 10)], "id long, v int").coalesce(1))
    for bad in ("int", "string", "float"):
        if bad == "int":
            continue  # no-op is permitted
        with pytest.raises(ValueError, match="widening"):
            t.alter_widen_column("v", bad)
    with pytest.raises(ValueError, match="widening"):
        t.alter_widen_column("id", "int")  # narrowing long->int
    with pytest.raises(ValueError, match="no column"):
        t.alter_widen_column("nope", "bigint")


def test_evolution_on_partitioned_table(spark, tmpdir):
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(
        spark.range(20).select(
            "id", (F.col("id") % 2).alias("part"), (F.col("id") * 3).alias("v")
        ),
        partition_by=["part"],
    )
    files = _data_files(t)
    t.alter_add_column("tag", "string")
    assert _data_files(t) == files
    got = t.read()
    assert got.columns == ["id", "part", "v", "tag"]  # declared order kept
    assert got.filter("part = 1").count() == 10
    assert got.select("tag").distinct().collect()[0][0] is None


def test_widen_via_sql_dialect(spark, tmpdir):
    t = ManagedTable(spark, f"{tmpdir}/w")
    t.create(spark.createDataFrame([(1, 7)], "id long, v int").coalesce(1))
    psql = PlatformSQL(spark)
    psql.register("w", t)
    out = psql.sql("ALTER TABLE w ALTER COLUMN v TYPE BIGINT").first()
    assert out.column == "v"
    got = psql.sql("SELECT id, v FROM w")
    assert dict(got.dtypes)["v"] == "bigint"
    assert [(r.id, r.v) for r in got.collect()] == [(1, 7)]


def test_change_feed_spans_a_metadata_only_commit(spark, tmpdir):
    """A schema-only commit adds/removes no rows: the feed across it is
    empty, and a feed spanning it plus an append shows only the
    appended rows (under the evolved schema)."""
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(spark.createDataFrame([(1, 10)], "id long, v int").coalesce(1))
    v0 = t.latest_version()
    v1 = t.alter_widen_column("v", "bigint")
    feed = t.change_feed(v0, v1)
    assert feed.count() == 0
    t.append(spark.createDataFrame([(2, 20)], "id long, v long").coalesce(1))
    feed = t.change_feed(v0, t.latest_version())
    rows = [(r.id, r.v, r._change_type) for r in feed.collect()]
    assert rows == [(2, 20, "insert")]


def test_datasource_reads_through_evolved_schema(spark, tmpdir):
    """spark.read.format('managed_table') must bind the LOG schema, not
    the first file's footer: after a widen + add-column, old narrow
    files upcast and NULL-fill per batch."""
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(spark.createDataFrame([(1, 10)], "id long, v int").coalesce(1))
    t.alter_widen_column("v", "bigint")
    t.alter_add_column("w", "string")
    t.append(
        spark.createDataFrame([(2, 2**40, "x")], "id long, v long, w string")
        .coalesce(1),
        fast=True,
    )
    from delta_lake_platform_spark.sources.datasource import register

    register(spark)
    got = spark.read.format("managed_table").load(t.path)
    assert dict(got.dtypes)["v"] == "bigint" and dict(got.dtypes)["w"] == "string"
    rows = {r.id: (r.v, r.w) for r in got.collect()}
    assert rows == {1: (10, None), 2: (2**40, "x")}


def test_prune_files_after_date_widening(spark, tmpdir):
    """Old files' date-string stats normalize exactly to midnight when
    the column widened to timestamp — no over-pruning at the day
    boundary, no TypeError on mixed bounds."""
    import datetime as _dt

    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(
        spark.createDataFrame(
            [(1, _dt.date(2026, 8, 14))], "id long, d date"
        ).coalesce(1)
    )
    t.alter_widen_column("d", "timestamp_ntz")
    kept, total = t.prune_files("d", lo="2026-08-14 00:00:00")
    assert total == 1 and len(kept) == 1  # midnight row must survive
    kept, _ = t.prune_files("d", lo="2026-08-14 00:00:01")
    assert len(kept) == 0  # and the exact bound still prunes
    kept, _ = t.prune_files("d", lo=_dt.datetime(2026, 8, 14))
    assert len(kept) == 1  # incomparable bound type: conservative keep
    assert t.read_pruned("d", lo="2026-08-14 00:00:00").count() == 1
