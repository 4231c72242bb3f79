"""Row tracking (Delta's stable row ids, v1 scope): every row gets a
table-lifetime-stable ``_row_id`` — fresh rows draw from a monotone
high-water mark, DV deletes burn ids forever, and every operation that
would rewrite files (which would mint new ids for old rows without
materialization) is refused loudly. The supported lifecycle —
append / COPY INTO / merge-on-read DELETE — is exactly a training-data
corpus's shape."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import (
    ManagedTable,
    MergeClauses,
)


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="rowtrack_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(0, 100).select(
            "id", (F.col("id") % 5).alias("k")
        ).repartition(3)
    )
    t.enable_row_tracking()
    return t


def _ids(t):
    return {r["id"]: r["_row_id"] for r in t.read_row_ids().collect()}


def test_enable_backfills_existing_rows(table):
    ids = _ids(table)
    assert len(ids) == 100
    assert sorted(ids.values()) == list(range(100))  # dense backfill
    h = table.history()
    assert any(e["operation"] == "ENABLE ROW TRACKING" for e in h)


def test_appends_draw_fresh_ids_and_old_rows_keep_theirs(spark, table):
    before = _ids(table)
    table.append(
        spark.range(1000, 1010).select("id", (F.col("id") % 5).alias("k"))
    )
    after = _ids(table)
    # Every pre-existing row keeps its exact id.
    assert all(after[k] == v for k, v in before.items())
    fresh = {rid for k, rid in after.items() if k >= 1000}
    assert fresh == set(range(100, 110))


def test_mor_delete_burns_ids(spark, table):
    table.delete("id % 10 = 0", rewrite=False)
    survivors = _ids(table)
    assert len(survivors) == 90
    burned = set(range(100)) - set(survivors.values())
    assert len(burned) == 10
    # The next append allocates ABOVE everything ever minted — burned
    # ids never come back.
    table.append(
        spark.range(2000, 2003).select("id", (F.col("id") % 5).alias("k"))
    )
    after = _ids(table)
    fresh = {rid for k, rid in after.items() if k >= 2000}
    assert fresh == {100, 101, 102}
    assert not (fresh & burned)


def test_rewrite_operations_are_refused(spark, table):
    with pytest.raises(ValueError, match="row-tracked"):
        table.update({"k": "0"}, condition="id = 1")
    with pytest.raises(ValueError, match="row-tracked"):
        table.delete("id = 1", rewrite=True)
    with pytest.raises(ValueError, match="row-tracked"):
        table.compact()
    with pytest.raises(ValueError, match="row-tracked"):
        table.compact_where("id < 10")
    with pytest.raises(ValueError, match="row-tracked"):
        table.reorg_purge()
    with pytest.raises(ValueError, match="row-tracked"):
        table.overwrite(table.read())
    with pytest.raises(ValueError, match="row-tracked"):
        table.overwrite_where(table.read().limit(1), "id = 0")
    src = spark.createDataFrame([(1, 9)], "id bigint, k bigint")
    with pytest.raises(ValueError, match="row-tracked"):
        table.merge(
            src, MergeClauses(condition="target.id = updates.id",
                              matched_update={"k": "updates.k"})
        )
    with pytest.raises(ValueError, match="row-tracked"):
        table.append(
            spark.createDataFrame([(1, 2, 3)], "id bigint, k bigint, extra bigint"),
            merge_schema=True,
        )
    # Auto-compaction silently no-ops instead of raising mid-ingest.
    assert table.maybe_compact(max_data_dirs=0) is None


def test_concurrent_row_id_allocation_conflicts(spark, table):
    """Two appends allocating from the same mark would mint overlapping
    ids — the commute rule must reject the interleave (a plain blind
    append would pass)."""
    table.append(
        spark.range(500, 505).select("id", (F.col("id") % 5).alias("k"))
    )  # carries a rowIdHighWaterMark
    v = table.latest_version()
    assert table._append_commutes_with(v, v) is True
    assert table._row_id_append_commutes()(v, v) is False


def test_bases_survive_log_expiry(spark, table, monkeypatch):
    """The allocating entries can age out via log retention: the
    high-water mark must still be reconstructable from the live
    state's base spans (removed files cannot exist under the v1
    lifecycle, so the live maximum IS the table maximum)."""
    from delta_lake_platform_spark.sources import managed_table as mt

    monkeypatch.setattr(mt, "_CKPT_INTERVAL", 2)
    for i in range(4):
        table.append(
            spark.range(1000 * (i + 1), 1000 * (i + 1) + 2).select(
                "id", (F.col("id") % 5).alias("k")
            )
        )
    before = _ids(table)
    removed = table.expire_log_entries(older_than_s=0.0)
    assert removed, "test needs expired entries"
    assert _ids(table) == before  # ids unchanged by expiry
    table.append(
        spark.range(9000, 9002).select("id", (F.col("id") % 5).alias("k"))
    )
    after = _ids(table)
    assert len(set(after.values())) == len(after), "duplicate row ids"
    assert all(after[k] == v for k, v in before.items())


def test_sink_refuses_row_tracked_table(spark, table):
    from delta_lake_platform_spark.sources import datasource

    datasource.register(spark)
    df = spark.createDataFrame([(1, 2)], "id bigint, k bigint")
    with pytest.raises(Exception, match="row-tracked"):
        try:
            df.write.format("managed_table").option(
                "path", table.path
            ).mode("append").save()
        except Exception as e:  # py4j wraps the planner error
            raise RuntimeError(str(e)) from e


def test_read_row_ids_requires_tracking_metadata(spark):
    d = tempfile.mkdtemp(prefix="rowtrack_off_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(3).select("id"))
    with pytest.raises(ValueError, match="row-id base"):
        t.read_row_ids()


def test_stats_pruning_unaffected_by_base_key(spark, table):
    """The __rowIdBase span rides the stats dict; range pruning and
    reads must be oblivious to it."""
    kept, total = table.prune_files("id", 5000, 6000)
    assert kept == []  # outside the data: pruned to nothing
    assert table.read().count() == 100
    assert table.row_count() == 100  # metadata-only COUNT(*) intact


def test_property_alone_cannot_skip_backfill(spark):
    """ALTER TABLE SET TBLPROPERTIES (rowTracking=true) on a table with
    unspanned data must route the user to enable_row_tracking() — the
    property alone would leave existing files without id bases."""
    d = tempfile.mkdtemp(prefix="rowtrack_prop_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(5).select("id"))
    with pytest.raises(ValueError, match="enable_row_tracking"):
        t.set_property("rowTracking", "true")
    # The sanctioned path still works (and its own property write
    # passes because every file now carries a span).
    t.enable_row_tracking()
    assert t.row_tracking_enabled()
    assert len(_ids(t)) == 5
