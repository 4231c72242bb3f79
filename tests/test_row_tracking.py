"""Row tracking (Delta's stable row ids): every row gets a
table-lifetime-stable ``_row_id``. Fresh rows are id'd positionally
(``__rowIdBase`` span + row position), file REWRITES preserve ids by
materializing them into the rewritten files as a hidden ``__rid``
column (Delta's materialized row-id column), and replaced rows mint
fresh ids above the high-water mark — burned ids never return, even
across log expiry (the persisted floor)."""

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


# -- materialization: rewrites preserve ids --------------------------------


def test_compact_materializes_and_preserves_ids(spark, table):
    table.append(
        spark.range(1000, 1010).select("id", (F.col("id") % 5).alias("k"))
    )
    table.delete("id % 10 = 3", rewrite=False)  # DV debt to materialize
    before = _ids(table)
    table.compact(target_partitions=2)
    assert _ids(table) == before
    # Normal reads never see the hidden column.
    assert "__rid" not in table.read().columns
    assert "_row_id" in table.read_row_ids().columns
    # The next append still allocates above everything ever minted.
    table.append(
        spark.range(5000, 5002).select("id", (F.col("id") % 5).alias("k"))
    )
    after = _ids(table)
    fresh = {rid for k, rid in after.items() if k >= 5000}
    assert min(fresh) >= 110  # 100 backfilled + 10 appended


def test_cow_delete_preserves_survivor_ids(spark, table):
    before = _ids(table)
    table.delete("id >= 90", rewrite=True)  # file-level COW
    after = _ids(table)
    assert len(after) == 90
    assert all(after[k] == before[k] for k in after)
    burned = set(before.values()) - set(after.values())
    table.append(
        spark.range(7000, 7003).select("id", (F.col("id") % 5).alias("k"))
    )
    fresh = {rid for k, rid in _ids(table).items() if k >= 7000}
    assert not (fresh & burned)


def test_update_preserves_ids_both_modes(spark, table):
    before = _ids(table)
    table.update({"k": "99"}, condition="id = 7", rewrite=False)  # MOR
    table.update({"k": "98"}, condition="id = 8", rewrite=True)  # file COW
    after = _ids(table)
    assert after == before
    rows = {r["id"]: r["k"] for r in table.read().collect()}
    assert rows[7] == 99 and rows[8] == 98


def test_update_cannot_assign_reserved_rid(spark, table):
    with pytest.raises(ValueError, match="reserved row-id"):
        table.update({"__rid": "0"}, condition="id = 1")


def test_merge_keeps_matched_ids_and_mints_inserts(spark, table):
    before = _ids(table)
    src = spark.createDataFrame(
        [(1, 77), (2, 88), (10_000, 1), (10_001, 2)], "id bigint, k bigint"
    )
    clauses = MergeClauses(
        condition="target.id = updates.id",
        matched_update={"k": "updates.k"},
        not_matched_insert={"id": "updates.id", "k": "updates.k"},
    )
    table.merge(src, clauses, rewrite=True)  # file-level COW
    after = _ids(table)
    assert after[1] == before[1] and after[2] == before[2]
    fresh = {rid for key, rid in after.items() if key >= 10_000}
    assert len(fresh) == 2 and min(fresh) >= 100
    assert len(set(after.values())) == len(after), "duplicate row ids"
    # And the MOR form on top: matched keeps, insert mints higher still.
    src2 = spark.createDataFrame(
        [(1, 70), (20_000, 5)], "id bigint, k bigint"
    )
    table.merge(src2, clauses, rewrite=False)
    final = _ids(table)
    assert final[1] == before[1]
    assert final[20_000] > max(fresh)
    with pytest.raises(Exception, match="reserved row-id"):
        table.merge(
            src2,
            MergeClauses(
                condition="target.id = updates.id",
                matched_update={"__rid": "0"},
            ),
        )


def test_overwrite_and_replace_where_id_semantics(spark, table):
    hwm_ids = set(_ids(table).values())
    table.overwrite_where(
        spark.createDataFrame([(0, 50), (5, 51)], "id bigint, k bigint"),
        "id in (0, 5)",
        rewrite=True,
    )
    after = _ids(table)
    kept_before = {k: v for k, v in after.items() if k not in (0, 5)}
    # Replaced rows are NEW rows: fresh ids above everything.
    assert after[0] >= 100 and after[5] >= 100
    table.overwrite(
        spark.range(10).select("id", (F.col("id") % 5).alias("k"))
    )
    post = _ids(table)
    assert len(post) == 10
    assert set(post.values()).isdisjoint(hwm_ids)  # all-new identities
    assert len(set(post.values())) == 10


def test_reorg_purge_and_zorder_preserve_ids(spark, table):
    table.delete("id % 7 = 0", rewrite=False)
    before = _ids(table)
    assert table.reorg_purge() is not None
    assert _ids(table) == before
    table.optimize_zorder(["id"], n_files=2)
    assert _ids(table) == before


def test_maybe_compact_now_compacts_and_preserves(spark, table):
    table.append(
        spark.range(1000, 1005).select("id", (F.col("id") % 5).alias("k"))
    )
    before = _ids(table)
    assert table.maybe_compact(max_data_dirs=0) is not None
    assert _ids(table) == before


def test_restore_preserves_ids(spark, table):
    before = _ids(table)
    v = table.latest_version()
    table.delete("id < 50", rewrite=True)
    table.restore(v)
    assert _ids(table) == before


def test_merge_schema_append_materializes_and_mints(spark, table):
    before = _ids(table)
    table.append(
        spark.createDataFrame([(9000, 1, 3)], "id bigint, k bigint, extra bigint"),
        merge_schema=True,
    )
    after = _ids(table)
    assert all(after[k] == v for k, v in before.items())
    assert after[9000] >= 100
    assert "extra" in table.read().columns


def test_burned_peak_survives_expiry_via_floor(spark, table, monkeypatch):
    """COW-delete the peak-id rows, expire the mark-carrying entries:
    the persisted floor must keep the next mint above the burned peak
    (the live state alone under-reconstructs after the rewrite)."""
    from delta_lake_platform_spark.sources import managed_table as mt

    monkeypatch.setattr(mt, "_CKPT_INTERVAL", 2)
    table.delete("id >= 50", rewrite=True)  # burns ids of peak rows
    table.delete("id >= 45", rewrite=True)
    table.delete("id >= 40", rewrite=True)
    removed = table.expire_log_entries(older_than_s=0.0)
    assert removed, "test needs expired entries"
    # No surviving entry records a mark; the floor must carry 100.
    table.append(
        spark.range(8000, 8002).select("id", (F.col("id") % 5).alias("k"))
    )
    after = _ids(table)
    fresh = {rid for k, rid in after.items() if k >= 8000}
    assert min(fresh) >= 100, f"burned ids re-minted: {sorted(fresh)}"
    assert len(set(after.values())) == len(after)


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


def test_sink_appends_to_row_tracked_table(spark, table):
    """The DataSource sink commits on the driver, so it assigns
    __rowIdBase spans there like any other append — fresh ids above
    the mark, old rows untouched."""
    from delta_lake_platform_spark.sources import datasource

    datasource.register(spark)
    before = _ids(table)
    df = spark.createDataFrame([(30_000, 2), (30_001, 3)], "id bigint, k bigint")
    df.write.format("managed_table").option(
        "path", table.path
    ).mode("append").save()
    after = _ids(table)
    assert all(after[k] == v for k, v in before.items())
    fresh = {rid for k, rid in after.items() if k >= 30_000}
    assert fresh == {100, 101}
    # The sink's commit recorded the mark: the next table-API append
    # allocates above it.
    table.append(
        spark.range(40_000, 40_001).select("id", (F.col("id") % 5).alias("k"))
    )
    assert _ids(table)[40_000] == 102


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


def test_partitioned_table_full_lifecycle(spark):
    """Row tracking composes with hive partitioning: spans on the
    partitioned create, materialization through MOR update + compact
    (partitioned rewrites read `__rid` through the dir-root scan with
    partition discovery)."""
    d = tempfile.mkdtemp(prefix="rowtrack_part_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(60).select(
            "id", (F.col("id") % 3).alias("bucket")
        ),
        partition_by=["bucket"],
    )
    t.enable_row_tracking()
    before = _ids(t)
    assert len(set(before.values())) == 60
    t.delete("id % 10 = 9", rewrite=False)  # MOR: burn, no rewrite
    t.update({"id": "id + 1000"}, condition="id = 5", rewrite=False)
    t.compact(target_partitions=1)  # materializes through partitionBy
    after = _ids(t)
    assert len(after) == 54
    assert after[1005] == before[5]  # updated row kept its id
    survivors = {k: v for k, v in before.items() if k % 10 != 9 and k != 5}
    assert all(after[k] == v for k, v in survivors.items())
    t.append(
        spark.range(500, 502).select("id", (F.col("id") % 3).alias("bucket"))
    )
    fresh = {rid for k, rid in _ids(t).items() if 500 <= k < 1000}
    assert min(fresh) >= 60


def test_reserved_rid_name_is_refused(spark, table):
    with pytest.raises(ValueError, match="reserved"):
        table.alter_add_column("__rid", "bigint")
    with pytest.raises(ValueError, match="reserved"):
        table.alter_rename_column("k", "__rid")


@pytest.mark.parametrize("seed", [11, 42])
def test_random_lifecycle_never_reuses_or_loses_ids(spark, seed):
    """Fuzz the whole id lifecycle: appends, MOR and COW deletes,
    updates, bin-pack OPTIMIZE, z-order, and purge interleave randomly.
    Invariants after every step: live ids unique; a surviving row keeps
    the id it had; a vanished id NEVER returns on a later row."""
    import random

    rng = random.Random(seed)
    d = tempfile.mkdtemp(prefix=f"rowtrack_fuzz{seed}_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(0, 40).select("id", (F.col("id") % 5).alias("k"))
    )
    t.enable_row_tracking()
    prev = _ids(t)
    burned: set[int] = set()
    next_key = 1000
    for step in range(12):
        op = rng.choice(
            [
                "append", "append", "mor_delete", "cow_delete",
                "update", "optimize", "zorder", "purge",
            ]
        )
        if op == "append":
            n = rng.randint(1, 6)
            t.append(
                spark.range(next_key, next_key + n).select(
                    "id", (F.col("id") % 5).alias("k")
                ),
                fast=True,
            )
            next_key += n
        elif op == "mor_delete" and t.read().count() > 1:
            t.delete(f"id % 7 = {rng.randint(0, 6)}", rewrite=False)
        elif op == "cow_delete" and t.read().count() > 1:
            t.delete(f"id % 11 = {rng.randint(0, 10)}", rewrite=True)
        elif op == "update" and t.read().count() > 0:
            t.update({"k": "k + 100"}, f"id % 5 = {rng.randint(0, 4)}")
        elif op == "optimize":
            t.optimize(min_file_size=1 << 30)
        elif op == "zorder" and t.read().count() > 1:
            t.optimize_zorder(["id"], n_files=2)
        elif op == "purge":
            t.reorg_purge()
        else:
            continue
        cur = _ids(t)
        rids = list(cur.values())
        assert len(rids) == len(set(rids)), f"step {step}: duplicate id"
        for key, rid in cur.items():
            if key in prev:
                assert rid == prev[key], (
                    f"step {step} ({op}): row {key} changed id "
                    f"{prev[key]} -> {rid}"
                )
            else:
                assert rid not in burned, (
                    f"step {step} ({op}): burned id {rid} re-minted"
                )
        burned |= {r for k, r in prev.items() if k not in cur}
        prev = cur


def test_burned_peak_survives_optimize_and_expiry(spark, table, monkeypatch):
    """MOR-delete the peak-id rows, then OPTIMIZE (materializes the
    survivors and DROPS the span files whose spans covered the burned
    peak), then expire the mark-carrying entries: the floor must still
    keep the next mint above the peak."""
    from delta_lake_platform_spark.sources import managed_table as mt

    monkeypatch.setattr(mt, "_CKPT_INTERVAL", 2)
    peak = max(_ids(table).values())
    table.delete("id >= 90", rewrite=False)  # burn the peak ids (DV)
    v = table.optimize(min_file_size=1 << 30)
    assert v is not None  # spans gone, survivors materialized
    live_max = max(_ids(table).values())
    assert live_max < peak  # the peak id is now invisible to the state
    table.compact()  # push the mark-carrying entries below the horizon
    table.compact()
    removed = table.expire_log_entries(older_than_s=0.0)
    assert removed, "test needs expired entries"
    table.append(
        spark.range(9100, 9103).select("id", (F.col("id") % 5).alias("k"))
    )
    after = _ids(table)
    fresh = {rid for k, rid in after.items() if k >= 9100}
    assert min(fresh) > peak, f"burned peak {peak} re-minted: {sorted(fresh)}"
    assert len(set(after.values())) == len(after)


def test_enable_row_tracking_bumps_writer_protocol(spark, table):
    """Row tracking is a writer feature: a legacy writer rewriting
    files would drop the ids, so the backfill commit records writer
    version 4 (readers unaffected — they never see the hidden
    column)."""
    proto = table._state(table.latest_version()).get("protocol") or {}
    assert proto.get("minWriterVersion", 1) >= 4
    assert proto.get("minReaderVersion", 1) <= 3


def test_hwm_mark_folds_into_checkpoint_meta(spark):
    """NOTES debt (e): the row-id/identity mark walk terminates at the
    nearest mark-folding checkpoint instead of scanning every retained
    entry. Pinned by (a) the checkpoint meta carrying hwmMarks equal to
    the brute-force entry walk, and (b) _newest_marks never touching an
    entry below the checkpoint once one exists."""
    import json as _json
    import os as _os
    import tempfile

    d = tempfile.mkdtemp(prefix="hwmfold_")
    t = ManagedTable(spark, f"{d}/t")
    t.set_property("checkpointInterval", "4")
    t.create(spark.range(10).selectExpr("id", "id AS v"))
    t.enable_row_tracking()  # v1: minting commit records the mark
    for i in range(4):  # v2..v5: non-minting DML / layout churn
        t.update({"v": "v + 1"}, f"id = {i}", rewrite=True)
    head = t.latest_version()
    assert head >= 4  # a checkpoint at v4 exists
    marks = t._checkpoint_marks(4)
    assert marks is not None, "checkpoint must fold hwmMarks"
    # Brute-force newest-mark walk over ALL entries for comparison.
    brute = None
    for v in range(4, -1, -1):
        m = (t._entry(v) or {}).get("rowIdHighWaterMark")
        if m is not None:
            brute = m
            break
    assert marks[0] == brute == 10
    # The walk stops at the checkpoint: poison every entry read below
    # it and confirm _newest_marks(head) never needs them.
    t2 = ManagedTable(spark, f"{d}/t")
    real_entry = t2._entry

    def guarded(v):
        if v < 4:
            raise AssertionError(f"walk descended below the checkpoint: {v}")
        return real_entry(v)

    t2._entry = guarded
    rid, _ids = t2._newest_marks(head)
    assert rid == 10
    # End to end: appends after the fold still mint above the mark.
    t.append(spark.range(100, 103).selectExpr("id", "id AS v"))
    ids = [r["_row_id"] for r in t.read_row_ids().collect()]
    assert len(ids) == len(set(ids))
