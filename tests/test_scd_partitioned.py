"""Partition-local SCD apply: correctness equivalence + I/O bounds.

The scale path (engine.apply_scd): when the target is hive-partitioned
on a subset of the PK, an incremental batch is applied only to the
partitions it touches and committed as a merge-on-read replaceWhere —
O(touched slice), not O(table). These tests pin both halves of that
claim: the partitioned run produces byte-identical SCD state to the
full-table run, and the incremental commit writes data ONLY under the
touched partition dirs.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime

import pytest

from delta_lake_platform_spark.scd import ScdConfig, apply_scd
from delta_lake_platform_spark.scd.engine import create_scd_target
from delta_lake_platform_spark.sources.managed_table import ManagedTable

SCHEMA = "id long, stock_name string, units long, platform string, reg_ts string, last_modify_ts string"

DAY1 = [
    (1, "Google", 0, "Kite", "2015-12-25 10:05:30", "2025-05-10 10:05:20"),
    (1, "BTC", 0, "Binance", "2016-12-25 11:05:30", "2025-05-11 10:05:20"),
    (3, "ETH", 20, "Binance", "2016-12-26 12:07:35", "2025-05-11 10:05:20"),
    (7, "Tesla", 5, "Kite", "2017-01-02 09:00:00", "2025-05-11 10:05:20"),
]
# Day 2 touches ONLY id=1 (SCD2 on Google, SCD1 on BTC); ids 3/7 absent.
DAY2 = [
    (1, "Google", 100, "Kite", "2015-12-25 10:05:30", "2025-05-12 10:05:20"),
    (1, "BTC", 0, "Upstox", "2016-12-25 11:05:30", "2025-05-12 10:05:20"),
]
# Day 3 touches id=1 (new entity) and id=3 (SCD2).
DAY3 = [
    (1, "Doge", 9, "Binance", "2018-03-03 08:00:00", "2025-05-13 10:05:20"),
    (3, "ETH", 44, "Binance", "2016-12-26 12:07:35", "2025-05-13 10:05:20"),
]

CLOCKS = {
    1: datetime(2025, 5, 10, 12, 0, 0),
    2: datetime(2025, 5, 12, 12, 0, 0),
    3: datetime(2025, 5, 13, 12, 0, 0),
}


def _cfg(day: int) -> ScdConfig:
    return ScdConfig(
        pk_cols=["id", "stock_name"],
        scd_cols=["units"],
        select_cols=["id", "stock_name", "units", "platform"],
        effective_from_col="last_modify_ts",
        initial_eff_date_col="reg_ts",
        clock=lambda: CLOCKS[day],
    )


def _run_scenario(spark, table, partition_by=None):
    df1 = spark.createDataFrame(DAY1, SCHEMA)
    create_scd_target(table, df1, _cfg(1), partition_by=partition_by)
    for day, rows in ((1, DAY1), (2, DAY2), (3, DAY3)):
        apply_scd(spark.createDataFrame(rows, SCHEMA), table, _cfg(day))


def _state(table):
    cols = [c for c in table.read().columns]
    rows = [tuple(r[c] for c in cols) for r in table.read().collect()]
    return sorted(rows)


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="scd_part_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_matches_unpartitioned(spark, tmpdir):
    flat = ManagedTable(spark, f"{tmpdir}/flat")
    part = ManagedTable(spark, f"{tmpdir}/part")
    _run_scenario(spark, flat)
    _run_scenario(spark, part, partition_by=["id"])
    assert _state(part) == _state(flat)


def test_incremental_commit_touches_only_changed_partitions(spark, tmpdir):
    part = ManagedTable(spark, f"{tmpdir}/part")
    _run_scenario(spark, part, partition_by=["id"])

    # Day-2 commit: replaceWhere (MoR) over id=1 only.
    v_day2 = part.latest_version() - 1
    e2 = part._entry(v_day2)
    assert e2["operation"] == "REPLACE WHERE (MOR)"
    assert "id = 1" in e2["operationMetrics"]["predicate"]
    assert "id = 3" not in e2["operationMetrics"]["predicate"]
    batch_dir = next(
        d for d in part._entry(v_day2)["addPaths"]
    )  # version-independent batch dir
    parts = sorted(
        p for p in os.listdir(batch_dir) if not p.startswith(("_", "."))
    )
    assert parts == ["id=1"], f"day-2 batch wrote outside id=1: {parts}"

    # Day-3 commit: id=1 and id=3, never id=7.
    v_day3 = part.latest_version()
    e3 = part._entry(v_day3)
    assert e3["operation"] == "REPLACE WHERE (MOR)"
    batch_dir = next(d for d in part._entry(v_day3)["addPaths"])
    parts = sorted(
        p for p in os.listdir(batch_dir) if not p.startswith(("_", "."))
    )
    assert parts == ["id=1", "id=3"], f"day-3 batch dirs: {parts}"
    assert "id = 7" not in e3["operationMetrics"]["predicate"]


def test_partition_by_must_be_pk_subset(spark, tmpdir):
    t = ManagedTable(spark, f"{tmpdir}/bad")
    df1 = spark.createDataFrame(DAY1, SCHEMA)
    with pytest.raises(ValueError, match="subset of pk_cols"):
        create_scd_target(t, df1, _cfg(1), partition_by=["platform"])


def test_partitioned_time_travel_and_surrogates(spark, tmpdir):
    """Surrogate high-water mark must survive partition-local applies
    (a slice max would reissue ids), and per-version reads stay exact."""
    cfg_base = _cfg(1)
    cfg = ScdConfig(
        pk_cols=cfg_base.pk_cols,
        scd_cols=cfg_base.scd_cols,
        select_cols=cfg_base.select_cols,
        effective_from_col=cfg_base.effective_from_col,
        initial_eff_date_col=cfg_base.initial_eff_date_col,
        clock=cfg_base.clock,
        surrogate_col="account_key",
        surrogate_start=10,
    )
    t = ManagedTable(spark, f"{tmpdir}/surr")
    df1 = spark.createDataFrame(DAY1, SCHEMA)
    create_scd_target(t, df1, cfg, partition_by=["id"])
    for day, rows in ((1, DAY1), (2, DAY2), (3, DAY3)):
        c = ScdConfig(**{**cfg.__dict__, "clock": lambda d=day: CLOCKS[d]})
        apply_scd(spark.createDataFrame(rows, SCHEMA), t, c)
    keys = [r.account_key for r in t.read().collect()]
    assert len(keys) == len(set(keys)), f"duplicate surrogate keys: {sorted(keys)}"
    assert min(keys) == 10
    # 4 day-1 entities + day-2 (1 SCD2 row) + day-3 (1 new + 1 SCD2)
    assert len(keys) == 7
    assert max(keys) == 16


def test_long_run_read_amplification_bounded(spark, tmpdir):
    """Many partition-local applies must not accumulate unbounded MoR
    debt: auto-compaction keeps the referenced-dir count bounded while
    the state stays correct."""
    from datetime import timedelta

    t = ManagedTable(spark, f"{tmpdir}/longrun")
    df1 = spark.createDataFrame(DAY1, SCHEMA)
    create_scd_target(t, df1, _cfg(1), partition_by=["id"])
    apply_scd(df1, t, _cfg(1))
    # 20 further batches, each touching one entity (SCD2 churn on id=1).
    for i in range(20):
        cfg = ScdConfig(
            pk_cols=["id", "stock_name"],
            scd_cols=["units"],
            select_cols=["id", "stock_name", "units", "platform"],
            effective_from_col="last_modify_ts",
            initial_eff_date_col="reg_ts",
            clock=lambda i=i: CLOCKS[2] + timedelta(hours=i + 1),
        )
        batch = [
            (
                1,
                "Google",
                1000 + i,
                "Kite",
                "2015-12-25 10:05:30",
                str(CLOCKS[2] + timedelta(hours=i)),
            )
        ]
        apply_scd(spark.createDataFrame(batch, SCHEMA), t, cfg)
    n_dirs = len(t._data_dirs(t.latest_version()))
    assert n_dirs <= 17, f"MoR debt unbounded: {n_dirs} data dirs"
    rows = t.read().filter("id = 1 AND stock_name = 'Google'").collect()
    # 1 initial version + 20 SCD2 versions, exactly one active
    assert len(rows) == 21
    assert sum(r.record_status == "A" for r in rows) == 1
    active = [r for r in rows if r.record_status == "A"][0]
    assert active.units == 1019
    # untouched entities intact
    assert t.read().filter("id = 7").count() == 1
