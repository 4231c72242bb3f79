"""DeltaTable-compat shim: the reference's notebook call shapes run
unmodified.

``_reference_delta_merge`` below is the reference's ``delta_merge``
(scd_handler.py:7-55) with its exact condition strings, update/insert
dict construction, fluent builder chain, and history(1) readback — only
``display(...)`` dropped. The 3-day scenario drives it through
scd/compat.DeltaTable twice per day (close-outs, then active upserts),
sequenced as the reference's apply_scd does, and the final table state
must equal the engine's own two_merge mode byte for byte.
"""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

import pytest

from delta_lake_platform_spark.scd import ScdConfig, apply_scd
from delta_lake_platform_spark.scd.compat import DeltaTable, register_table
from delta_lake_platform_spark.scd.engine import (
    _split_current,
    _stamp_incoming,
    create_scd_target,
)
from delta_lake_platform_spark.sources.managed_table import ManagedTable
from pyspark.sql import functions as F

SCHEMA = "id long, stock_name string, units long, platform string, reg_ts string, last_modify_ts string"

DAY1 = [
    (1, "Google", 0, "Kite", "2015-12-25 10:05:30", "2025-05-10 10:05:20"),
    (1, "BTC", 0, "Binance", "2016-12-25 11:05:30", "2025-05-11 10:05:20"),
    (3, "ETH", 20, "Binance", "2016-12-26 12:07:35", "2025-05-11 10:05:20"),
]
DAY2 = [
    (1, "Google", 100, "Kite", "2015-12-25 10:05:30", "2025-05-12 10:05:20"),
    (1, "BTC", 171, "Binance", "2016-12-25 11:05:30", "2025-05-12 10:05:20"),
    (3, "ETH", 20, "Binance", "2016-12-26 12:07:35", "2025-05-11 10:05:20"),
]
DAY3 = [
    (1, "Google", 100, "CoinSwitch", "2015-12-25 10:05:30", "2025-05-13 10:05:20"),
    (1, "BTC", 200, "CoinSwitch", "2016-12-25 11:05:30", "2025-05-13 10:05:20"),
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


def _reference_delta_merge(df, pk_col, delta_table, is_active_data=False):
    """Reference scd_handler.py:7-55, verbatim call shapes."""
    merge_condition = (
        " AND ".join([f"target.{col} = updates.{col}" for col in pk_col])
        + " AND target.effective_to is null AND target.record_status = 'A'"
        + (" AND target.scd_key = updates.scd_key" if is_active_data else "")
    )
    update_condition = (
        "target.upd_key != updates.upd_key" if is_active_data else None
    )
    when_matched_update_column_dictionary = {
        f"{column}": f"updates.{column}"
        for column in (set(df.columns) - {"dw_inserted_at", "effective_from"})
    }
    when_not_matched_insert_column_dictionary = {
        f"{column}": f"updates.{column}" for column in df.columns
    }
    delta_table.alias("target").merge(
        df.alias("updates"), merge_condition
    ).whenMatchedUpdate(
        condition=update_condition, set=when_matched_update_column_dictionary
    ).whenNotMatchedInsert(
        values=when_not_matched_insert_column_dictionary
    ).execute()
    return delta_table.history(1)


def _apply_day_via_shim(spark, delta_table, managed, day, rows):
    """The reference apply_scd sequencing (close-outs, then actives),
    with both merges going through the compat DeltaTable."""
    cfg = _cfg(day)
    df = spark.createDataFrame(rows, SCHEMA)
    incoming = _stamp_incoming(df, cfg, cfg.clock())
    current, _ = _split_current(managed.read(), cfg)

    matched = incoming.alias("u").join(
        current.alias("t"), on=list(cfg.pk_cols), how="inner"
    )
    closeouts = matched.filter(
        F.col("u.scd_key") != F.col("t.scd_key")
    ).select(
        *[F.col(c) for c in cfg.pk_cols],
        *[
            F.col(f"t.{c}").alias(c)
            for c in current.columns
            if c not in cfg.pk_cols
            and c not in ("record_status", "effective_to", "dw_updated_at")
        ],
        F.lit("I").alias("record_status"),
        F.col("u.effective_from").alias("effective_to"),
        F.lit(cfg.clock()).cast("timestamp").alias("dw_updated_at"),
    )
    if not closeouts.isEmpty():
        hist = _reference_delta_merge(closeouts, cfg.pk_cols, delta_table)
        assert hist.count() == 1  # history(1) returns the merge commit

    new_entities = incoming.join(
        current.select(*cfg.pk_cols), on=list(cfg.pk_cols), how="left_anti"
    ).withColumn("effective_from", F.col("initial_effective_from"))
    matched_active = incoming.join(
        current.select(*cfg.pk_cols), on=list(cfg.pk_cols), how="left_semi"
    )
    active = matched_active.unionByName(new_entities).drop(
        "initial_effective_from"
    )
    hist = _reference_delta_merge(
        active, cfg.pk_cols, delta_table, is_active_data=True
    )
    row = hist.first()
    assert row.operation == "MERGE"
    assert "operationMetrics" in hist.columns


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="compat_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _state(table: ManagedTable):
    cols = table.read().columns
    return sorted(tuple(r[c] for c in cols) for r in table.read().collect())


def test_reference_notebook_scenario_via_shim(spark, tmpdir):
    # Ground truth: the engine's own two_merge mode.
    truth = ManagedTable(spark, f"{tmpdir}/truth")
    df1 = spark.createDataFrame(DAY1, SCHEMA)
    create_scd_target(truth, df1, _cfg(1))
    for day, rows in ((1, DAY1), (2, DAY2), (3, DAY3)):
        apply_scd(
            spark.createDataFrame(rows, SCHEMA), truth, _cfg(day), mode="two_merge"
        )

    # Shim run: catalog-style name, reference call shapes.
    shim_path = f"{tmpdir}/wh/development/gold_dm/account_scd2"
    managed = ManagedTable(spark, shim_path)
    create_scd_target(managed, df1, _cfg(1))
    register_table("development.gold_dm.account_scd2", shim_path)
    dt = DeltaTable.forName(spark, "development.gold_dm.account_scd2")
    for day, rows in ((1, DAY1), (2, DAY2), (3, DAY3)):
        _apply_day_via_shim(spark, dt, managed, day, rows)

    assert _state(managed) == _state(truth)
    assert dt.toDF().count() == truth.read().count()


def test_forname_warehouse_fallback(spark, tmpdir):
    wh = spark.conf.get("spark.sql.warehouse.dir")
    assert wh  # session fixture pins one
    root = wh[len("file:"):] if wh.startswith("file:") else wh
    t = ManagedTable(spark, f"{root}/db/tbl")
    df = spark.range(3).selectExpr("id", "id * 2 as v")
    t.create(df, mode="ignore")
    dt = DeltaTable.forName(spark, "db.tbl")
    assert dt.toDF().count() == 3


def test_forname_missing_raises(spark):
    with pytest.raises(ValueError, match="not found"):
        DeltaTable.forName(spark, "no.such.table")


def test_alias_suffix_of_updates_rewrites_cleanly(spark, tmpdir):
    # Regression: alias 's' is a dotted suffix of 'updates.'; a naive
    # substring replace turned 'updates.id' into 'updatetarget.id'. The
    # word-boundary rewrite must leave the source side intact.
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    dt = DeltaTable.forPath(spark, f"{tmpdir}/t").alias("s")
    src = spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
    dt.merge(src.alias("updates"), "s.id = updates.id").whenMatchedUpdate(
        set={"v": "updates.v"}
    ).whenNotMatchedInsert(
        values={"id": "updates.id", "v": "updates.v"}
    ).execute()
    got = sorted((r.id, r.v) for r in dt.toDF().collect())
    assert got == [(1, "a"), (2, "B"), (3, "c")]


def test_alias_updates_rejected(spark, tmpdir):
    t = ManagedTable(spark, f"{tmpdir}/t2")
    t.create(spark.createDataFrame([(1, "a")], "id long, v string"))
    with pytest.raises(ValueError, match="updates"):
        DeltaTable.forPath(spark, f"{tmpdir}/t2").alias("updates")


def test_real_delta_delegation(spark, tmpdir):
    """Skips unless delta-spark is installed (it is not in this
    sandbox). With it, forPath on a real _delta_log table must return
    the REAL DeltaTable so reference users' tables work untranslated."""
    pytest.importorskip("delta")
    from delta.tables import DeltaTable as RealDeltaTable

    path = f"{tmpdir}/real_delta"
    spark.range(3).write.format("delta").save(path)
    dt = DeltaTable.forPath(spark, path)
    assert isinstance(dt, RealDeltaTable)
    assert dt.toDF().count() == 3


def test_managed_table_still_served_when_no_delta_log(spark, tmpdir):
    """A ManagedTable path (no _delta_log) goes through the facade even
    if delta-spark happens to be installed."""
    t = ManagedTable(spark, f"{tmpdir}/mt")
    t.create(spark.range(4).selectExpr("id", "id * 2 as v"))
    dt = DeltaTable.forPath(spark, f"{tmpdir}/mt")
    assert isinstance(dt, DeltaTable)
    assert dt.toDF().count() == 4


def test_fluent_conditional_insert(spark):
    import tempfile

    from delta_lake_platform_spark.scd.compat import DeltaTable

    d = tempfile.mkdtemp(prefix="compat_condins_")
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    mt = ManagedTable(spark, f"{d}/t")
    mt.create(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    dt = DeltaTable.forPath(spark, f"{d}/t")
    src = spark.createDataFrame(
        [(2, "b2"), (3, "c"), (4, "d")], "id long, v string"
    ).alias("updates")
    (
        dt.alias("target")
        .merge(src, "target.id = updates.id")
        .whenMatchedUpdate(set={"v": "updates.v"})
        .whenNotMatchedInsert(
            condition="updates.id % 2 = 1",
            values={"id": "updates.id", "v": "updates.v"},
        )
        .execute()
    )
    got = {r.id: r.v for r in mt.read().collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}  # id 4 failed the gate


def test_facade_dispatch_contract(spark, tmpdir, monkeypatch):
    """Pins the delegation RULE itself so it is exercised with or
    without delta-spark installed (the sandbox lacks it; a user env
    has it): real library present AND a ``_delta_log`` directory →
    the real class's forPath; either condition false → the facade.
    A sentinel stands in for the real class, so this never skips."""
    import os

    from delta_lake_platform_spark.scd import compat

    seen = {}

    class FakeReal:
        @classmethod
        def forPath(cls, spark_, path_):
            seen["path"] = path_
            return cls

    realish = f"{tmpdir}/realish"
    os.makedirs(os.path.join(realish, "_delta_log"))
    mt = ManagedTable(spark, f"{tmpdir}/mt_dispatch")
    mt.create(spark.range(2).selectExpr("id"))

    # library "installed": _delta_log dir delegates, ManagedTable stays
    monkeypatch.setattr(compat, "_real_delta_table", lambda: FakeReal)
    assert compat.DeltaTable.forPath(spark, realish) is FakeReal
    assert seen["path"] == realish
    assert isinstance(
        compat.DeltaTable.forPath(spark, f"{tmpdir}/mt_dispatch"),
        compat.DeltaTable,
    )

    # library absent: a bare _delta_log dir is NOT a ManagedTable —
    # loud error, never a silent empty facade
    monkeypatch.setattr(compat, "_real_delta_table", lambda: None)
    with pytest.raises(ValueError, match="no table at path"):
        compat.DeltaTable.forPath(spark, realish)
    assert isinstance(
        compat.DeltaTable.forPath(spark, f"{tmpdir}/mt_dispatch"),
        compat.DeltaTable,
    )


def test_real_delta_detection_matches_import():
    """_real_delta_table() must agree with actual importability —
    green both with and without the package."""
    from delta_lake_platform_spark.scd import compat

    try:
        import delta.tables  # noqa: F401

        installed = True
    except ImportError:
        installed = False
    assert (compat._real_delta_table() is not None) == installed
