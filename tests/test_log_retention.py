"""Log retention (Delta's ``logRetentionDuration``): JSON log entries
below the checkpoint horizon expire, so the log directory stops
growing O(#versions) while reads, appends, history, and conflict
retries keep working off checkpoints + retained entries."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import delta_lake_platform_spark.sources.managed_table as mt
from delta_lake_platform_spark.sources.managed_table import ManagedTable


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="logret_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _table_with_history(spark, tmpdir, n_extra=None) -> ManagedTable:
    """A table whose history crosses the checkpoint interval."""
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(spark.range(100).selectExpr("id", "id * 2 as v"))
    n = n_extra if n_extra is not None else mt._CKPT_INTERVAL + 3
    for i in range(n):
        t.append(
            spark.createDataFrame([(1000 + i, i)], "id long, v long").coalesce(1),
            fast=True,
        )
    return t


def test_expire_removes_only_pre_horizon_entries(spark, tmpdir):
    t = _table_with_history(spark, tmpdir)
    horizon = t._last_checkpoint_version()
    head = t.latest_version()
    removed = t.expire_log_entries(older_than_s=0)
    assert removed == list(range(0, horizon))
    # Entries at/after the horizon survive.
    for v in range(horizon, head + 1):
        assert os.path.isfile(t._entry_path(v))
    for v in removed:
        assert not os.path.isfile(t._entry_path(v))


def test_reads_appends_history_work_after_expiry(spark, tmpdir):
    t = _table_with_history(spark, tmpdir)
    head = t.latest_version()
    n = t.read().count()
    t.expire_log_entries(older_than_s=0)

    cold = ManagedTable(spark, t.path)  # fresh handle, cold caches
    assert cold.exists()
    assert cold.latest_version() == head
    assert cold.read().count() == n
    # history answers from the retained entries only
    hist = cold.history()
    assert {h["version"] for h in hist} == set(
        range(t._last_checkpoint_version(), head + 1)
    )
    # appends (and their conflict machinery) keep working
    cold.append(
        spark.createDataFrame([(9999, 9)], "id long, v long").coalesce(1),
        fast=True,
    )
    assert cold.read().count() == n + 1


def test_time_travel_to_checkpointed_version_survives_expiry(spark, tmpdir):
    t = _table_with_history(spark, tmpdir)
    horizon = t._last_checkpoint_version()
    expect = t.read(horizon).count()
    t.expire_log_entries(older_than_s=0)
    cold = ManagedTable(spark, t.path)
    assert cold.read(horizon).count() == expect
    # An expired version WITHOUT a checkpoint is gone — explicit error.
    with pytest.raises(FileNotFoundError, match="retention"):
        cold.read(1).count()


def test_expiry_honors_retention_window(spark, tmpdir):
    """Entries younger than the window survive even below the horizon."""
    t = _table_with_history(spark, tmpdir)
    removed = t.expire_log_entries(older_than_s=3600.0)
    assert removed == []  # everything committed seconds ago


def test_young_table_expires_nothing(spark, tmpdir):
    t = ManagedTable(spark, f"{tmpdir}/young")
    t.create(spark.range(5).selectExpr("id", "id as v"))
    assert t.expire_log_entries(older_than_s=0) == []
    assert t.exists() and t.read().count() == 5


def test_vacuum_reclaims_expired_unreferenced_version_dirs(spark, tmpdir):
    """After expiry the per-version vacuum loop can't see old versions;
    the orphan sweep reclaims their v= dirs when (a) no retained state
    references them and (b) they are old enough."""
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(spark.range(50).selectExpr("id", "id as v"))
    # Several full overwrites: each makes the PRIOR v= dir unreferenced.
    for i in range(mt._CKPT_INTERVAL + 2):
        t.overwrite(spark.range(50 + i).selectExpr("id", "id as v"))
    t.expire_log_entries(older_than_s=0)
    old_dir = os.path.join(t.path, "data", "v=0")
    assert os.path.isdir(old_dir)
    # Age the expired dir past the staging floor, then vacuum.
    os.utime(old_dir, (1, 1))
    t.vacuum(keep_last=2)
    assert not os.path.isdir(old_dir), "expired unreferenced dir leaked"
    # Live data untouched.
    assert t.read().count() == 50 + mt._CKPT_INTERVAL + 1


def test_vacuum_keeps_expired_dirs_still_referenced(spark, tmpdir):
    """A retained state can reference an expired version's dir (DV
    history carries dataPaths forward) — the sweep must keep it."""
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(spark.range(100).selectExpr("id", "id as v"))
    t.delete("id < 3", rewrite=False)  # DV: head references v=0's files
    for i in range(mt._CKPT_INTERVAL + 2):
        t.append(
            spark.createDataFrame([(500 + i, i)], "id long, v long").coalesce(1),
            fast=True,
        )
    t.expire_log_entries(older_than_s=0)
    base_dir = os.path.join(t.path, "data", "v=0")
    os.utime(base_dir, (1, 1))
    t.vacuum(keep_last=2)
    assert os.path.isdir(base_dir), "referenced base dir was reclaimed"
    assert t.read().filter("id < 3").count() == 0
    assert t.read().count() == 97 + mt._CKPT_INTERVAL + 2


def test_log_retention_property_expires_at_checkpoint(spark, tmpdir):
    """Delta's logRetentionDuration property: once set, checkpointing
    itself reclaims expired entries — no manual expire call."""
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(spark.range(10).selectExpr("id", "id as v"))
    t.set_property("logRetentionDuration", "interval 0 seconds")
    for i in range(2 * mt._CKPT_INTERVAL + 1):  # crosses two checkpoints
        t.append(
            spark.createDataFrame([(100 + i, i)], "id long, v long").coalesce(1),
            fast=True,
        )
    horizon = t._last_checkpoint_version()
    assert horizon is not None and horizon >= mt._CKPT_INTERVAL
    for v in range(0, horizon):
        assert not os.path.isfile(t._entry_path(v)), f"entry {v} survived"
    assert t.read().count() == 10 + 2 * mt._CKPT_INTERVAL + 1


def test_parse_duration_formats():
    from delta_lake_platform_spark.sources.managed_table import (
        _parse_duration_s,
    )

    assert _parse_duration_s("interval 30 days") == 30 * 86400.0
    assert _parse_duration_s("168 hours") == 168 * 3600.0
    assert _parse_duration_s("90 minutes") == 5400.0
    assert _parse_duration_s("3600") == 3600.0
    assert _parse_duration_s(None) is None
    assert _parse_duration_s("garbage") is None


def test_commit_timestamps_are_monotone(spark):
    """In-commit-timestamps contract: a backwards clock step must not
    produce a version whose timestamp precedes its predecessor's —
    TIMESTAMP AS OF / CDF windows / startingTimestamp all assume
    version order and time order agree."""
    import tempfile
    import time as _time
    from unittest import mock

    from delta_lake_platform_spark.sources import managed_table as mt

    d = tempfile.mkdtemp(prefix="ict_")
    t = mt.ManagedTable(spark, f"{d}/t")
    t.create(spark.range(5))
    real_time = _time.time
    skewed = real_time() - 3600  # clock stepped back an hour

    with mock.patch.object(mt.time, "time", lambda: skewed):
        t.append(spark.range(5, 8), fast=True)
    ts = {e["version"]: e["timestamp"] for e in t.history()}
    assert ts[1] > ts[0]
    # And a normal commit after the skewed one keeps ascending.
    t.append(spark.range(8, 9), fast=True)
    ts = {e["version"]: e["timestamp"] for e in t.history()}
    assert ts[2] > ts[1]
