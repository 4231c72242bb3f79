"""Table protocol gating (Delta's protocol action): commits that first
use a feature record a reader/writer version bump; readers and writers
beyond their supported level fail LOUDLY instead of misreading —
an old reader ignoring deletion vectors would resurrect deleted rows."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

import delta_lake_platform_spark.sources.managed_table as mt
from delta_lake_platform_spark.sources.managed_table import (
    ManagedTable,
    TableFeatureError,
)


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="proto_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _t(spark, tmpdir):
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(spark.range(10).selectExpr("id", "id * 2 as v"))
    return t


def test_base_table_has_no_protocol_requirement(spark, tmpdir):
    t = _t(spark, tmpdir)
    assert t._state(t.latest_version()).get("protocol") is None


def test_dv_commit_bumps_protocol_once(spark, tmpdir):
    t = _t(spark, tmpdir)
    v1 = t.delete("id = 1", rewrite=False)
    proto = t._state(v1)["protocol"]
    assert proto == {"minReaderVersion": 3, "minWriterVersion": 3}
    assert t._entry(v1)["protocol"] == proto
    # Second DV commit: table already at level — no repeated action.
    v2 = t.delete("id = 2", rewrite=False)
    assert "protocol" not in t._entry(v2)
    assert t._state(v2)["protocol"] == proto


def test_rename_bumps_protocol_for_column_mapping(spark, tmpdir):
    t = _t(spark, tmpdir)
    v = t.alter_rename_column("v", "value")
    proto = t._state(v)["protocol"]
    assert proto["minReaderVersion"] == 2
    # A later DV commit raises it further (elementwise max).
    v2 = t.delete("id = 1", rewrite=False)
    assert t._state(v2)["protocol"]["minReaderVersion"] == 3


def test_future_reader_version_blocks_reads(spark, tmpdir):
    t = _t(spark, tmpdir)
    # Hand-craft a table requiring a reader this library doesn't have.
    v = t.latest_version() + 1
    entry = {
        "version": v,
        "timestamp": 0,
        "operation": "FUTURE FEATURE",
        "operationMetrics": {},
        "logMode": "delta",
        "add": {},
        "remove": [],
        "addPaths": [],
        "protocol": {"minReaderVersion": 99, "minWriterVersion": 99},
    }
    with open(t._entry_path(v), "w") as f:
        json.dump(entry, f)
    cold = ManagedTable(spark, t.path)
    with pytest.raises(TableFeatureError, match="reader version 99"):
        cold.read().count()
    # Time travel BEFORE the upgrade still works (per-version protocol).
    assert cold.read(0).count() == 10


def test_future_writer_version_blocks_commits(spark, tmpdir):
    t = _t(spark, tmpdir)
    v = t.latest_version() + 1
    entry = {
        "version": v,
        "timestamp": 0,
        "operation": "FUTURE FEATURE",
        "operationMetrics": {},
        "logMode": "delta",
        "add": {},
        "remove": [],
        "addPaths": [],
        "protocol": {
            "minReaderVersion": mt.SUPPORTED_READER_VERSION,
            "minWriterVersion": 99,
        },
    }
    with open(t._entry_path(v), "w") as f:
        json.dump(entry, f)
    cold = ManagedTable(spark, t.path)
    assert cold.read().count() == 10  # readable...
    with pytest.raises(TableFeatureError, match="writer version 99"):
        cold.append(
            spark.createDataFrame([(50, 0)], "id long, v long"), fast=True
        )
    with pytest.raises(TableFeatureError, match="writer version 99"):
        cold.overwrite(cold.read())


def test_protocol_survives_checkpoint_replay(spark, tmpdir):
    t = _t(spark, tmpdir)
    t.delete("id = 1", rewrite=False)  # bump to 3
    for i in range(mt._CKPT_INTERVAL + 2):
        t.append(
            spark.createDataFrame([(100 + i, i)], "id long, v long").coalesce(1),
            fast=True,
        )
    assert t._last_checkpoint_version() is not None
    cold = ManagedTable(spark, t.path)
    proto = cold._state(cold.latest_version())["protocol"]
    assert proto == {"minReaderVersion": 3, "minWriterVersion": 3}
