"""The commit-publication seam (VERDICT r3 #6): ManagedTable's
atomicity primitives — data-dir publication + log-entry claim — behind
a protocol object, with a POSIX rename variant and an object-store
put-if-absent variant (S3 has no atomic rename), both driven through
the same table operations and concurrent-writer races."""

from __future__ import annotations

import os
import shutil
import tempfile
import time
from unittest.mock import patch

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.commit_protocol import (
    PutIfAbsentCommitProtocol,
    RenameCommitProtocol,
)
from delta_lake_platform_spark.sources.managed_table import (
    ConcurrentWriteError,
    ManagedTable,
    MergeClauses,
)

PROTOCOLS = [RenameCommitProtocol, PutIfAbsentCommitProtocol]


@pytest.fixture(params=PROTOCOLS, ids=lambda p: p.name)
def proto(request):
    return request.param


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="cproto_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _table(spark, tmpdir, proto) -> ManagedTable:
    t = ManagedTable(spark, f"{tmpdir}/t", protocol=proto())
    t.create(
        spark.range(100)
        .select("id", (F.col("id") * 2).alias("v"))
        .repartitionByRange(4, "id")
    )
    return t


def test_full_lifecycle_under_either_protocol(spark, tmpdir, proto):
    """create -> fast append -> DV delete -> file-level update ->
    time travel, identical observable behavior for both protocols."""
    t = _table(spark, tmpdir, proto)
    t.append(
        spark.createDataFrame([(1000, 1)], "id long, v long").coalesce(1),
        fast=True,
    )
    t.delete("id between 0 and 4", rewrite=False)  # DV
    t.update({"v": "v + 7"}, "id = 50", rewrite=True)  # file-level COW
    got = t.read()
    assert got.count() == 96
    assert got.filter("id = 50").first().v == 107
    assert got.filter("id < 5").count() == 0
    assert t.read(0).count() == 100  # time travel
    m = t.history(1)[0]["operationMetrics"]
    assert m["numRewrittenFiles"] == 1


def test_loser_never_clobbers_winner(spark, tmpdir, proto):
    """Stale writer claims the version a concurrent winner already
    committed: ConcurrentWriteError, winner's snapshot intact — under
    BOTH protocols (rename collision vs conditional-put collision)."""
    t = _table(spark, tmpdir, proto)
    other = ManagedTable(spark, t.path, protocol=proto())
    other.overwrite(spark.createDataFrame([(123, 0)], "id long, v long"))
    with patch.object(t, "latest_version", return_value=0):
        with pytest.raises(ConcurrentWriteError):
            t.overwrite(spark.createDataFrame([(-1, 0)], "id long, v long"))
    assert [r.id for r in other.read(1).collect()] == [123]
    assert t.overwrite(spark.createDataFrame([(9, 9)], "id long, v long")) == 2


def test_concurrent_merge_race(spark, tmpdir, proto):
    t = _table(spark, tmpdir, proto)
    other = ManagedTable(spark, t.path, protocol=proto())

    def merge(handle, val):
        return handle.merge(
            spark.createDataFrame([(5, val)], "id long, nv long"),
            MergeClauses(
                condition="target.id = updates.id",
                matched_update={"v": "updates.nv"},
            ),
            rewrite=True,
        )

    merge(other, -100)
    stale = {0: t._entry(0)}
    with patch.object(t, "latest_version", return_value=0), patch.object(
        t, "_entry", side_effect=lambda v: stale.get(v)
    ):
        with pytest.raises(ConcurrentWriteError):
            merge(t, -999)
    assert other.read(1).filter("id = 5").first().v == -100
    t2 = ManagedTable(spark, t.path, protocol=proto())
    assert merge(t2, -7) == 2
    assert t2.read().filter("id = 5").first().v == -7


def test_put_if_absent_publishes_without_rename(spark, tmpdir, monkeypatch):
    """The object-store variant must never rely on os.rename for data
    publication (S3 has none). Verified by making rename explode for
    table paths during the commit."""
    t = ManagedTable(
        spark, f"{tmpdir}/t", protocol=PutIfAbsentCommitProtocol()
    )
    real_rename = os.rename

    def guarded(src, dst, *a, **k):
        if str(src).startswith(t.path) and "_log" not in str(src):
            raise AssertionError(f"data publication used rename: {src}")
        return real_rename(src, dst, *a, **k)

    monkeypatch.setattr(os, "rename", guarded)
    t.create(spark.createDataFrame([(1, 2)], "id long, v long"))
    t.append(
        spark.createDataFrame([(3, 4)], "id long, v long").coalesce(1),
        fast=True,
    )
    monkeypatch.undo()
    assert t.read().count() == 2
    # The published dirs carry the writer-unique suffix and are
    # referenced by the log entries.
    assert all(".w-" in d for d in t._data_dirs(1))


def test_vacuum_reclaims_orphaned_writer_dirs(spark, tmpdir):
    """A `.w-` dir no log entry references (crashed/race-losing
    writer) is reclaimed once old; referenced ones survive."""
    t = _table(spark, tmpdir, PutIfAbsentCommitProtocol)
    live_dirs = set(t._data_dirs(t.latest_version()))
    orphan = os.path.join(t.path, "data", "v=7.w-deadbeef")
    os.makedirs(orphan)
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    t.vacuum(keep_last=1, older_than_s=3600)
    assert not os.path.isdir(orphan)
    assert all(os.path.isdir(d) for d in live_dirs)
    assert t.read().count() == 100


def test_entry_claim_is_atomic_with_content(tmpdir, proto):
    """A log entry must never be observable with partial content: the
    claim (exclusive create / conditional put) and the payload are ONE
    atomic event. Readers poll the latest entry the instant it exists
    (schema resolution, watermark scans); the pre-fix O_EXCL-then-write
    sequence exposed an empty/truncated JSON window that surfaced as a
    flaky JSONDecodeError in the 20-thread append race. A writer thread
    creates entries with a large payload while a reader json.loads each
    path the moment it appears — every observation must parse whole."""
    import json
    import threading

    p = proto()
    payload = json.dumps({"version": 0, "blob": "x" * 2_000_000})
    n, errs = 40, []
    paths = [os.path.join(tmpdir, f"log/{i:020d}.json") for i in range(n)]

    def reader():
        seen = 0
        deadline = time.time() + 30
        while seen < n and time.time() < deadline:
            path = paths[seen]
            if os.path.exists(path):
                try:
                    got = json.load(open(path))
                    assert len(got["blob"]) == 2_000_000
                except Exception as e:  # torn read observed
                    errs.append((path, repr(e)))
                seen += 1

    r = threading.Thread(target=reader)
    r.start()
    for path in paths:
        p.create_entry(path, payload)
    r.join()
    assert errs == []
    # the claim contract itself still holds: re-create loses
    from delta_lake_platform_spark.sources.commit_protocol import CommitError

    with pytest.raises(CommitError):
        p.create_entry(paths[0], payload)
    # and no tmp siblings leak
    leftovers = [f for f in os.listdir(os.path.join(tmpdir, "log")) if ".tmp-" in f]
    assert leftovers == []
