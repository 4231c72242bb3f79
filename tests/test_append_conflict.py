"""Optimistic-concurrency conflict resolution for blind appends.

Delta's ConflictChecker lets an AppendOnly transaction that loses the
version race re-commit against the winner's snapshot WITHOUT re-running:
an append reads nothing, so it commutes with any commit that only
adds/removes files (other appends, DV deletes, file-level DML). It does
NOT commute with a commit that redefined the table (full-snapshot
overwrite / restore / schema change). Pinned here:

- a racing append retries the LOG ENTRY alone — its batch data is
  written exactly once, under a version-independent ``batch-`` dir;
- both appends' rows land; history shows both commits;
- a concurrent full-snapshot overwrite is a real conflict → raise;
- VACUUM reclaims a race-loser's orphaned batch dir once stale, but
  never a batch dir a log entry references.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.commit_protocol import (
    RenameCommitProtocol,
)
from delta_lake_platform_spark.sources.managed_table import (
    ConcurrentWriteError,
    ManagedTable,
)


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="appendrace_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


class _RacingProtocol(RenameCommitProtocol):
    """Runs ``interleave()`` once, just before the first log-entry
    create — deterministically simulating a writer that committed in
    our read-commit window — and counts data publications."""

    def __init__(self, interleave):
        self.interleave = interleave
        self.fired = False
        self.publishes = 0

    def publish_data(self, write, final_dir):
        self.publishes += 1
        return super().publish_data(write, final_dir)

    def create_entry(self, entry_path, payload):
        if not self.fired:
            self.fired = True
            self.interleave()
        super().create_entry(entry_path, payload)


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))


def test_racing_appends_both_commit_without_data_rewrite(spark, tmpdir):
    path = f"{tmpdir}/t"
    b = ManagedTable(spark, path)
    b.create(_batch(spark, 0, 10).coalesce(1))

    proto = _RacingProtocol(lambda: b.append(_batch(spark, 100, 110).coalesce(1)))
    a = ManagedTable(spark, path, protocol=proto)
    v = a.append(_batch(spark, 200, 210).coalesce(1))

    assert v == 2  # lost version 1 to b, re-committed at 2
    assert proto.publishes == 1  # the batch was written exactly once
    assert sorted(r.id for r in b.read().collect()) == (
        list(range(0, 10)) + list(range(100, 110)) + list(range(200, 210))
    )
    ops = [h["operation"] for h in b.history(2)]
    assert ops == ["APPEND", "APPEND"]
    # numOutputRows was recomputed against the WINNER's snapshot.
    assert b.history(1)[0]["operationMetrics"]["numOutputRows"] == 30


def test_append_racing_a_dv_delete_commits(spark, tmpdir):
    """A DV delete only references pre-existing files — a blind append
    commutes with it."""
    path = f"{tmpdir}/t"
    b = ManagedTable(spark, path)
    b.create(_batch(spark, 0, 10).coalesce(1))

    proto = _RacingProtocol(lambda: b.delete("id < 3", rewrite=False))
    a = ManagedTable(spark, path, protocol=proto)
    v = a.append(_batch(spark, 200, 210).coalesce(1))
    assert v == 2
    assert sorted(r.id for r in b.read().collect()) == (
        list(range(3, 10)) + list(range(200, 210))
    )


def test_append_racing_an_overwrite_conflicts(spark, tmpdir):
    """A full-snapshot overwrite claims to define the complete live file
    set — appending blindly on top would silently resurrect rows the
    overwrite semantics already replaced. Real conflict: raise."""
    path = f"{tmpdir}/t"
    b = ManagedTable(spark, path)
    b.create(_batch(spark, 0, 10).coalesce(1))

    proto = _RacingProtocol(
        lambda: b.overwrite(_batch(spark, 500, 505).coalesce(1))
    )
    a = ManagedTable(spark, path, protocol=proto)
    with pytest.raises(ConcurrentWriteError):
        a.append(_batch(spark, 200, 210).coalesce(1))
    # The loser's batch dir is unreferenced garbage; stale-aged, VACUUM
    # reclaims it — referenced batch dirs survive.
    b.append(_batch(spark, 600, 605).coalesce(1))
    data = os.path.join(path, "data")
    orphans = [
        d for d in os.listdir(data)
        if d.startswith("batch-")
        and os.path.join(data, d) not in b._state(b.latest_version())["dirs"]
    ]
    assert orphans  # the race loser left its dir
    for d in orphans:  # age it past the staging-retention floor
        os.utime(os.path.join(data, d), (1, 1))
    b.vacuum(keep_last=50)
    left = {d for d in os.listdir(data) if d.startswith("batch-")}
    assert not (left & set(orphans))
    referenced = {
        os.path.basename(d)
        for d in b._state(b.latest_version())["dirs"]
        if os.path.basename(d).startswith("batch-")
    }
    assert referenced <= left  # the committed append's dir survived
    assert sorted(r.id for r in b.read().collect()) == (
        list(range(500, 505)) + list(range(600, 605))
    )


def test_update_racing_a_blind_append_commits(spark, tmpdir):
    """WriteSerializable: a file-level UPDATE that read the pre-append
    snapshot commutes with a concurrent blind append — the appended
    files were never read and the update's removes can't name them. The
    update logically precedes the append, so appended rows are NOT
    updated even when they match the predicate."""
    path = f"{tmpdir}/t"
    b = ManagedTable(spark, path)
    # Multi-file so the update takes the file-level COW path (a
    # single-file table degrades to a full-snapshot commit, which is a
    # legitimate conflict).
    b.create(_batch(spark, 0, 10).repartitionByRange(2, "id"))

    proto = _RacingProtocol(lambda: b.append(_batch(spark, 100, 103).coalesce(1)))
    a = ManagedTable(spark, path, protocol=proto)
    v = a.update({"v": "v + 1000"}, "id >= 5", rewrite=True)
    assert v == 2
    got = {r.id: r.v for r in b.read().collect()}
    assert got[7] == 7 * 2 + 1000      # pre-append row updated
    assert got[101] == 101 * 2         # appended row untouched
    assert len(got) == 13
    # Row accounting recomputed against the winner's snapshot.
    assert b.history(1)[0]["operationMetrics"]["numOutputRows"] == 13
    assert b.row_count() == 13


def test_dml_racing_a_remove_bearing_commit_conflicts(spark, tmpdir):
    """Two file-level DMLs can rewrite the same files — removes by the
    winner are a real conflict for the loser (Delta's
    ConcurrentDeleteRead rule), never silently reordered."""
    path = f"{tmpdir}/t"
    b = ManagedTable(spark, path)
    b.create(_batch(spark, 0, 10).repartitionByRange(2, "id"))

    proto = _RacingProtocol(lambda: b.delete("id = 2", rewrite=True))
    a = ManagedTable(spark, path, protocol=proto)
    with pytest.raises(ConcurrentWriteError):
        a.update({"v": "v + 1"}, "id >= 0", rewrite=True)
    # The winner's delete stands; the loser changed nothing.
    assert sorted(r.id for r in b.read().collect()) == [i for i in range(10) if i != 2]


def test_threaded_concurrent_appends_all_commit(spark, tmpdir):
    """Real concurrency (not a simulated interleave): N threads, each
    its own table handle, appending in parallel. Every append must
    land exactly once — version clashes resolve through the
    entry-only retry — and the final row accounting must be exact."""
    from concurrent.futures import ThreadPoolExecutor

    path = f"{tmpdir}/t"
    ManagedTable(spark, path).create(_batch(spark, 0, 10).coalesce(1))

    def writer(k):
        t = ManagedTable(spark, path)
        for j in range(3):
            lo = 1000 * (k + 1) + 10 * j
            t.append(_batch(spark, lo, lo + 5).coalesce(1), fast=True)

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(writer, range(4)))

    t = ManagedTable(spark, path)
    assert t.latest_version() == 12  # create + 4x3 appends, no gaps
    assert t.read().count() == 10 + 12 * 5
    assert t.row_count() == 10 + 12 * 5  # log arithmetic survived races
    ops = {h["operation"] for h in t.history(12)}
    assert ops == {"APPEND"}


# --- the PRE-ATTEMPT window (r5 ADVICE #1) -----------------------------------
#
# A conflicting commit can land between the operation's SNAPSHOT READ
# and its first entry-create attempt (the whole scan/DV/batch-write
# window). The entry create then does NOT clash (the loser targets the
# next free version), so only the read_version-anchored commutes check
# can catch it. These interleaves fire INSIDE the operation body —
# earlier than _RacingProtocol's create_entry hook.


def _interleave_on(table, method_name, action):
    """Patch ``table.<method_name>`` to run ``action`` once before the
    real call — a deterministic writer landing mid-operation."""
    orig = getattr(table, method_name)
    state = {"fired": False}

    def wrapper(*args, **kwargs):
        if not state["fired"]:
            state["fired"] = True
            action()
        return orig(*args, **kwargs)

    setattr(table, method_name, wrapper)


def test_mor_delete_racing_mor_delete_conflicts(spark, tmpdir):
    """Two concurrent MOR deletes: the loser's full DV was built from
    the winner's PREDECESSOR — committing it would resurrect the
    winner's deleted rows. Must raise, and the winner's delete must
    survive."""
    path = f"{tmpdir}/t"
    b = ManagedTable(spark, path)
    b.create(_batch(spark, 0, 10).coalesce(1))

    a = ManagedTable(spark, path)
    _interleave_on(a, "_write_dv", lambda: b.delete("id < 3", rewrite=False))
    with pytest.raises(ConcurrentWriteError):
        a.delete("id >= 8", rewrite=False)
    # Winner's rows stay deleted; loser's predicate did NOT half-apply.
    assert sorted(r.id for r in b.read().collect()) == list(range(3, 10))


def test_mor_update_racing_mor_delete_conflicts(spark, tmpdir):
    path = f"{tmpdir}/t"
    b = ManagedTable(spark, path)
    b.create(_batch(spark, 0, 10).coalesce(1))

    a = ManagedTable(spark, path)
    _interleave_on(a, "_write_dv", lambda: b.delete("id = 0", rewrite=False))
    with pytest.raises(ConcurrentWriteError):
        a.update({"v": "v + 100"}, "id >= 5", rewrite=False)
    assert sorted(r.id for r in b.read().collect()) == list(range(1, 10))
    assert b.read().filter("v >= 100").count() == 0


def test_append_racing_overwrite_in_write_window_conflicts(spark, tmpdir):
    """An OVERWRITE landing while the append's batch is being written
    redefines the table — the append must fail even though its entry
    create does not clash."""
    path = f"{tmpdir}/t"
    b = ManagedTable(spark, path)
    b.create(_batch(spark, 0, 10).coalesce(1))

    a = ManagedTable(spark, path)
    _interleave_on(
        a,
        "_write_data_staged",
        lambda: b.overwrite(_batch(spark, 50, 55).coalesce(1)),
    )
    with pytest.raises(ConcurrentWriteError):
        a.append(_batch(spark, 200, 210).coalesce(1))
    assert sorted(r.id for r in b.read().collect()) == list(range(50, 55))


def test_mor_delete_racing_blind_append_commits(spark, tmpdir):
    """The pre-attempt check must NOT over-fire: a blind append in the
    window only adds files the DML never read — WriteSerializable says
    commit."""
    path = f"{tmpdir}/t"
    b = ManagedTable(spark, path)
    b.create(_batch(spark, 0, 10).coalesce(1))

    a = ManagedTable(spark, path)
    _interleave_on(
        a, "_write_dv", lambda: b.append(_batch(spark, 200, 205).coalesce(1))
    )
    v = a.delete("id < 3", rewrite=False)
    assert v == 2  # create(0), interleaved append(1), delete re-aimed at 2
    assert sorted(r.id for r in b.read().collect()) == (
        list(range(3, 10)) + list(range(200, 205))
    )


def test_threaded_mixed_appends_and_mor_deletes_stay_consistent(spark, tmpdir):
    """Real concurrency with a NON-commuting writer in the mix: three
    appender threads race one MOR-delete thread. Appends always
    commute; a delete whose window a conflicting commit invaded raises
    ConcurrentWriteError (never a silent lost delete). Invariants:
    every appended row lands exactly once, every delete that REPORTED
    success is fully applied (its rows stay gone), and the log's row
    accounting matches the data."""
    from concurrent.futures import ThreadPoolExecutor

    path = f"{tmpdir}/t"
    ManagedTable(spark, path).create(_batch(spark, 0, 100).coalesce(1))

    applied_deletes = []
    append_errors = []

    def appender(k):
        t = ManagedTable(spark, path)
        for j in range(3):
            lo = 10_000 * (k + 1) + 10 * j
            try:
                t.append(_batch(spark, lo, lo + 5).coalesce(1), fast=True)
            except ConcurrentWriteError as e:  # pragma: no cover
                append_errors.append(str(e))

    def deleter():
        t = ManagedTable(spark, path)
        for pivot in (10, 20, 30):
            try:
                t.delete(f"id >= {pivot} AND id < {pivot + 5}", rewrite=False)
                applied_deletes.append(pivot)
            except ConcurrentWriteError:
                pass  # legitimate: a non-commuting commit won the window

    with ThreadPoolExecutor(max_workers=4) as pool:
        futures = [pool.submit(appender, k) for k in range(3)]
        futures.append(pool.submit(deleter))
        for f in futures:
            f.result()

    t = ManagedTable(spark, path)
    assert not append_errors, append_errors  # appends always commute
    got_ids = sorted(r.id for r in t.read().collect())
    # Every appended row landed exactly once.
    expected_appended = sorted(
        x
        for k in range(3)
        for j in range(3)
        for x in range(10_000 * (k + 1) + 10 * j, 10_000 * (k + 1) + 10 * j + 5)
    )
    assert [i for i in got_ids if i >= 10_000] == expected_appended
    # Every delete that reported success is fully applied.
    for pivot in applied_deletes:
        gone = set(range(pivot, pivot + 5))
        assert not (gone & set(got_ids)), f"delete at {pivot} lost rows"
    # Log row accounting matches the actual data.
    assert t.row_count() == len(got_ids)


def test_optimize_racing_a_blind_append_commits(spark, tmpdir):
    """Bin-pack OPTIMIZE removes only its candidate files; a blind
    append that landed in the read-commit window adds disjoint files —
    commutes, entry retried alone, appended rows untouched."""
    path = f"{tmpdir}/t"
    b = ManagedTable(spark, path)
    b.create(_batch(spark, 0, 10).coalesce(1))
    b.append(_batch(spark, 50, 60).coalesce(1), fast=True)

    proto = _RacingProtocol(
        lambda: b.append(_batch(spark, 200, 210).coalesce(1), fast=True)
    )
    a = ManagedTable(spark, path, protocol=proto)
    v = a.optimize(min_file_size=1 << 30)
    assert v == 3  # lost version 2 to the append, re-committed at 3
    assert proto.publishes == 1  # compacted batch written exactly once
    assert sorted(r.id for r in b.read().collect()) == (
        list(range(0, 10)) + list(range(50, 60)) + list(range(200, 210))
    )
    # The racing append's rows survive even though OPTIMIZE rewrote
    # every file IT had read.
    assert b.read().filter("id >= 200").count() == 10


def test_optimize_racing_a_dml_conflicts(spark, tmpdir):
    """A DML that rewrote (or DV-masked) files OPTIMIZE also read is a
    real conflict — committing the compacted copies would resurrect
    the deleted rows."""
    path = f"{tmpdir}/t"
    b = ManagedTable(spark, path)
    b.create(_batch(spark, 0, 10).coalesce(1))
    b.append(_batch(spark, 50, 60).coalesce(1), fast=True)

    proto = _RacingProtocol(lambda: b.delete("id < 3", rewrite=False))
    a = ManagedTable(spark, path, protocol=proto)
    with pytest.raises(ConcurrentWriteError):
        a.optimize(min_file_size=1 << 30)
    # The winner's delete holds: rows stay gone.
    assert sorted(r.id for r in b.read().collect()) == (
        list(range(3, 10)) + list(range(50, 60))
    )
