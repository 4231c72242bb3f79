"""Commit-log scale properties: delta-action entries, checkpoints, and
the ``_last_checkpoint`` pointer (Delta's transaction-log model — the
substrate the reference's engine commits through, scd_handler.py:48-55).

Pinned here (VERDICT r3 #1 'done' criteria):
- an incremental commit's log-entry size is O(changed files),
  independent of how many files the table holds;
- snapshot state replayed through a checkpoint equals the state
  replayed from the full log;
- once a checkpoint exists, ``latest_version()`` never lists the log
  directory;
- VACUUM never deletes a deletion-vector sidecar still referenced by a
  retained version (ADVICE r3 high), and never reaps fresh staging
  dirs even under shortened version retention (ADVICE r3 low).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import delta_lake_platform_spark.sources.managed_table as mt
from delta_lake_platform_spark.sources.managed_table import ManagedTable


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="commitlog_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _table(spark, tmpdir, name="t", n_files=8, n_rows=800) -> ManagedTable:
    t = ManagedTable(spark, f"{tmpdir}/{name}")
    t.create(
        spark.range(n_rows)
        .select("id", (F.col("id") * 10).alias("v"))
        .repartitionByRange(n_files, "id")
    )
    return t


def _entry_bytes(t: ManagedTable, v: int) -> int:
    return os.path.getsize(t._entry_path(v))


def test_append_entry_size_independent_of_table_file_count(spark, tmpdir):
    """A 1-row fast append into a 40-file table must not write more log
    metadata than the same append into a 4-file table — per-commit
    metadata is O(batch), never O(table)."""
    small = _table(spark, tmpdir, "small", n_files=4)
    big = _table(spark, tmpdir, "big", n_files=40, n_rows=4000)
    batch = spark.createDataFrame([(99999, 1)], "id long, v long").coalesce(1)
    small.append(batch, fast=True)
    big.append(batch, fast=True)
    assert _entry_bytes(big, 1) == pytest.approx(_entry_bytes(small, 1), abs=64)
    e = big._entry(1)
    assert e["logMode"] == "delta"
    assert "fileStats" not in e and "dataFiles" not in e
    assert len(e["add"]) == 1 and e["remove"] == []


def test_filelevel_dml_entry_size_is_o_changed_files(spark, tmpdir):
    """A file-level DELETE touching one file records one add + one
    remove — not the other 39 files."""
    t = _table(spark, tmpdir, n_files=40, n_rows=4000)
    t.delete("id between 100 and 101", rewrite=True)
    e = t._entry(1)
    assert e["logMode"] == "delta"
    assert len(e["remove"]) == 1
    assert len(e["add"]) <= 2
    assert _entry_bytes(t, 1) < 2048
    assert t.read().count() == 3998


def _commit_many(t: ManagedTable, spark, n: int):
    for i in range(n):
        t.append(
            spark.createDataFrame(
                [(1_000_000 + i, i)], "id long, v long"
            ).coalesce(1),
            fast=True,
        )


def test_checkpoint_written_at_interval_and_pointer_advances(spark, tmpdir):
    t = _table(spark, tmpdir)
    _commit_many(t, spark, mt._CKPT_INTERVAL + 2)
    ck = os.path.join(t._ckpt_dir, f"{mt._CKPT_INTERVAL}.parquet")
    assert os.path.isfile(ck)  # Delta's columnar checkpoint format
    assert t._last_checkpoint_version() == mt._CKPT_INTERVAL
    assert t.latest_version() == mt._CKPT_INTERVAL + 2


def test_checkpoint_replay_equals_full_log_replay(spark, tmpdir):
    """State resolved through the checkpoint must equal the state
    replayed from version 0 — including after file-level removals and
    a DV commit inside the checkpointed range."""
    t = _table(spark, tmpdir)
    t.delete("id between 10 and 12", rewrite=True)       # file-level remove
    t.delete("id = 500", rewrite=False)                  # DV commit
    _commit_many(t, spark, mt._CKPT_INTERVAL)            # cross the interval
    head = t.latest_version()
    assert t._last_checkpoint_version() is not None

    with_ckpt = t._state(head)

    # Fresh handle with checkpoints hidden: full-log replay.
    t2 = ManagedTable(spark, t.path)
    shutil.rmtree(t2._ckpt_dir)
    os.remove(os.path.join(t2._log_dir, "_last_checkpoint"))
    no_ckpt = t2._state(head)

    assert with_ckpt["files"] == no_ckpt["files"]
    assert with_ckpt["dv"] == no_ckpt["dv"]
    assert set(with_ckpt["dirs"]) == set(no_ckpt["dirs"])
    # And the table is readable + correct either way.
    assert t2.read().count() == 800 - 3 - 1 + mt._CKPT_INTERVAL


def test_latest_version_never_lists_log_dir_once_checkpointed(
    spark, tmpdir, monkeypatch
):
    t = _table(spark, tmpdir)
    _commit_many(t, spark, mt._CKPT_INTERVAL + 3)
    expected = mt._CKPT_INTERVAL + 3

    real_listdir = os.listdir

    def guarded(path="."):
        if os.path.normpath(str(path)) == os.path.normpath(t._log_dir):
            raise AssertionError("latest_version() listed the log dir")
        return real_listdir(path)

    monkeypatch.setattr(os, "listdir", guarded)
    assert t.latest_version() == expected
    # read() resolution also stays listing-free.
    monkeypatch.undo()
    assert t.read().count() == 800 + expected


def test_vacuum_keeps_dv_sidecar_referenced_by_retained_versions(spark, tmpdir):
    """ADVICE r3 (high): delete(rewrite=False) -> file-level UPDATE ->
    another commit -> vacuum(keep_last=2). The retained head still
    references dv/v=1; vacuum must not delete it — the table stays
    readable and DV-deleted rows stay gone."""
    t = _table(spark, tmpdir)
    t.delete("id between 0 and 9", rewrite=False)          # v1: DV
    t.update({"v": "v + 1"}, "id = 400", rewrite=True)     # v2: carries DV
    t.append(
        spark.createDataFrame([(9999, 0)], "id long, v long").coalesce(1),
        fast=True,
    )                                                       # v3: carries DV
    dv_dir = t._state(t.latest_version())["dv"]
    assert dv_dir is not None and os.path.isdir(dv_dir)
    t.vacuum(keep_last=2)
    assert os.path.isdir(dv_dir), "referenced DV sidecar was vacuumed"
    got = t.read()
    assert got.count() == 800 - 10 + 1
    assert got.filter("id between 0 and 9").count() == 0  # no resurrection


def test_vacuum_zero_retention_keeps_fresh_staging_dirs(spark, tmpdir):
    """ADVICE r3 (low): vacuum(older_than_s=0) shortens version
    retention but must NOT reap a fresh `.staged-` dir (a live writer
    may be mid-publish) — the staging floor is independent."""
    t = _table(spark, tmpdir)
    t.overwrite(t.read())  # v1 so vacuum has something to chew on
    fresh = os.path.join(t.path, "data", "v=50.staged-live")
    os.makedirs(fresh)
    t.vacuum(keep_last=1, older_than_s=0)
    assert os.path.isdir(fresh)


def test_clone_of_filelevel_table_references_only_live_files(spark, tmpdir):
    """A shallow clone of a file-level history must not resurrect
    rewritten files by re-expanding dirs."""
    t = _table(spark, tmpdir)
    t.delete("id between 100 and 105", rewrite=True)
    expect = sorted(r.id for r in t.read().collect())
    c = t.clone(f"{tmpdir}/c")
    assert sorted(r.id for r in c.read().collect()) == expect


def test_schema_recorded_in_log_and_reads_skip_inference(spark, tmpdir):
    """The snapshot schema is a log fact (Delta's metadata action):
    CREATE records it, delta commits carry it through replay and
    checkpoints, and every scan passes it to the reader explicitly —
    pinned by poisoning parquet schema inference and reading anyway."""
    t = _table(spark, tmpdir, n_files=4)
    assert json.load(open(t._entry_path(0)))["schema"] is not None
    t.append(
        spark.createDataFrame([(9001, 7)], "id long, v long").coalesce(1),
        fast=True,
    )
    t.delete("id = 1", rewrite=False)  # DV path
    v = t.latest_version()
    assert t._schema_of(t._state(v)) is not None
    expected = dict(t.read().dtypes)

    # read() must hand the recorded schema to every _scan call — a None
    # schema means the reader would fall back to footer inference.
    orig_scan = ManagedTable._scan

    def guarded(self, dirs, with_positions=False, schema=None, mapping=None,
                **kw):
        assert schema is not None, "scan ran without the log schema"
        return orig_scan(
            self, dirs, with_positions=with_positions, schema=schema,
            mapping=mapping, **kw,
        )

    ManagedTable._scan = guarded
    try:
        got = dict(t.read().dtypes)
    finally:
        ManagedTable._scan = orig_scan
    assert got == expected


def test_append_casts_batch_to_table_schema(spark, tmpdir):
    """Delta store-assignment semantics: a type-compatible batch is cast
    to the TABLE schema before write. Without the cast, a long batch
    into an int column writes INT64 files the recorded snapshot schema
    (int) can no longer read."""
    t = ManagedTable(spark, f"{tmpdir}/cast_t")
    t.create(
        spark.createDataFrame([(1, 10)], "id long, v int").coalesce(1)
    )
    t.append(
        spark.createDataFrame([(2, 20)], "id long, v long").coalesce(1),
        fast=True,
    )
    df = t.read()
    assert dict(df.dtypes)["v"] == "int"
    assert sorted(r["v"] for r in df.collect()) == [10, 20]


def test_parquet_checkpoint_roundtrip_and_json_fallback(spark, tmpdir):
    """The checkpoint is parquet (one row per file, snapshot fields in
    the footer metadata); a legacy JSON checkpoint still resolves."""
    t = _table(spark, tmpdir, n_files=4)
    t.delete("id = 1", rewrite=False)  # DV + schema in state
    _commit_many(t, spark, mt._CKPT_INTERVAL)
    v = mt._CKPT_INTERVAL
    ck = os.path.join(t._ckpt_dir, f"{v}.parquet")
    assert os.path.isfile(ck)
    fresh = ManagedTable(spark, t.path)
    from_ckpt = fresh._read_checkpoint(v)
    t_nock = ManagedTable(spark, t.path)
    shutil.rmtree(t_nock._ckpt_dir)
    os.remove(os.path.join(t_nock._log_dir, "_last_checkpoint"))
    replayed = t_nock._state(v)
    assert from_ckpt["files"] == replayed["files"]
    assert from_ckpt["dv"] == replayed["dv"]
    assert from_ckpt["schema"] == replayed["schema"]
    # Legacy JSON checkpoint for the same version resolves identically.
    os.makedirs(t._ckpt_dir, exist_ok=True)
    with open(os.path.join(t._ckpt_dir, f"{v}.json"), "w") as f:
        json.dump({"version": v, **replayed}, f)
    legacy = ManagedTable(spark, t.path)
    # The parquet checkpoint went with the rmtree above, so this read
    # exercises the JSON fallback.
    got = legacy._read_checkpoint(v)
    assert got["files"] == replayed["files"] and got["dv"] == replayed["dv"]


def test_clone_vacuum_never_touches_source_data(spark, tmpdir):
    """A shallow clone's log REFERENCES the source's data dirs; the
    clone diverging (full-snapshot compact) and vacuuming its own
    history must never delete anything under the SOURCE table's root
    (regression: vacuum once treated entry dataPaths as owned dirs)."""
    src = _table(spark, tmpdir, "src", n_files=4)
    c = src.clone(f"{tmpdir}/c")
    c.compact()  # clone head no longer references the source dirs
    expect = sorted(r.id for r in src.read().collect())
    c.vacuum(keep_last=1, older_than_s=0)
    assert sorted(r.id for r in src.read().collect()) == expect
    assert os.path.isdir(src._local_data_dir(0))


def test_mor_dv_sidecars_are_version_independent(spark, tmpdir):
    """NOTES debt (b): deletion vectors live under uuid dirs like batch
    dirs, so conflict retries and vacuum treat all transient artifacts
    uniformly."""
    t = _table(spark, tmpdir)
    t.delete("id < 5", rewrite=False)
    dv_dir = t._state(t.latest_version())["dv"]
    assert "/dv/dv-" in dv_dir.replace(os.sep, "/")
    assert t.read().count() == 795


def test_vacuum_reclaims_uuid_dv_of_removed_version(spark, tmpdir):
    """A uuid DV introduced by a vacuumed version and superseded by a
    full rewrite must be reclaimed (per-version loop follows the
    entry's pointer); an unreferenced orphan dv- dir is swept by age."""
    t = _table(spark, tmpdir)
    t.delete("id < 5", rewrite=False)                    # v1: uuid DV
    dv_dir = t._state(1)["dv"]
    t.overwrite(t.read())                                # v2: DV debt cleared
    t.overwrite(t.read())                                # v3
    assert os.path.isdir(dv_dir)
    t.vacuum(keep_last=2)
    assert not os.path.isdir(dv_dir), "superseded uuid DV leaked"
    # Orphan dv- dir (crashed writer): swept once old enough.
    orphan = os.path.join(t.path, "dv", "dv-deadbeef0000")
    os.makedirs(orphan)
    os.utime(orphan, (1, 1))
    t.vacuum(keep_last=2)
    assert not os.path.isdir(orphan)
    assert t.read().count() == 795
