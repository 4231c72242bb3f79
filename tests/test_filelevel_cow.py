"""File-level copy-on-write MERGE/UPDATE/DELETE: an N-row change into
an M-file table must rewrite only the files containing matched rows and
reference the rest untouched — Delta MergeIntoCommand's model
(reference scd_handler.py:48-53 runs on exactly that substrate).

The table fixture is range-laid-out on the key so key-local changes
provably live in few files; commit metrics (numRewrittenFiles /
numKeptFiles) pin the write amplification, and state equality against
an identical table driven through the full-snapshot path pins
correctness.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import (
    ManagedTable,
    MergeClauses,
)

N_FILES = 16
N_ROWS = 1600


def _base(spark):
    return (
        spark.range(N_ROWS)
        .select(
            "id",
            (F.col("id") % 7).alias("k"),
            (F.col("id") * 10).alias("v"),
        )
        .repartitionByRange(N_FILES, "id")
    )


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="fcow_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _table(spark, tmpdir, name) -> ManagedTable:
    t = ManagedTable(spark, f"{tmpdir}/{name}")
    t.create(_base(spark))
    return t


def _state(t: ManagedTable):
    return sorted(map(tuple, t.read().select("id", "k", "v").collect()))


def _narrow_merge(table, spark, rewrite=True):
    # 5 updates + 2 inserts, all keys in [100, 104] ∪ {99990, 99991}:
    # the update keys live in ONE of the 16 range files.
    src = spark.createDataFrame(
        [(i, -1) for i in range(100, 105)] + [(99990, -2), (99991, -2)],
        "id long, nv long",
    )
    return table.merge(
        src,
        MergeClauses(
            condition="target.id = updates.id",
            matched_update={"v": "updates.nv"},
            not_matched_insert={
                "id": "updates.id",
                "k": "updates.id % 7",
                "v": "updates.nv",
            },
        ),
        rewrite=rewrite,
    )


def test_merge_rewrites_only_touched_files(spark, tmpdir):
    t = _table(spark, tmpdir, "t")
    assert len(t._all_data_files(0)) == N_FILES
    v = _narrow_merge(t, spark)
    m = t.history(1)[0]["operationMetrics"]
    assert m["numTargetRowsUpdated"] == 5
    assert m["numTargetRowsInserted"] == 2
    assert m["numRewrittenFiles"] <= 2, m
    assert m["numKeptFiles"] >= N_FILES - 2, m
    assert m["numOutputRows"] == N_ROWS + 2

    # State equality vs the full-snapshot path on a twin table.
    full = ManagedTable(spark, f"{tmpdir}/full")
    full.create(_base(spark).coalesce(1))  # single file -> full path
    _narrow_merge(full, spark)
    assert _state(t) == _state(full)

    # Time travel: the pre-merge snapshot is intact.
    assert t.read(0).count() == N_ROWS
    assert t.read(v).count() == N_ROWS + 2


def test_merge_candidate_pruning_limits_the_join(spark, tmpdir):
    t = _table(spark, tmpdir, "t")
    src = spark.createDataFrame([(i, -1) for i in range(100, 105)], "id long, nv long")
    cand, all_files = t._merge_candidate_files(src, "target.id = updates.id", 0)
    assert len(all_files) == N_FILES
    assert len(cand) <= 2, "stats should prune the join to the key-range files"

    # An OR condition must disable pruning (soundness first).
    cand2, _ = t._merge_candidate_files(
        src, "target.id = updates.id OR target.k = updates.nv", 0
    )
    assert len(cand2) == N_FILES


def test_insert_only_merge_keeps_every_file(spark, tmpdir):
    t = _table(spark, tmpdir, "t")
    src = spark.createDataFrame([(99990, 1), (99991, 2)], "id long, nv long")
    t.merge(
        src,
        MergeClauses(
            condition="target.id = updates.id",
            not_matched_insert={
                "id": "updates.id",
                "k": "updates.nv",
                "v": "updates.nv",
            },
        ),
        rewrite=True,
    )
    m = t.history(1)[0]["operationMetrics"]
    assert m["numRewrittenFiles"] == 0
    assert m["numKeptFiles"] == N_FILES
    assert t.read().count() == N_ROWS + 2


def test_update_rewrites_only_matching_files(spark, tmpdir):
    t = _table(spark, tmpdir, "t")
    t.update({"v": "v + 1"}, "id between 200 and 205", rewrite=True)
    m = t.history(1)[0]["operationMetrics"]
    assert m["numUpdatedRows"] == 6
    assert m["numRewrittenFiles"] <= 2
    assert m["numKeptFiles"] >= N_FILES - 2
    got = {r.id: r.v for r in t.read().filter("id between 199 and 206").collect()}
    assert got == {199: 1990, **{i: i * 10 + 1 for i in range(200, 206)}, 206: 2060}
    assert t.read().count() == N_ROWS


def test_delete_rewrites_only_matching_files(spark, tmpdir):
    t = _table(spark, tmpdir, "t")
    t.delete("id between 300 and 309", rewrite=True)
    m = t.history(1)[0]["operationMetrics"]
    assert m["numDeletedRows"] == 10
    assert m["numRewrittenFiles"] <= 2
    assert m["numKeptFiles"] >= N_FILES - 2
    assert t.read().count() == N_ROWS - 10
    assert t.read().filter("id = 305").count() == 0
    assert t.read(0).count() == N_ROWS  # time travel intact


def test_filelevel_after_dv_commit_respects_deletions(spark, tmpdir):
    """A file-level COW op on a table with a live deletion vector must
    not resurrect DV-deleted rows — neither in rewritten files nor in
    kept ones."""
    t = _table(spark, tmpdir, "t")
    t.delete("id between 100 and 109", rewrite=False)  # DV commit
    assert t.read().count() == N_ROWS - 10
    t.update({"v": "0 - v"}, "id between 105 and 115", rewrite=True)
    m = t.history(1)[0]["operationMetrics"]
    assert m["numUpdatedRows"] == 6  # 110..115 (100..109 are DV-deleted)
    assert t.read().count() == N_ROWS - 10
    got = {r.id: r.v for r in t.read().filter("id between 100 and 116").collect()}
    assert set(got) == set(range(110, 117))
    assert got[110] == -1100 and got[115] == -1150 and got[116] == 1160


def test_chained_filelevel_ops_and_vacuum(spark, tmpdir):
    """Several file-level commits in sequence, then VACUUM: files still
    referenced by the retained head (including individually referenced
    ones from older dirs) must survive; the table must stay readable."""
    t = _table(spark, tmpdir, "t")
    _narrow_merge(t, spark)
    t.update({"v": "v + 5"}, "id between 500 and 503", rewrite=True)
    t.delete("id between 700 and 701", rewrite=True)
    expect = _state(t)
    removed = t.vacuum(keep_last=1, older_than_s=0)
    assert _state(t) == expect
    assert t.detail()["numFiles"] >= N_FILES - 3
    # The original v=0 dir still holds referenced (kept) files, so it
    # must not have been removed wholesale.
    assert 0 not in removed


def _ptable(spark, tmpdir, name="pt") -> ManagedTable:
    t = ManagedTable(spark, f"{tmpdir}/{name}")
    t.create(
        spark.range(100).select(
            "id", (F.col("id") % 4).alias("p"), (F.col("id") * 2).alias("v")
        ),
        partition_by=["p"],
    )
    return t


def test_partitioned_merge_rewrites_only_touched_partition(spark, tmpdir):
    """File-level COW composes with hive partitioning (VERDICT r3 #2):
    a 1-key merge into a 4-partition table rewrites files in exactly
    one partition; untouched partitions stay referenced; partition
    columns survive the basePath scan."""
    t = _ptable(spark, tmpdir)
    n_files = len(t._all_data_files(0))
    src = spark.createDataFrame([(3, -1)], "id long, nv long")
    clauses = MergeClauses(
        condition="target.id = updates.id",
        matched_update={"v": "updates.nv"},
    )
    t.merge(src, clauses, rewrite=True)
    m = t.history(1)[0]["operationMetrics"]
    assert m["numRewrittenFiles"] == 1, m
    assert m["numKeptFiles"] == n_files - 1, m
    # Rewritten file landed under its hive partition in the batch dir.
    import glob as _glob
    import os as _os

    batch_dir = t._data_dirs(1)[-1]
    assert _os.path.basename(batch_dir).startswith("batch-")
    assert _glob.glob(_os.path.join(batch_dir, "p=3", "*.parquet"))
    got = t.read()
    assert got.columns == ["id", "p", "v"]  # declared order restored
    assert got.filter("id = 3").first().v == -1
    assert got.count() == 100
    assert t.read(0).filter("id = 3").first().v == 6  # time travel intact

    # State equality vs a full-rewrite twin (single-file -> full path).
    full = ManagedTable(spark, f"{tmpdir}/full")
    full.create(
        spark.range(100)
        .select("id", (F.col("id") % 4).alias("p"), (F.col("id") * 2).alias("v"))
        .coalesce(1)
    )
    full.merge(src, clauses, rewrite=True)
    assert sorted(map(tuple, t.read().collect())) == sorted(
        map(tuple, full.read().select("id", "p", "v").collect())
    )


def test_partitioned_filelevel_delete_and_update(spark, tmpdir):
    t = _ptable(spark, tmpdir)
    n_files = len(t._all_data_files(0))
    # Partition-column predicate: candidate files prune to p=2 only.
    t.delete("p = 2 and id < 20", rewrite=True)
    m = t.history(1)[0]["operationMetrics"]
    assert m["numDeletedRows"] == 5  # ids 2,6,10,14,18
    # Rewrites confined to partition p=2's files (maybe >1 file/dir).
    assert 1 <= m["numRewrittenFiles"] <= 2
    assert m["numRewrittenFiles"] + m["numKeptFiles"] == n_files
    import glob as _glob
    import os as _os

    batch_parts = {
        _os.path.basename(_os.path.dirname(f))
        for f in _glob.glob(
            _os.path.join(t._local_data_dir(1), "*", "*.parquet")
        )
    }
    assert batch_parts <= {"p=2"}, batch_parts
    t.update({"v": "v + 1000"}, "id = 97", rewrite=True)  # p=1
    m = t.history(1)[0]["operationMetrics"]
    assert m["numUpdatedRows"] == 1 and m["numRewrittenFiles"] == 1
    got = t.read()
    assert got.count() == 95
    assert got.filter("id = 97").first().v == 97 * 2 + 1000
    assert got.filter("p = 2 and id < 20").count() == 0
    # SHOW PARTITIONS-style readback still sees all partitions.
    assert got.select("p").distinct().count() == 4


def test_compact_where_rewrites_only_matching_files(spark, tmpdir):
    """OPTIMIZE WHERE: the predicate's files are rewritten (into fewer
    files, DV debt materialized); everything else is referenced
    untouched. Same rows before and after."""
    t = _table(spark, tmpdir, "t")
    t.delete("id between 100 and 104", rewrite=False)  # DV debt in one file
    before = _state(t)
    t.compact_where("id < 200", target_partitions=1)
    m = t.history(1)[0]["operationMetrics"]
    assert m["numRewrittenFiles"] <= 2
    assert m["numKeptFiles"] >= N_FILES - 2
    assert _state(t) == before
    assert t.read().filter("id = 102").count() == 0  # DV still honored


def test_bloom_index_covers_kept_files_after_filelevel_merge(spark, tmpdir):
    """build_bloom_index on a file-level-commit version must index the
    individually referenced (kept) files too, not just the batch dir."""
    import json

    t = _table(spark, tmpdir, "t")
    _narrow_merge(t, spark)
    v = t.latest_version()
    info = t.build_bloom_index(["id"], version=v)
    assert info["numFiles"] >= N_FILES  # kept files + new batch file(s)
    with open(t._bloom_path(v)) as f:
        idx = json.load(f)
    kept = set(t._referenced_files(v))
    import os

    rels = {os.path.relpath(p, t.path) for p in kept}
    assert rels <= set(idx["files"]), "kept files missing from bloom index"


def test_vacuum_reclaims_stale_staging_dirs(spark, tmpdir):
    """A crashed writer's `.staged-*` dir (no log entry references it)
    is reclaimed by VACUUM once old; a fresh one (possibly a live
    writer mid-publish) is kept."""
    import os
    import time

    t = _table(spark, tmpdir, "t")
    data_parent = os.path.join(t.path, "data")
    stale = os.path.join(data_parent, "v=99.staged-deadbeef")
    fresh = os.path.join(data_parent, "v=98.staged-cafecafe")
    os.makedirs(stale)
    os.makedirs(fresh)
    old = time.time() - 7200
    os.utime(stale, (old, old))
    t.vacuum(keep_last=1, older_than_s=3600)
    assert not os.path.isdir(stale)
    assert os.path.isdir(fresh)
    assert t.read().count() == N_ROWS  # table untouched
