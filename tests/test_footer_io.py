"""Commit-time footer I/O is O(changed files), not O(table).

At 100 TB a table has millions of files; any per-commit driver loop
over all of them is a scale killer (VERDICT r2 #3). These tests pin:
- an incremental append into an M-file table reads exactly the batch's
  footers (stats for existing files come from the prior log entry);
- a DV delete reads no data-file footers at all (row arithmetic comes
  from the prior entry's metrics);
- a large full-snapshot commit fans its footer pass out over Spark and
  still records complete, correct stats.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import delta_lake_platform_spark.sources.managed_table as mt
from delta_lake_platform_spark.sources.managed_table import (
    ManagedTable,
    MergeClauses,
)


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="footio_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture
def counted(monkeypatch):
    """Count driver-side per-file footer reads."""
    calls: list[str] = []
    orig = mt._footer_stats_one

    def counting(fpath, data_dir):
        calls.append(fpath)
        return orig(fpath, data_dir)

    monkeypatch.setattr(mt, "_footer_stats_one", counting)
    return calls


def _table(spark, tmpdir, n_files=40) -> ManagedTable:
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(
        spark.range(4000)
        .select("id", (F.col("id") * 3).alias("v"))
        .repartitionByRange(n_files, "id")
    )
    return t


def test_fast_append_reads_only_batch_footers(spark, tmpdir, counted):
    t = _table(spark, tmpdir)
    assert len(t._all_data_files(0)) == 40
    counted.clear()
    t.append(
        spark.createDataFrame([(99999, 1)], "id long, v long").coalesce(1),
        fast=True,
    )
    assert len(counted) == 1, counted  # exactly the new file's footer


def test_dv_delete_reads_no_data_footers(spark, tmpdir, counted):
    t = _table(spark, tmpdir)
    counted.clear()
    t.delete("id between 10 and 20", rewrite=False)
    # Only the freshly written DV sidecar's footers are read (its row
    # count); none of the 40 data files.
    data_files = set(t._all_data_files(0))
    assert not (set(counted) & data_files), sorted(set(counted) & data_files)
    assert len(counted) <= 2
    m = t.history(1)[0]["operationMetrics"]
    assert m["numDeletedRows"] == 11
    assert m["numOutputRows"] == 4000 - 11


def test_filelevel_merge_reads_only_rewritten_footers(spark, tmpdir, counted):
    t = _table(spark, tmpdir)
    counted.clear()
    src = spark.createDataFrame([(500, -1), (501, -1)], "id long, nv long")
    t.merge(
        src,
        MergeClauses(
            condition="target.id = updates.id",
            matched_update={"v": "updates.nv"},
        ),
        rewrite=True,
    )
    data_files = set(t._all_data_files(0))
    # Footer reads are confined to the new batch dir (the rewritten
    # file), never the 40 pre-existing files.
    assert not (set(counted) & data_files)
    assert 1 <= len(counted) <= 4
    m = t.history(1)[0]["operationMetrics"]
    assert m["numRewrittenFiles"] == 1 and m["numTargetRowsUpdated"] == 2


def test_large_snapshot_footer_pass_is_distributed_and_complete(spark, tmpdir):
    """Above the threshold the footer pass runs as a Spark job; the
    recorded stats must be complete and usable for pruning either way."""
    n_files = mt._DISTRIBUTED_FOOTERS_AT + 8
    t = ManagedTable(spark, f"{tmpdir}/big")
    t.create(
        spark.range(n_files * 50)
        .select("id", (F.col("id") % 9).alias("k"))
        .repartitionByRange(n_files, "id")
    )
    entry = t.history(1)[0]
    assert len(entry["fileStats"]) == n_files
    assert entry["operationMetrics"]["numOutputRows"] == n_files * 50
    kept, total = t.prune_files("id", 0, 10)
    assert total == n_files and len(kept) <= 2
