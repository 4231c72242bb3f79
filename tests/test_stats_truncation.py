"""String min/max stats truncation audit (r7 task #5).

Parquet writers MAY truncate binary min/max in the footer (parquet-mr
``parquet.statistics.truncate.length``); a truncated max returned as
``MAX(col)`` would be silently wrong. The writer Spark actually uses
here (parquet-mr via the Spark parquet sink) is EXACT-OR-ABSENT:
values up to ~2 KB get exact footer stats, and once a value exceeds
parquet-mr's ``MAX_STATS_SIZE`` (4096 bytes) the column's stats are
OMITTED from the footer entirely — never truncated-inexact. Both
shapes are sound for the metadata fast paths:

- exact stats -> ``stats_min_max`` returns the true extrema;
- absent stats -> ``stats_min_max`` returns None and SQL MIN/MAX
  falls back to the scan.

These tests pin that contract. If a writer upgrade starts emitting
truncated (prefix) stats, the multi-KB exactness assertion here goes
red and ``_footer_stats_one`` must learn to drop inexact string
bounds (parquet's is_{min,max}_value_exact flags)."""

from __future__ import annotations

import os
import tempfile

import pytest

from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.sql import PlatformSQL


def _mk(spark, rows):
    d = tempfile.mkdtemp(prefix="stats_trunc_")
    t = ManagedTable(spark, os.path.join(d, "t"))
    t.create(
        spark.createDataFrame(rows, "id long, s string").coalesce(1)
    )
    return t


def test_multikb_string_stats_exact_or_absent(spark):
    """The load-bearing audit: for every value size, the recorded
    bounds are either EXACTLY the true extrema or not recorded at all.
    A prefix-truncated bound would be returned as MIN/MAX verbatim —
    that shape must never reach the commit log."""
    for n in (50, 1000, 2000, 5000, 10000):
        lo, hi = "a" * n + "LOW", "z" * n + "HIGH"
        t = _mk(spark, [(1, lo), (2, "middle"), (3, hi)])
        mm = t.stats_min_max("s")
        assert mm is None or mm == (lo, hi), (n, mm and (len(mm[0]), len(mm[1])))


def test_multikb_string_minmax_sql_falls_back_to_scan(spark):
    """End-to-end: 5 KB strings have no footer stats, so the SQL
    metadata-aggregate path must decline and the scan must still
    answer exactly."""
    lo, hi = "a" * 5000 + "LOW", "z" * 5000 + "HIGH"
    t = _mk(spark, [(1, lo), (2, "middle"), (3, hi)])
    assert t.stats_min_max("s") is None  # pins the absent-stats shape
    p = PlatformSQL(spark)
    p.register("t", t)
    row = p.sql("SELECT MIN(s) AS lo, MAX(s) AS hi FROM t").first()
    assert (row.lo, row.hi) == (lo, hi)


def test_short_string_minmax_metadata_only(spark, monkeypatch):
    """Short strings keep exact stats and the aggregate answers from
    the log alone — the positive path the audit must not regress."""
    t = _mk(spark, [(1, "apple"), (2, "pear"), (3, "zebra")])
    p = PlatformSQL(spark)
    p.register("t", t)

    def no_scan(self, *a, **kw):
        raise AssertionError("short-string MIN/MAX must not scan")

    monkeypatch.setattr(ManagedTable, "read", no_scan)
    row = p.sql("SELECT MIN(s) AS lo, MAX(s) AS hi FROM t").first()
    monkeypatch.undo()
    assert (row.lo, row.hi) == ("apple", "zebra")


def test_partial_rowgroup_stats_drop_whole_file_bounds(spark):
    """A file where ONE row group lacks min/max for a column (multi-KB
    values) must not record the other row groups' bounds as whole-file
    bounds: range pruning would skip rows hiding in the stats-less row
    group. An all-NULL row group, by contrast, contributes no values
    and must NOT poison the bounds."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from delta_lake_platform_spark.sources.managed_table import (
        _footer_stats_one,
    )

    d = tempfile.mkdtemp(prefix="stats_partial_")
    big = "z" * 5000  # beyond parquet-mr/arrow stats size: no min/max
    tbl = pa.table({
        "id": [1, 2, 3, 4],
        "s": ["b", "c", big, big],
    })
    fp = os.path.join(d, "part-0.parquet")
    pq.write_table(tbl, fp, row_group_size=2)
    md = pq.ParquetFile(fp).metadata
    assert md.num_row_groups == 2
    # Fixture contract: the big-string row group really has no bounds.
    st_big = md.row_group(1).column(1).statistics
    assert st_big is None or not st_big.has_min_max
    n, cols = _footer_stats_one(fp, d)
    assert n == 4
    assert cols["id"] == [1, 4]       # fully-stat'd column keeps bounds
    assert "s" not in cols, cols.get("s")  # partial bounds are unsound

    # All-NULL row group: value bounds from the other row group ARE
    # whole-file value bounds (min/max exclude NULLs by definition).
    tbl2 = pa.table({
        "id": [1, 2, 3, 4],
        "s": ["b", "c", None, None],
    })
    fp2 = os.path.join(d, "part-1.parquet")
    pq.write_table(tbl2, fp2, row_group_size=2)
    n2, cols2 = _footer_stats_one(fp2, d)
    assert n2 == 4
    assert cols2["s"] == ["b", "c"]
    assert cols2["__nullCounts"]["s"] == 2
