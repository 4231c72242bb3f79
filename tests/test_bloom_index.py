"""Bloom-filter file index: point-lookup skipping where min/max can't.

Two files whose high-cardinality string ids fully interleave (every
file's [min,max] spans every probe) — range stats keep both files for
any equality probe; the bloom index prunes to the one file that can
contain the value, with zero false negatives.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable


@pytest.fixture
def table(spark):
    d = tempfile.mkdtemp(prefix="bloom_")
    t = ManagedTable(spark, f"{d}/t")
    # File 1: even ids; file 2: odd ids — [min,max] of the uid column
    # overlaps completely between the files.
    evens = spark.range(0, 2000, 2).select(
        F.format_string("user_%06d", F.col("id")).alias("uid"),
        (F.col("id") * 10).alias("score"),
    ).coalesce(1)
    odds = spark.range(1, 2000, 2).select(
        F.format_string("user_%06d", F.col("id")).alias("uid"),
        (F.col("id") * 10).alias("score"),
    ).coalesce(1)
    t.create(evens)
    t.append(odds, fast=True)
    yield t
    shutil.rmtree(d, ignore_errors=True)


def test_minmax_alone_cannot_prune_interleaved_ids(table):
    kept, total = table.prune_files("uid", "user_000401", "user_000401")
    assert total == 2 and len(kept) == 2  # ranges overlap: nothing pruned


def test_bloom_prunes_to_one_file(table):
    table.build_bloom_index(["uid"])
    kept, total = table.prune_files_eq("uid", "user_000401")  # odd -> file 2
    assert total == 2
    assert len(kept) == 1, "bloom should rule out the even-ids file"
    rows = table.read_pruned_eq("uid", "user_000401").collect()
    assert len(rows) == 1 and rows[0].score == 4010


def test_bloom_never_false_negative(table):
    table.build_bloom_index(["uid"])
    for i in (0, 1, 500, 999, 1998, 1999):
        uid = f"user_{i:06d}"
        got = table.read_pruned_eq("uid", uid).collect()
        want = table.read().filter(F.col("uid") == uid).collect()
        assert len(got) == len(want) == 1, uid
        assert got[0].score == want[0].score


def test_absent_value_prunes_everything_or_reads_empty(table):
    table.build_bloom_index(["uid"])
    assert table.read_pruned_eq("uid", "user_999999").count() == 0


def test_bloom_keys_are_table_root_relative(table):
    """Sidecar keys must include the data-dir component: two data dirs
    holding files with the same dir-relative basename would otherwise
    alias each other's blooms and produce false-negative prunes."""
    import json
    import os

    table.build_bloom_index(["uid"])
    v = table.latest_version()
    with open(table._bloom_path(v)) as f:
        idx = json.load(f)
    assert idx["files"], "index is empty"
    for key in idx["files"]:
        # Every key carries its data dir (data/v=N/... or a
        # version-independent append batch dir), so same-named files in
        # different dirs get distinct keys.
        assert key.startswith("data/v=") or key.startswith("data/batch-"), key
    # And the reader resolves those keys: pruning still works.
    kept, total = table.prune_files_eq("uid", "user_000400")
    assert total == 2 and len(kept) == 1


def test_prior_bloom_keeps_serving_after_append(table):
    """Data files are immutable (and rel paths never reused), so the
    bloom built at version v stays EXACT for surviving files at v+k:
    the prior sidecar keeps pruning them, while the newly appended file
    (no bloom entry) is conservatively kept — never a false negative,
    and one build serves an append-only table indefinitely."""
    table.build_bloom_index(["uid"])
    table.append(
        table.spark.createDataFrame([("user_777777", 1)], "uid string, score long"),
        fast=True,
    )
    kept, total = table.prune_files_eq("uid", "user_000400")
    range_kept, _ = table.prune_files("uid", "user_000400", "user_000400")
    # The carried-forward bloom prunes the interleaved old files the
    # range prune alone cannot discriminate.
    assert len(kept) < len(range_kept), "prior bloom not consulted"
    assert table.read_pruned_eq("uid", "user_000400").count() == 1
    # And a probe for the NEW file's value still finds it (its file has
    # no bloom entry -> conservatively kept).
    assert table.read_pruned_eq("uid", "user_777777").count() == 1


def test_bloom_property_maintains_index_across_appends(table):
    """r5: with bloomFilterColumns set, every append extends the
    sidecar with the new batch's blooms — pruning stays exact for new
    files too, no rebuild ever needed."""
    table.build_bloom_index(["uid"])
    table.set_property("bloomFilterColumns", "uid")
    table.append(
        table.spark.createDataFrame(
            [("user_888888", 1)], "uid string, score long"
        ),
        fast=True,
    )
    table.append(
        table.spark.createDataFrame(
            [("user_999999", 2)], "uid string, score long"
        ),
        fast=True,
    )
    idx = table._bloom_index(table.latest_version())
    # Both new batch files gained entries.
    assert sum(1 for rel in idx["files"] if "batch-" in rel) >= 3  # odds + 2 new
    # A probe for one new value keeps ONLY files whose bloom can hold
    # it: the other new file and both interleaved old files are pruned.
    kept, total = table.prune_files_eq("uid", "user_888888")
    assert len(kept) == 1
    assert table.read_pruned_eq("uid", "user_888888").count() == 1
    # Absent value: everything bloom-prunable is pruned.
    kept2, _ = table.prune_files_eq("uid", "user_777000")
    assert len(kept2) == 0
    assert table.read_pruned_eq("uid", "user_777000").count() == 0


def test_bloom_probe_skipped_for_unsafe_types(spark):
    """Timestamps/binary/decimals stringify DIFFERENTLY on the build
    side (pyarrow to_pylist: tz-aware UTC datetimes, bytes) vs the
    probe side (Spark collect: naive session-tz datetimes, bytearray).
    Hashing str(value) on both sides would bloom-prune the file that
    actually holds the value — a false negative. Probes on those types
    must skip the bloom and fall back to range pruning (conservative,
    still exact)."""
    import shutil as _shutil
    import tempfile as _tempfile

    d = _tempfile.mkdtemp(prefix="bloom_ts_")
    t = ManagedTable(spark, f"{d}/t")
    df = spark.sql(
        "SELECT timestamp'2024-03-01 12:30:00' AS ts, "
        "CAST('payload' AS BINARY) AS blob, 1 AS x"
    )
    t.create(df.coalesce(1))
    t.build_bloom_index(["ts", "blob"])
    # Probe with values exactly as a query layer obtains them: collected
    # from Spark (naive datetime / bytearray).
    row = t.read().first()
    for col in ("ts", "blob"):
        kept, total = t.prune_files_eq(col, row[col])
        assert len(kept) == total == 1, (
            f"bloom false negative on {col}: probe-side str() differs "
            "from build-side str()"
        )
        got = t.read_pruned_eq(col, row[col]).collect()
        assert len(got) == 1
    # The actual failure shape: a tz-aware probe for the same instant
    # (what pyarrow yields when the footer says isAdjustedToUTC, and
    # what any non-UTC session tz produces) stringifies with an offset
    # suffix. Without the type guard the bloom prunes the file that
    # holds the row.
    import datetime as _dt

    aware = row["ts"].replace(tzinfo=_dt.timezone.utc)
    kept, total = t.prune_files_eq("ts", aware)
    assert len(kept) == total == 1, "tz-aware probe was bloom-pruned"
    # Multi-predicate path takes the same guard.
    kept, total = t.prune_files_multi(
        ranges={}, eq_values={"ts": [row["ts"]]}
    )
    assert len(kept) == 1
    kept, total = t.prune_files_multi(
        ranges={}, eq_values={"ts": [aware]}
    )
    assert len(kept) == 1
    # Safe types still engage the bloom (sanity: int probe present in
    # the file is kept; one absent from every file may prune to zero).
    kept, _ = t.prune_files_multi(ranges={}, eq_values={"x": [1]})
    assert len(kept) == 1
    _shutil.rmtree(d, ignore_errors=True)
