"""Manifest-pruned change feed == full-snapshot diff, for every commit
shape: fast append, DV delete, file-level COW merge/update/delete, and
full-snapshot rewrites. The pruned path (_feed_sides) reads only files
that differ between the two manifests plus the DV delta; this pins that
it never changes the feed's contents."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import (
    ManagedTable,
    MergeClauses,
)


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="cfp_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _full_diff(t: ManagedTable, v0: int, v1: int):
    """Reference multiset diff straight off the two snapshots."""
    b = t.read(v0)
    a = t.read(v1)
    removed = sorted(map(tuple, b.exceptAll(a).collect()))
    added = sorted(map(tuple, a.exceptAll(b).collect()))
    return removed, added


def _feed_diff(t: ManagedTable, v0: int, v1: int):
    feed = t.change_feed(v0, v1).collect()
    cols = [c for c in t.read(v1).columns]
    removed = sorted(
        tuple(r[c] for c in cols) for r in feed if r["_change_type"] == "delete"
    )
    added = sorted(
        tuple(r[c] for c in cols) for r in feed if r["_change_type"] == "insert"
    )
    return removed, added


def _mk(spark, tmpdir) -> ManagedTable:
    t = ManagedTable(spark, f"{tmpdir}/t")
    t.create(
        spark.range(400)
        .select("id", (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(8, "id")
    )
    return t


OPS = {
    "fast_append": lambda t, s: t.append(
        s.range(1000, 1020).select(
            "id", (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("v")
        ),
        fast=True,
    ),
    "dv_delete": lambda t, s: t.delete("id between 30 and 60", rewrite=False),
    "cow_delete": lambda t, s: t.delete("id between 100 and 120", rewrite=True),
    "cow_update": lambda t, s: t.update({"v": "v + 7"}, "id between 200 and 210"),
    "cow_merge": lambda t, s: t.merge(
        s.createDataFrame([(300, -1), (2000, -2)], "id long, nv long"),
        MergeClauses(
            condition="target.id = updates.id",
            matched_update={"v": "updates.nv"},
            not_matched_insert={
                "id": "updates.id",
                "k": "updates.id % 5",
                "v": "updates.nv",
            },
        ),
        rewrite=True,
    ),
    "full_rewrite": lambda t, s: t.compact(target_partitions=3),
}


@pytest.mark.parametrize("op", sorted(OPS))
def test_single_step_feed_matches_full_diff(spark, tmpdir, op):
    t = _mk(spark, tmpdir)
    OPS[op](t, spark)
    assert _feed_diff(t, 0, 1) == _full_diff(t, 0, 1), op


def test_multi_step_feed_matches_full_diff(spark, tmpdir):
    t = _mk(spark, tmpdir)
    for op in ("fast_append", "dv_delete", "cow_update", "cow_merge"):
        OPS[op](t, spark)
    v1 = t.latest_version()
    assert _feed_diff(t, 0, v1) == _full_diff(t, 0, v1)
    # intermediate window too
    assert _feed_diff(t, 1, 3) == _full_diff(t, 1, 3)


def test_incremental_history_feed_prunes_shared_files(spark, tmpdir):
    """After append + DV-delete + narrow COW update, most of the 8
    original files are shared between the manifests; the pruned sides
    must exclude them."""
    t = _mk(spark, tmpdir)
    OPS["fast_append"](t, spark)
    OPS["dv_delete"](t, spark)
    OPS["cow_update"](t, spark)
    v1 = t.latest_version()
    before, after = t._feed_sides(0, v1)
    total = t.read(0).count() + t.read(v1).count()
    pruned = before.count() + after.count()
    assert pruned < total / 2, (pruned, total)


def test_same_version_feed_is_empty(spark, tmpdir):
    t = _mk(spark, tmpdir)
    assert t.change_feed(0, 0).count() == 0


# --- property: pruned feed == full diff under ARBITRARY op sequences --------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_OP_NAMES = sorted(OPS) + ["compact_where"]
_SEQS = st.lists(st.sampled_from(_OP_NAMES), min_size=1, max_size=4)


def _apply(t, spark, op):
    if op == "compact_where":
        t.compact_where("id < 150", target_partitions=1)
    else:
        OPS[op](t, spark)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=_SEQS)
def test_feed_matches_full_diff_under_any_sequence(spark, seq):
    """For ANY sequence of commit shapes (appends, DV deletes, file-
    level COW merge/update/delete, predicate compaction, full rewrite),
    the manifest-pruned change feed over any (0, head) window must
    equal the brute-force two-snapshot diff."""
    d = tempfile.mkdtemp(prefix="cfp_h_")
    try:
        t = _mk(spark, d)
        for op in seq:
            _apply(t, spark, op)
        head = t.latest_version()
        assert _feed_diff(t, 0, head) == _full_diff(t, 0, head), seq
    finally:
        shutil.rmtree(d, ignore_errors=True)
