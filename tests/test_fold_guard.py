"""Concurrent-writer guard for the streaming maintenance folds (r11,
upgrading the r9/r10 documented single-writer contract):

- overwrite-shaped folds (decayed, heavy hitters) anchor the publish
  to the snapshot the fold READ (`overwrite(read_version=...)`); a
  peer committing in between raises ConcurrentWriteError and the
  guard re-reads the watermark — double-folds become deterministic
  no-ops;
- append-shaped folds (BM25/IVF extends, dedup gate) carry
  txnAppId/txnVersion, and the commit retry now detects a peer's
  same-appId commit landing AFTER the snapshot pin (Delta's
  ConcurrentTransaction rule) and turns the append into an atomic
  no-op — `last_append_was_noop` reports it so sidecar stats folds
  are skipped with it.

Races are simulated deterministically: the 'peer' commits from inside
the victim's own critical section (via the build callback or a
patched staging hook), so every interleaving the guard must survive
is exercised exactly, with no thread timing."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import (
    ConcurrentWriteError, ManagedTable,
)
from delta_lake_platform_spark.streaming.decayed import (
    _batch_watermark, _fold_with_guard,
)


def _mk(spark, d, rows):
    t = ManagedTable(spark, d)
    t.create(spark.createDataFrame(rows, "k long, v long"))
    return t


def test_guarded_fold_noops_when_peer_folds_same_batch(spark):
    """Victim pins the snapshot and passes the watermark check; the
    peer then folds the SAME batch to completion (from inside the
    victim's build callback). The victim's anchored publish must hit
    ConcurrentWriteError, re-read the watermark, and no-op — state
    holds the peer's fold exactly once."""
    d = tempfile.mkdtemp(prefix="fold_guard_")
    try:
        state = _mk(spark, f"{d}/state", [(1, 10)])
        calls = {"victim_builds": 0}

        def peer_build(rv):
            return (
                state.read(rv)
                .withColumn("v", F.col("v") + 100)
                .localCheckpoint()
            )

        def victim_build(rv):
            calls["victim_builds"] += 1
            if calls["victim_builds"] == 1:
                # peer completes the SAME batch inside our window
                assert _fold_with_guard(
                    state, "s", 7, "decayed", peer_build
                )
            return (
                state.read(rv)
                .withColumn("v", F.col("v") + 100)
                .localCheckpoint()
            )

        folded = _fold_with_guard(state, "s", 7, "decayed", victim_build)
        assert folded is False  # victim no-opped
        assert calls["victim_builds"] == 1  # retry exited at watermark
        assert _batch_watermark(state, "s") == 7
        assert state.read().collect()[0]["v"] == 110  # folded ONCE
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_guarded_fold_retries_over_foreign_commit(spark):
    """A foreign commit (not this stream's fold) lands inside the
    victim's window: the anchored publish conflicts, and the retry
    recomputes FROM THE NEW HEAD — the foreign write is folded over,
    never erased (the silent lost-update the unanchored overwrite
    allowed)."""
    d = tempfile.mkdtemp(prefix="fold_guard_f_")
    try:
        state = _mk(spark, f"{d}/state", [(1, 10)])
        calls = {"builds": 0}

        def build(rv):
            calls["builds"] += 1
            if calls["builds"] == 1:
                # foreign writer replaces the state inside our window
                state.overwrite(
                    spark.createDataFrame([(1, 500)], "k long, v long")
                )
            return (
                state.read(rv)
                .withColumn("v", F.col("v") + 1)
                .localCheckpoint()
            )

        assert _fold_with_guard(state, "s", 3, "decayed", build) is True
        assert calls["builds"] == 2  # recomputed from the new head
        assert state.read().collect()[0]["v"] == 501  # 500 + 1, not 11
        assert _batch_watermark(state, "s") == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_guarded_fold_gives_up_after_retries(spark):
    d = tempfile.mkdtemp(prefix="fold_guard_g_")
    try:
        state = _mk(spark, f"{d}/state", [(1, 10)])
        # the hostile writer is its OWN handle (a real peer process),
        # so it cannot consume the victim handle's pending commit
        # metadata
        hostile = ManagedTable(spark, f"{d}/state")

        def hostile_build(rv):
            hostile.overwrite(
                spark.createDataFrame([(1, 99)], "k long, v long")
            )
            return state.read(rv).localCheckpoint()

        with pytest.raises(ConcurrentWriteError):
            _fold_with_guard(
                state, "s", 1, "decayed", hostile_build, retries=2
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_txn_append_noops_under_concurrent_duplicate(spark):
    """Two writers append the same (txn_app, txn_version): the peer's
    commit lands AFTER the victim pinned its snapshot and passed the
    pre-check — the window the pre-check alone cannot see. The commit
    retry's txn scan must turn the victim's append into a no-op with
    `last_append_was_noop` set; rows land exactly once."""
    d = tempfile.mkdtemp(prefix="txn_race_")
    try:
        victim = _mk(spark, f"{d}/t", [(0, 0)])
        peer = ManagedTable(spark, f"{d}/t")
        batch = spark.createDataFrame([(1, 1), (2, 2)], "k long, v long")

        orig = ManagedTable._batch_dir
        fired = {"n": 0}

        def racing_batch_dir(self):
            # called between the victim's snapshot pin and its entry
            # create: the peer commits the SAME txn here, once
            if self is victim and fired["n"] == 0:
                fired["n"] += 1
                peer.append(batch, fast=True, txn_app="w", txn_version=5)
            return orig(self)

        ManagedTable._batch_dir = racing_batch_dir
        try:
            v = victim.append(batch, fast=True, txn_app="w", txn_version=5)
        finally:
            ManagedTable._batch_dir = orig
        assert victim.last_append_was_noop is True
        assert v == victim.latest_version()
        assert victim.read().count() == 3  # 1 seed + batch ONCE
        assert victim.last_txn_version("w") == 5
        # a later version for the same app is NOT blocked
        victim.append(batch, fast=True, txn_app="w", txn_version=6)
        assert victim.last_append_was_noop is False
        assert victim.read().count() == 5
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bm25_extend_skips_stats_when_peer_applied(spark):
    """The BM25 fold's sidecar stats must fold exactly once when two
    writers extend with the same batch: the loser's append no-ops via
    the txn scan and extend_bm25_index returns False WITHOUT touching
    the stats."""
    from delta_lake_platform_spark.operators.search import (
        build_bm25_index, extend_bm25_index,
    )

    d = tempfile.mkdtemp(prefix="bm25_race_")
    try:
        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
        )
        batch = spark.createDataFrame(
            [(3, "gamma delta epsilon")], "doc_id long, text string"
        )
        victim = ManagedTable(spark, f"{d}/idx")
        peer = ManagedTable(spark, f"{d}/idx")
        build_bm25_index(docs, victim)

        orig = ManagedTable._batch_dir
        fired = {"n": 0}

        def racing_batch_dir(self):
            if self is victim and fired["n"] == 0:
                fired["n"] += 1
                assert extend_bm25_index(
                    batch, peer, txn_app="b", txn_version=0
                )
            return orig(self)

        ManagedTable._batch_dir = racing_batch_dir
        try:
            applied = extend_bm25_index(
                batch, victim, txn_app="b", txn_version=0
            )
        finally:
            ManagedTable._batch_dir = orig
        assert applied is False
        props = victim.properties()
        # stats folded exactly once: 2 build docs + 1 batch doc
        assert props["bm25.n_docs"] == "3"
        assert props["bm25.total_dl"] == "7"  # 2 + 2 + 3 tokens
        # postings landed exactly once too
        assert victim.read().filter(F.col("term") == "delta").count() == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)
