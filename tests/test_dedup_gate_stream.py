"""Streaming near-dup ingest gate (streaming/dedup_gate.py): one
survivor per clique-shaped near-dup class no matter how the stream
batches them, cross-batch rejection against admitted history, replay
no-ops, and single-commit fold atomicity (a crash before the commit
leaves no trace; there is no mid-chain state)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.catalog import load_table
from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.streaming.dedup_gate import (
    BANDS_COL, neardup_gate_stream,
)


def _planted_corpus(spark, sf_dir):
    """Originals WITHOUT natural >=0.8 near-dups (so every class is a
    planted clique and the admitted count is provably arrival-order
    invariant) + exact and mutated copies. Returns (corpus, n_clean).
    The clean set uses the EXACT pair definition (brute-force Jaccard,
    bounded: 100 docs) so the invariant does not depend on LSH banding
    catching every natural pair."""
    from delta_lake_platform_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 100)
    nat = ngram_jaccard_pairs(docs).filter(F.col("jaccard") >= 0.8)
    paired = nat.select(F.col("id_a").alias("doc_id")).unionByName(
        nat.select(F.col("id_b").alias("doc_id"))
    ).distinct()
    clean = docs.join(paired, "doc_id", "left_anti").localCheckpoint()
    exact = clean.filter(F.col("doc_id") % 4 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    mutated = (
        clean.filter(F.col("doc_id") % 2 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2000000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" z")))
    )
    return clean.unionByName(exact).unionByName(mutated), clean.count()


def _stream_of(spark, df, d, n_files=4):
    src = f"{d}/src"
    df.repartition(n_files).write.parquet(src)
    return (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_one_survivor_per_class_any_batching(spark, sf_dir):
    corpus, n_clean = _planted_corpus(spark, sf_dir)
    for n_files, tag in [(1, "all_at_once"), (4, "four_batches")]:
        d = tempfile.mkdtemp(prefix=f"gate_{tag}_")
        try:
            admitted = ManagedTable(spark, f"{d}/admitted")
            folded = neardup_gate_stream(
                _stream_of(spark, corpus, d, n_files=n_files),
                admitted, f"{d}/ckpt",
            )
            assert folded == n_files
            # ONE commit per fold: create() wrote v0, then exactly one
            # txn append per micro-batch — no sidecar writes
            assert admitted.latest_version() == n_files
            # every near-dup class is a clique around one clean
            # original: one survivor per class however batched
            assert admitted.read().count() == n_clean
            # each survivor carries its full bucket map in-row
            assert (
                admitted.read()
                .select(F.size(BANDS_COL).alias("n"))
                .filter("n != 16")
                .count()
                == 0
            )
            # the admitted set is mutually near-dup-free: re-running
            # the gate over it admits everything (the gate drops the
            # incoming minhash_bands column and re-bands from text)
            d2 = tempfile.mkdtemp(prefix="gate_regate_")
            try:
                a2 = ManagedTable(spark, f"{d2}/admitted")
                neardup_gate_stream(
                    _stream_of(
                        spark,
                        admitted.read().select("doc_id", "text"),
                        d2, n_files=1,
                    ),
                    a2, f"{d2}/ckpt",
                )
                assert a2.read().count() == n_clean
            finally:
                shutil.rmtree(d2, ignore_errors=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)


def test_cross_batch_rejection_against_history(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 20)
    copies = docs.withColumn("doc_id", F.col("doc_id") + 1000000)
    d = tempfile.mkdtemp(prefix="gate_cross_")
    try:
        admitted = ManagedTable(spark, f"{d}/admitted")
        # batch 1: originals; batch 2: exact copies — all rejected
        neardup_gate_stream(
            _stream_of(spark, docs, f"{d}/a", n_files=1),
            admitted, f"{d}/ck1", stream_id="g1",
        )
        # natural near-dups among the originals may reject a few
        n1 = admitted.read().count()
        assert 15 <= n1 <= 20
        neardup_gate_stream(
            _stream_of(spark, copies, f"{d}/b", n_files=1),
            admitted, f"{d}/ck2", stream_id="g2",
        )
        # an exact copy of EVERY original (admitted or naturally
        # rejected) near-matches admitted history: nothing new lands
        assert admitted.read().count() == n1
        ids = {r["doc_id"] for r in admitted.read().collect()}
        assert all(i < 1000000 for i in ids)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_replay_is_noop(spark, sf_dir):
    corpus, _ = _planted_corpus(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="gate_replay_")
    try:
        admitted = ManagedTable(spark, f"{d}/admitted")
        stream = _stream_of(spark, corpus, d)
        assert neardup_gate_stream(
            stream, admitted, f"{d}/ck1", stream_id="s"
        ) == 4
        version = admitted.latest_version()
        assert neardup_gate_stream(
            stream, admitted, f"{d}/ck2", stream_id="s"
        ) == 0
        assert admitted.latest_version() == version
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_crash_before_commit_leaves_no_trace(spark, sf_dir):
    """A fold is ONE commit: a crash during the append either left
    nothing (the table is untouched) or everything (docs + bucket
    index together). The replay recomputes the identical keep set and
    lands it as the only write — no partial state to reconcile."""
    corpus, n_clean = _planted_corpus(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="gate_crash_")
    try:
        admitted = ManagedTable(spark, f"{d}/admitted")
        orig_append = ManagedTable.append

        def crashing_append(self, df, *a, **kw):
            # crash BEFORE the commit lands — the fold's only write
            raise RuntimeError("injected crash")

        import pytest as _pytest

        ManagedTable.append = crashing_append
        try:
            from pyspark.errors import StreamingQueryException

            with _pytest.raises(StreamingQueryException):
                neardup_gate_stream(
                    _stream_of(spark, corpus, f"{d}/one", n_files=1),
                    admitted, f"{d}/ck1", stream_id="s",
                )
        finally:
            ManagedTable.append = orig_append
        # nothing committed: the create() left an empty v0 at most
        assert not admitted.exists() or admitted.read().count() == 0
        # replay recomputes the identical fold and lands it whole
        neardup_gate_stream(
            _stream_of(spark, corpus, f"{d}/two", n_files=1),
            admitted, f"{d}/ck2", stream_id="s",
        )
        assert admitted.read().count() == n_clean
        # docs and bucket index arrived in the same rows: one bucket
        # entry per (admitted doc, band)
        n_bucket_rows = (
            admitted.read()
            .select(F.explode(BANDS_COL))
            .count()
        )
        assert n_bucket_rows == n_clean * 16
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_batch0_replay_exits_early(spark, sf_dir):
    """A recorded txn version of 0 (batch 0 committed) must trigger
    the early exit on replay — not be mistaken for never-committed."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 10)
    d = tempfile.mkdtemp(prefix="gate_b0_")
    try:
        admitted = ManagedTable(spark, f"{d}/admitted")
        neardup_gate_stream(
            _stream_of(spark, docs, f"{d}/a", n_files=1),
            admitted, f"{d}/ck1", stream_id="s",
        )
        assert admitted.last_txn_version("s") == 0
        calls = {"n": 0}
        orig_append = ManagedTable.append

        def counting_append(self, df, *a, **kw):
            calls["n"] += 1
            return orig_append(self, df, *a, **kw)

        ManagedTable.append = counting_append
        try:
            assert neardup_gate_stream(
                _stream_of(spark, docs, f"{d}/b", n_files=1),
                admitted, f"{d}/ck2", stream_id="s",
            ) == 0
        finally:
            ManagedTable.append = orig_append
        # early exit fired BEFORE any append was even attempted
        assert calls["n"] == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
