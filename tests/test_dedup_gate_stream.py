"""Streaming near-dup ingest gate (streaming/dedup_gate.py): one
survivor per clique-shaped near-dup class no matter how the stream
batches them, cross-batch rejection against admitted history, replay
no-ops, and mid-chain crash healing."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.catalog import load_table
from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.streaming.dedup_gate import neardup_gate_stream


def _gate_tables(spark, d):
    return (
        ManagedTable(spark, f"{d}/admitted"),
        ManagedTable(spark, f"{d}/bands"),
        ManagedTable(spark, f"{d}/docs"),
    )


def _planted_corpus(spark, sf_dir):
    """Originals WITHOUT natural >=0.8 near-dups (so every class is a
    planted clique and the admitted count is provably arrival-order
    invariant) + exact and mutated copies. Returns (corpus, n_clean)."""
    from delta_lake_platform_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 100)
    nat = minhash_lsh_pairs(docs, threshold=0.8)
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
            admitted, bands, docs_t = _gate_tables(spark, d)
            folded = neardup_gate_stream(
                _stream_of(spark, corpus, d, n_files=n_files),
                admitted, bands, docs_t, f"{d}/ckpt",
            )
            assert folded == n_files
            # every near-dup class is a clique around one clean
            # original: one survivor per class however batched
            assert admitted.read().count() == n_clean
            # the admitted set is mutually near-dup-free: re-running
            # the gate over it admits everything
            d2 = tempfile.mkdtemp(prefix="gate_regate_")
            try:
                a2, b2, t2 = _gate_tables(spark, d2)
                neardup_gate_stream(
                    _stream_of(spark, admitted.read(), d2, n_files=1),
                    a2, b2, t2, f"{d2}/ckpt",
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
        admitted, bands, docs_t = _gate_tables(spark, d)
        # batch 1: originals; batch 2: exact copies — all rejected
        neardup_gate_stream(
            _stream_of(spark, docs, f"{d}/a", n_files=1),
            admitted, bands, docs_t, f"{d}/ck1", stream_id="g1",
        )
        # natural near-dups among the originals may reject a few
        n1 = admitted.read().count()
        assert 15 <= n1 <= 20
        neardup_gate_stream(
            _stream_of(spark, copies, f"{d}/b", n_files=1),
            admitted, bands, docs_t, f"{d}/ck2", stream_id="g2",
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
        admitted, bands, docs_t = _gate_tables(spark, d)
        stream = _stream_of(spark, corpus, d)
        assert neardup_gate_stream(
            stream, admitted, bands, docs_t, f"{d}/ck1", stream_id="s"
        ) == 4
        versions = (
            admitted.latest_version(),
            bands.latest_version(),
            docs_t.latest_version(),
        )
        assert neardup_gate_stream(
            stream, admitted, bands, docs_t, f"{d}/ck2", stream_id="s"
        ) == 0
        assert (
            admitted.latest_version(),
            bands.latest_version(),
            docs_t.latest_version(),
        ) == versions
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_midchain_crash_heals_on_replay(spark, sf_dir):
    """Crash after the admitted+bands appends but before the docs
    append: the replayed batch must reproduce the SAME keep set (its
    own bands are already in state — the self-pair filter) and heal
    the missing append as the only real write."""
    corpus, n_clean = _planted_corpus(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="gate_crash_")
    try:
        admitted, bands, docs_t = _gate_tables(spark, d)
        calls = {"n": 0}
        orig_append = ManagedTable.append

        def crashing_append(self, df, *a, **kw):
            out = orig_append(self, df, *a, **kw)
            calls["n"] += 1
            if calls["n"] == 2:  # after admitted + bands of batch 1
                raise RuntimeError("injected crash")
            return out

        import pytest as _pytest

        ManagedTable.append = crashing_append
        try:
            from pyspark.errors import StreamingQueryException

            with _pytest.raises(StreamingQueryException):
                neardup_gate_stream(
                    _stream_of(spark, corpus, f"{d}/one", n_files=1),
                    admitted, bands, docs_t, f"{d}/ck1", stream_id="s",
                )
        finally:
            ManagedTable.append = orig_append
        assert admitted.exists() and bands.exists()
        assert not docs_t.exists() or docs_t.read().count() == 0
        # replay heals: same survivors, docs table filled in
        neardup_gate_stream(
            _stream_of(spark, corpus, f"{d}/two", n_files=1),
            admitted, bands, docs_t, f"{d}/ck2", stream_id="s",
        )
        assert admitted.read().count() == n_clean
        assert docs_t.read().count() == n_clean
        a_ids = {r["doc_id"] for r in admitted.read().collect()}
        d_ids = {r["doc_id"] for r in docs_t.read().collect()}
        assert a_ids == d_ids
    finally:
        shutil.rmtree(d, ignore_errors=True)
