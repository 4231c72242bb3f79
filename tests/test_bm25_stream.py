"""Streaming BM25 index maintenance (streaming/search_index.py +
search.extend_bm25_index): the maintained index answers probes
value-exactly like a fresh build over everything seen (BM25 is
stateless given postings + stats), stats fold exactly, replays are
no-ops, and repair_bm25_stats recovers the crash window."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from delta_lake_platform_spark.operators.search import (
    bm25_probe_index, build_bm25_index, repair_bm25_stats,
)
from delta_lake_platform_spark.sources.catalog import load_table
from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.streaming.search_index import (
    bm25_maintain_stream,
)

QUERY = "spark stream window merge"


def _stream_of(spark, df, d, n_files=4):
    src = f"{d}/src"
    df.repartition(n_files).write.parquet(src)
    return (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_maintained_probe_equals_fresh_build(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="bm25_stream_eq_")
    try:
        maintained = ManagedTable(spark, f"{d}/maintained")
        folded = bm25_maintain_stream(
            _stream_of(spark, docs, d), maintained, f"{d}/ckpt",
            stream_id="eq",
        )
        assert folded == 4
        fresh = ManagedTable(spark, f"{d}/fresh")
        build_bm25_index(docs, fresh)
        # stats folded exactly
        pm, pf = maintained.properties(), fresh.properties()
        assert pm["bm25.n_docs"] == pf["bm25.n_docs"]
        assert pm["bm25.total_dl"] == pf["bm25.total_dl"]
        # integer-exact total fold -> one identical division: bit-exact
        assert pm["bm25.avgdl"] == pf["bm25.avgdl"]
        # probes value-exact
        a = [tuple(r) for r in bm25_probe_index(
            maintained, QUERY, k=15).orderBy("rank").collect()]
        b = [tuple(r) for r in bm25_probe_index(
            fresh, QUERY, k=15).orderBy("rank").collect()]
        assert a == b
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_replay_is_noop(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="bm25_stream_replay_")
    try:
        idx = ManagedTable(spark, f"{d}/idx")
        stream = _stream_of(spark, docs, d)
        assert bm25_maintain_stream(stream, idx, f"{d}/ck1", stream_id="s") == 4
        v = idx.latest_version()
        props = dict(idx.properties())
        assert bm25_maintain_stream(stream, idx, f"{d}/ck2", stream_id="s") == 0
        assert idx.latest_version() == v
        assert dict(idx.properties()) == props
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_repair_recovers_stale_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="bm25_repair_")
    try:
        idx = ManagedTable(spark, f"{d}/idx")
        bm25_maintain_stream(
            _stream_of(spark, docs, d), idx, f"{d}/ckpt", stream_id="r"
        )
        good_n = idx.properties()["bm25.n_docs"]
        good_avgdl = float(idx.properties()["bm25.avgdl"])
        baseline = [tuple(r) for r in bm25_probe_index(
            idx, QUERY, k=10).collect()]
        # simulate the crash window: postings ahead of the stats fold
        idx.set_property("bm25.n_docs", "1")
        idx.set_property("bm25.avgdl", "1.0")
        got = repair_bm25_stats(idx)
        assert idx.properties()["bm25.n_docs"] == good_n
        assert float(idx.properties()["bm25.avgdl"]) == pytest.approx(
            good_avgdl, rel=1e-12
        )
        assert got["n_docs"] == int(good_n)
        after = [tuple(r) for r in bm25_probe_index(
            idx, QUERY, k=10).collect()]
        assert after == baseline
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_optimize_compacts_generations_probes_stay_exact(spark, sf_dir):
    """The LSM cycle's compact step: OPTIMIZE ZORDER BY (term) rewrites
    the accumulated posting generations back into one term-clustered
    generation — same probe results, and the probe's file fan-in drops
    back to the single-generation level."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="bm25_compact_")
    try:
        idx = ManagedTable(spark, f"{d}/idx")
        bm25_maintain_stream(
            _stream_of(spark, docs, d), idx, f"{d}/ckpt", stream_id="c"
        )
        before = [tuple(r) for r in bm25_probe_index(
            idx, QUERY, k=15).orderBy("rank").collect()]
        files_before = idx.detail()["numFiles"]
        idx.optimize_zorder(["term"], n_files=8)
        files_after = idx.detail()["numFiles"]
        assert files_after <= 8 < files_before
        after = [tuple(r) for r in bm25_probe_index(
            idx, QUERY, k=15).orderBy("rank").collect()]
        assert after == before  # pure layout change, same ranking
        # pruning effective again: a one-term probe opens O(1) files
        pruned = idx.read_pruned("term", "spark", "spark")
        n_pruned_files = pruned.rdd.getNumPartitions()
        assert n_pruned_files <= 2, n_pruned_files
    finally:
        shutil.rmtree(d, ignore_errors=True)
