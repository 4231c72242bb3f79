"""Streaming IVF index maintenance (streaming/ann_index.py): the
streamed index equals a batch build over the same data, probes stay
partition-pruned and find planted copies, replays are no-ops, and
drift triggers a refit when asked."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from delta_lake_platform_spark.operators import similarity
from delta_lake_platform_spark.sources.catalog import load_table
from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.streaming.ann_index import ivf_maintain_stream


def _stream_of(spark, df, d, n_files=4):
    src = f"{d}/src"
    df.repartition(n_files).write.parquet(src)
    return (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_streamed_index_equals_batch_build(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    d = tempfile.mkdtemp(prefix="ivf_stream_eq_")
    try:
        streamed = ManagedTable(spark, f"{d}/streamed")
        # pin the centroid count: the bootstrap batch is smaller than
        # the corpus, so the sqrt(N) default would differ from a full
        # build; with the same deterministic centroids, assignment is
        # row-local and the two indexes must agree row-for-row
        ivf_maintain_stream(
            _stream_of(spark, emb, d), streamed, f"{d}/ckpt",
            n_centroids=16, stream_id="eq",
        )
        batch = ManagedTable(spark, f"{d}/batch")
        similarity.build_ivf_index(emb, batch, n_centroids=16)
        a = sorted(map(tuple, streamed.read().select(
            "vec_id", "centroid_id").collect()))
        b = sorted(map(tuple, batch.read().select(
            "vec_id", "centroid_id").collect()))
        assert a == b
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streamed_index_probe_finds_planted_copies(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)
    copies = [
        queries.withColumn("vec_id", F.col("vec_id") * 100 + F.lit(2000000 + j))
        for j in range(5)
    ]
    corpus = emb
    for c in copies:
        corpus = corpus.unionByName(c)
    d = tempfile.mkdtemp(prefix="ivf_stream_probe_")
    try:
        idx = ManagedTable(spark, f"{d}/idx")
        folded = ivf_maintain_stream(
            _stream_of(spark, corpus, d), idx, f"{d}/ckpt", stream_id="probe"
        )
        assert folded == 4
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ivf_probe_index(
                queries, idx, k=5, nprobe=4
            ).collect()
        }
        want = {
            (q, q * 100 + 2000000 + j) for q in range(5) for j in range(5)
        }
        assert got == want  # every planted copy found wherever it streamed in
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_replay_is_noop(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    d = tempfile.mkdtemp(prefix="ivf_stream_replay_")
    try:
        idx = ManagedTable(spark, f"{d}/idx")
        stream = _stream_of(spark, emb, d)
        assert ivf_maintain_stream(
            stream, idx, f"{d}/ckpt", stream_id="s1"
        ) == 4
        v = idx.latest_version()
        n = idx.read().count()
        assert ivf_maintain_stream(
            stream, idx, f"{d}/ckpt2", stream_id="s1"
        ) == 0
        assert idx.latest_version() == v
        assert idx.read().count() == n
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_refit_on_drift_retrains(spark):
    # bootstrap on one tight cluster, then stream in 3x the volume in a
    # different region: growth alone trips the drift check; the refit
    # must re-derive sqrt(N) centroids over the grown corpus
    import json
    import os

    base = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[F.lit(1.0 if i == 0 else 0.0) for i in range(8)]
        ).cast("array<float>").alias("embedding"),
    )
    shifted = spark.range(100, 400).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[F.lit(1.0 if i == 4 else 0.0) for i in range(8)]
        ).cast("array<float>").alias("embedding"),
    )
    d = tempfile.mkdtemp(prefix="ivf_stream_drift_")
    try:
        idx = ManagedTable(spark, f"{d}/idx")
        ivf_maintain_stream(
            _stream_of(spark, base, f"{d}/a", n_files=1), idx, f"{d}/ck1",
            dim=8, stream_id="drift",
        )
        with open(os.path.join(idx.path, "_ivf", "index.json")) as fh:
            before = json.load(fh)
        assert before["n_rows"] == 100
        ivf_maintain_stream(
            _stream_of(spark, shifted, f"{d}/b", n_files=1), idx, f"{d}/ck2",
            dim=8, stream_id="drift2", refit_on_drift=True,
        )
        with open(os.path.join(idx.path, "_ivf", "index.json")) as fh:
            after = json.load(fh)
        assert after["n_rows"] == 400  # refit re-anchored to the grown corpus
        assert after["fit_centroids"] is True
        assert idx.read().count() == 400
    finally:
        shutil.rmtree(d, ignore_errors=True)
