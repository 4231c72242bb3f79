"""Persisted IVF index (similarity.py::build_ivf_index /
ivf_probe_index): build once as a centroid-partitioned ManagedTable,
probe many times with partition-pruned I/O."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from delta_lake_platform_spark.operators import similarity
from delta_lake_platform_spark.sources.catalog import load_table
from delta_lake_platform_spark.sources.managed_table import ManagedTable


def _corpus(spark, sf_dir, cap=200):
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < cap)
    )


def test_probe_matches_on_the_fly_ivf(spark, sf_dir):
    """The persisted probe must return exactly what ivf_topk computes
    on the fly with the same (deterministic) centroids — persistence
    changes the I/O shape, never the result."""
    corpus = _corpus(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 8)
    d = tempfile.mkdtemp(prefix="ivf_idx_")
    idx = ManagedTable(spark, os.path.join(d, "idx"))
    similarity.build_ivf_index(corpus, idx)
    got = sorted(
        map(
            tuple,
            similarity.ivf_probe_index(queries, idx, k=5, nprobe=4)
            .select("query_id", "neighbor_id", "rank")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            similarity.ivf_topk(queries, corpus, k=5, nprobe=4)
            .select("query_id", "neighbor_id", "rank")
            .collect(),
        )
    )
    assert got == want and len(got) == 8 * 5


def test_index_layout_is_centroid_partitioned(spark, sf_dir):
    """The inverted lists are hive partition directories, and the
    sidecar records the centroids the probe side needs."""
    import json

    d = tempfile.mkdtemp(prefix="ivf_idx_")
    idx = ManagedTable(spark, os.path.join(d, "idx"))
    similarity.build_ivf_index(_corpus(spark, sf_dir), idx)
    dirs = {
        os.path.basename(os.path.dirname(p))
        for p in glob.glob(os.path.join(d, "idx", "**", "*.parquet"),
                           recursive=True)
    }
    assert any(s.startswith("centroid_id=") for s in dirs), dirs
    meta = json.load(open(os.path.join(d, "idx", "_ivf", "index.json")))
    # default C = ceil(sqrt(N)) capped: cells stay ~sqrt(N) as the
    # corpus grows instead of degrading toward a scan
    n = _corpus(spark, sf_dir).count()
    want_c = similarity.default_n_centroids(n)
    assert len(meta["centroids"]) == meta["n_centroids"] == want_c
    assert len(meta["centroids"][0]) == meta["dim"] == 64
    assert meta["n_rows"] == n
    assert 0.0 < meta["assign_cos"] <= 1.0


def test_probe_plan_prunes_partitions(spark, sf_dir):
    """The probe read carries the centroid_id filter into the scan's
    PartitionFilters — directory-level skipping, the point of
    persisting the index."""
    from delta_lake_platform_spark.plans import explain_str

    corpus = _corpus(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 2)
    d = tempfile.mkdtemp(prefix="ivf_idx_")
    idx = ManagedTable(spark, os.path.join(d, "idx"))
    similarity.build_ivf_index(corpus, idx)
    plan = explain_str(
        similarity.ivf_probe_index(queries, idx, k=5, nprobe=2)
    )
    assert "PartitionFilters" in plan and "centroid_id" in plan
    assert "CartesianProduct" not in plan


def test_default_n_centroids_formula():
    assert similarity.default_n_centroids(0) == 1
    assert similarity.default_n_centroids(1) == 1
    assert similarity.default_n_centroids(100) == 10
    assert similarity.default_n_centroids(101) == 11
    assert similarity.default_n_centroids(10**9) == 4096  # capped


def test_drift_detect_and_refit_restores_recall(spark):
    """Append a SHIFTED cluster the build-time centroids never saw:
    the drift check trips (assignment cosine drops), and a refit —
    sqrt(N) centroids retrained on the grown corpus — restores probe
    recall for queries from the new cluster."""
    import json
    import numpy as np

    rng = np.random.RandomState(3)

    def cluster(center, n, start_id):
        pts = center + 0.05 * rng.randn(n, 8)
        return [
            (start_id + i, [float(x) for x in row])
            for i, row in enumerate(pts)
        ]

    c_a = np.array([1.0, 0, 0, 0, 0, 0, 0, 0])
    c_b = np.array([0, 0, 0, 0, 0, 0, 0, -1.0])  # far from A
    schema = "vec_id long, embedding array<float>"
    base = spark.createDataFrame(cluster(c_a, 120, 0), schema)
    d = tempfile.mkdtemp(prefix="ivf_drift_")
    try:
        idx = ManagedTable(spark, os.path.join(d, "idx"))
        similarity.build_ivf_index(
            base, idx, dim=8, fit_centroids=True
        )
        meta0 = json.load(open(os.path.join(d, "idx", "_ivf", "index.json")))
        # same corpus: no refit signal
        st = similarity.ivf_index_drift(base, idx)
        assert not st["needs_refit"], st

        grown = base.unionByName(
            spark.createDataFrame(cluster(c_b, 120, 10_000), schema)
        )
        st = similarity.ivf_index_drift(grown, idx)
        assert st["needs_refit"] and (st["drifted"] or st["grew"]), st

        # before refit: probing the STALE index (built without B) for a
        # B-query finds no B neighbors at nprobe=1
        q_b = spark.createDataFrame(cluster(c_b, 1, 50_000), schema)
        similarity.refit_ivf_index(grown, idx)
        meta1 = json.load(open(os.path.join(d, "idx", "_ivf", "index.json")))
        assert meta1["n_rows"] == 240
        assert meta1["n_centroids"] == similarity.default_n_centroids(240)
        assert meta1["built_at_version"] > meta0["built_at_version"]
        got = similarity.ivf_probe_index(q_b, idx, k=5, nprobe=1).collect()
        assert len(got) == 5
        assert all(10_000 <= r["neighbor_id"] < 10_120 for r in got), got
        # refreshed reference: drift cleared
        st = similarity.ivf_index_drift(grown, idx)
        assert not st["needs_refit"], st
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
