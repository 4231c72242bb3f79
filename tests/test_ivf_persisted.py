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
    assert len(meta["centroids"]) == meta["n_centroids"] == 16
    assert len(meta["centroids"][0]) == meta["dim"] == 64


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
