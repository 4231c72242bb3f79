"""Hot-bucket guard: a degenerate corpus (thousands of identical docs)
must not go quadratic inside one LSH bucket.

10k identical documents share every MinHash band bucket; without the
guard the candidate self-join emits ~10k^2/2 * bands rows. With the
guard the hot buckets emit star candidates (leader, member) — O(n) —
and clustering still resolves to one component.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from delta_lake_platform_spark.operators import dedup

N_DOCS = 10_000


def _degenerate_corpus(spark):
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "the quick brown fox jumps over the lazy dog again and again"
        ).alias("text"),
    )


def test_minhash_identical_docs_completes_linearly(spark):
    docs = _degenerate_corpus(spark)
    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9, hot_bucket_cap=128)
    n = pairs.count()
    elapsed = time.perf_counter() - t0
    # Star candidates: exactly (leader=0, member) per member.
    assert n == N_DOCS - 1
    ids = pairs.agg(
        F.min("id_a").alias("lo"), F.max("id_a").alias("hi")
    ).first()
    assert (ids.lo, ids.hi) == (0, 0), "all pairs should anchor at the leader"
    # A quadratic stage at 10k docs x 16 bands would not finish in this
    # bound on local[8]; the guarded plan is a few seconds.
    assert elapsed < 120, f"hot-bucket path took {elapsed:.0f}s — quadratic?"


def test_minhash_clusters_unaffected_by_guard(spark):
    docs = _degenerate_corpus(spark).limit(2000)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9, hot_bucket_cap=64)
    clusters = dedup.connected_components(docs, pairs)
    assert clusters.select("cluster_id").distinct().count() == 1
    assert clusters.count() == 2000


def test_cold_buckets_still_emit_all_pairs(spark):
    # 6 identical docs under a cap of 100: full pairwise contract.
    docs = _degenerate_corpus(spark).limit(6)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9, hot_bucket_cap=100)
    assert pairs.count() == 6 * 5 // 2


def test_simhash_identical_docs_guarded(spark):
    docs = _degenerate_corpus(spark).limit(5000)
    t0 = time.perf_counter()
    pairs = dedup.simhash_pairs(
        docs, max_hamming=0, verify_multiset=True, hot_bucket_cap=128
    )
    assert pairs.count() == 4999
    assert time.perf_counter() - t0 < 120
