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


def test_semantic_dedup_greedy_keep_first(spark):
    """SemDeDup kept-set semantics: ascending-id greedy against the
    KEPT set — in a chain a~b, b~c with a!~c, b dies (near kept a) but
    c SURVIVES (compared to kept a only, not to dropped b). Identical
    vectors always share a cluster, so planted copies die
    deterministically."""
    import math

    from delta_lake_platform_spark.operators.dedup import semantic_dedup

    # 2-d unit vectors at controlled angles: 0deg, 10deg, 20deg and a
    # far-away one. cos(10deg)=0.985 >= 0.97, cos(20deg)=0.940 < 0.97.
    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    rows = [(1, v(0)), (2, v(10)), (3, v(20)), (4, v(180))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            df, threshold=0.97, n_clusters=2
        ).collect()
    )
    # 2 dies against kept 1; 3 survives (cos to 1 is 0.94, and 2 was
    # dropped so it never blocks); 4 is its own cluster/far away.
    assert kept == [1, 3, 4]


def test_semantic_dedup_drops_exact_copies_keeps_originals(spark):
    from delta_lake_platform_spark.operators.dedup import semantic_dedup

    base = spark.range(40).selectExpr(
        "id AS vec_id",
        # Trig-spread directions: for integer id gaps d >= 1 the
        # pairwise cosine (cos d + cos 2d)/2 stays < 0.98 — well under
        # the 0.999 threshold, so only exact copies collide.
        "array(cos(cast(id AS double)), sin(cast(id AS double)), "
        "cos(2 * cast(id AS double)), sin(2 * cast(id AS double))) "
        "AS embedding",
    )
    copies = base.filter("vec_id % 5 = 0").withColumn(
        "vec_id", F.col("vec_id") + 1000
    )
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            base.unionByName(copies), threshold=0.999, n_clusters=4
        ).collect()
    )
    assert kept == list(range(40))


def test_fuzzy_edit_pairs_small_edit_found_large_edit_excluded(spark):
    """A one-character edit of a long doc is a fuzzy pair; an unrelated
    doc is not; the reported distance is the true Levenshtein."""
    base = "the quick brown fox jumps over the lazy dog " * 5  # ~225 chars
    rows = [
        (1, base),
        (2, "Z" + base[1:]),              # distance 1 (case-normalized)
        (3, "completely different text about astronomy and star maps"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.id_a, r.id_b): (r.edit_distance, r.rel_edit)
        for r in dedup.fuzzy_edit_pairs(df, max_rel_edit=0.05).collect()
    }
    assert set(out) == {(1, 2)}
    dist, rel = out[(1, 2)]
    assert dist == 1
    assert 0 < rel <= 0.05


def test_fuzzy_edit_pairs_hot_bucket_identical_docs_linear(spark):
    """Identical-doc spam lands in one bucket; the star guard keeps the
    pair count O(B) (leader-member only), and every emitted pair is a
    true distance-0 duplicate."""
    text = "same boilerplate page body repeated verbatim " * 4
    df = spark.createDataFrame(
        [(i, text) for i in range(300)], "doc_id long, text string"
    )
    pairs = dedup.fuzzy_edit_pairs(df, hot_bucket_cap=50).collect()
    assert 0 < len(pairs) <= 300  # star topology, not 300*299/2
    assert all(r.edit_distance == 0 and r.id_a == 0 for r in pairs)


def test_fuzzy_edit_pairs_empty_and_null_text_never_pair(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    assert dedup.fuzzy_edit_pairs(df).count() == 0
