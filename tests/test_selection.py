"""Diversity selection (operators/selection.py): k-center picks one
point per planted cluster, assignment covers, MMR suppresses
near-duplicate candidates — plus the determinism contracts the DuckDB
oracles rely on (rounded argmax, id tie-break, repartition-stable)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.operators import selection, similarity
from delta_lake_platform_spark.sources.catalog import load_table


def _clustered(spark, per_cluster: int = 6):
    """Three tight clusters along distinct axes of R^4 + tiny jitter.

    Cosine distance between clusters ~1.0, within clusters ~0.0."""
    rows = []
    axes = {0: [1.0, 0.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0, 0.0], 2: [0.0, 0.0, 1.0, 0.0]}
    vid = 0
    for c, axis in axes.items():
        for i in range(per_cluster):
            jit = 0.01 * (i + 1)
            vec = [v + (jit if d == 3 else 0.0) for d, v in enumerate(axis)]
            rows.append((vid, c, [float(x) for x in vec]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, cluster int, embedding array<float>")


def test_kcenter_picks_one_per_cluster(spark):
    df = _clustered(spark)
    sel = selection.kcenter_select(df, k=3)
    picked = sel.orderBy("rank").collect()
    assert [r["rank"] for r in picked] == [1, 2, 3]
    ids = [r["vec_id"] for r in picked]
    clusters = {r["cluster"] for r in df.filter(F.col("vec_id").isin(ids)).collect()}
    assert clusters == {0, 1, 2}, f"expected one pick per cluster, got {clusters}"
    # seed is the min id; its distance is NULL, later dists non-increasing
    assert picked[0]["vec_id"] == 0 and picked[0]["kc_dist"] is None
    assert picked[1]["kc_dist"] >= picked[2]["kc_dist"]
    # first farthost pick is ~orthogonal to the seed (cosine dist ~1)
    assert picked[1]["kc_dist"] > 0.9


def test_kcenter_deterministic_under_repartition(spark):
    df = _clustered(spark, per_cluster=8)
    a = selection.kcenter_select(df, k=5).collect()
    b = selection.kcenter_select(df.repartition(7), k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kcenter_excludes_zero_and_null_vectors(spark):
    df = _clustered(spark).unionByName(
        spark.createDataFrame(
            [(100, 9, [0.0, 0.0, 0.0, 0.0]), (101, 9, None)],
            "vec_id long, cluster int, embedding array<float>",
        )
    )
    sel = selection.kcenter_select(df, k=30)  # k > corpus: early stop
    ids = {r["vec_id"] for r in sel.collect()}
    assert 100 not in ids and 101 not in ids
    assert len(ids) == 18  # all directional rows, none twice


def test_coverage_assign_recovers_clusters(spark):
    df = _clustered(spark)
    centers = selection.kcenter_select(df, k=3)
    centers_vec = centers.join(df.select("vec_id", "embedding"), "vec_id")
    assigned = selection.coverage_assign(df, centers_vec)
    # every member of a cluster lands on the center picked from it
    got = (
        assigned.join(df.select("vec_id", "cluster"), "vec_id")
        .join(
            df.select(
                F.col("vec_id").alias("center_id"),
                F.col("cluster").alias("center_cluster"),
            ),
            "center_id",
        )
        .collect()
    )
    assert len(got) == 18
    for r in got:
        assert r["cluster"] == r["center_cluster"]
        assert r["center_dist"] <= 0.01


def test_mmr_suppresses_near_duplicates(spark):
    # Candidates for one query: c0 most relevant, c1 a near-copy of c0,
    # c2 less relevant but orthogonal. Plain relevance ranks c1 second;
    # MMR must rank c2 second (c1's redundancy penalty ~1 crushes it).
    cands = spark.createDataFrame(
        [
            (7, 0, 0.95, [1.0, 0.0, 0.0, 0.0]),
            (7, 1, 0.94, [0.999, 0.01, 0.0, 0.0]),
            (7, 2, 0.60, [0.0, 1.0, 0.0, 0.0]),
        ],
        "query_id long, neighbor_id long, cosine double, embedding array<float>",
    )
    out = selection.mmr_rerank(cands, k=3, lambda_=0.7).orderBy("mmr_rank").collect()
    assert [r["neighbor_id"] for r in out] == [0, 2, 1]
    # first pick's score is its raw relevance
    assert out[0]["mmr_score"] == pytest.approx(0.95, abs=1e-6)
    # second pick: 0.7*0.60 - 0.3*0.0 = 0.42 (orthogonal, no penalty)
    assert out[1]["mmr_score"] == pytest.approx(0.42, abs=1e-6)
    # the duplicate's marginal collapses: 0.7*0.94 - 0.3*~1.0 ~ 0.358
    assert out[2]["mmr_score"] < 0.37


def test_mmr_matches_reference_greedy(spark, sf_dir):
    """MMR over real ANN shortlists == a plain-python greedy oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    shortlist = similarity.cosine_topk_bruteforce(queries, emb, k=12)
    cands = shortlist.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    got = {
        (r["query_id"], r["mmr_rank"]): (r["neighbor_id"], r["mmr_score"])
        for r in selection.mmr_rerank(cands, k=4, lambda_=0.7).collect()
    }

    rows = cands.collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    lam = 0.7
    for qid, lst in by_q.items():
        lst = sorted(lst, key=lambda r: r["neighbor_id"])
        unit = []
        for r in lst:
            v = [float(x) for x in r["embedding"]]
            n = math.sqrt(sum(x * x for x in v)) or 1.0
            unit.append([x / n for x in v])
        picked: list[int] = []
        remaining = list(range(len(lst)))
        for rank in range(1, 5):
            best_j, best_m = None, None
            for j in remaining:
                if not picked:
                    m = lst[j]["cosine"]
                else:
                    sim = max(
                        sum(a * b for a, b in zip(unit[j], unit[p]))
                        for p in picked
                    )
                    m = lam * lst[j]["cosine"] - (1 - lam) * sim
                m = round(m, 6)
                if best_m is None or m > best_m:
                    best_j, best_m = j, m
            picked.append(best_j)
            remaining.remove(best_j)
            assert got[(qid, rank)][0] == lst[best_j]["neighbor_id"], (
                f"query {qid} rank {rank}"
            )
            assert got[(qid, rank)][1] == pytest.approx(best_m, abs=1e-6)


def test_kcenter_k_validation(spark):
    df = _clustered(spark)
    with pytest.raises(ValueError):
        selection.kcenter_select(df, k=0)
    with pytest.raises(ValueError):
        selection.mmr_rerank(df, k=0)


def test_kcenter_radius_dominates_coverage(spark, sf_dir):
    """Greedy invariant behind the 2-approximation: after selecting k
    centers, NO remaining point is farther from its nearest center
    than the last selection was when picked (kc_dist is the running
    maximin, non-increasing; the coverage radius is what round k+1
    would have selected)."""
    from delta_lake_platform_spark.sources.catalog import load_table as _lt

    emb = _lt(spark, sf_dir, "embeddings")
    sel = selection.kcenter_select(emb, k=6)
    rows = sorted(sel.collect(), key=lambda r: r["rank"])
    dists = [r["kc_dist"] for r in rows[1:]]
    assert dists == sorted(dists, reverse=True)  # non-increasing maximin
    centers = sel.join(emb.select("vec_id", "embedding"), "vec_id")
    assigned = selection.coverage_assign(emb, centers)
    radius = assigned.agg(F.max("center_dist")).first()[0]
    assert radius <= dists[-1] + 1e-6, (radius, dists)


def test_kcenter_sampled_matches_exact_on_sample(spark, sf_dir):
    """The sampled tier IS the exact greedy restricted to the
    deterministic subsample: (rank, id, kc_dist) must match
    kcenter_select over the pre-filtered corpus row for row, and the
    reported coverage_radius must equal the full-corpus max of the
    min rounded distance to the selected centers."""
    emb = load_table(spark, sf_dir, "embeddings")
    sampled = selection.kcenter_select_sampled(emb, k=5, sample_mod=2)
    rows = sorted(sampled.collect(), key=lambda r: r["rank"])
    exact_on_sample = sorted(
        selection.kcenter_select(
            emb.filter(F.col("vec_id") % 2 == 0), k=5
        ).collect(),
        key=lambda r: r["rank"],
    )
    assert [
        (r["rank"], r["vec_id"], r["kc_dist"]) for r in rows
    ] == [tuple(r) for r in exact_on_sample]
    # all sampled ids obey the sample predicate
    assert all(r["vec_id"] % 2 == 0 for r in rows)
    # radius re-derivation
    centers = emb.join(
        sampled.select("vec_id"), "vec_id", "left_semi"
    ).select("vec_id", "embedding")
    radius = (
        selection.coverage_assign(emb, centers)
        .agg(F.max("center_dist"))
        .first()[0]
    )
    assert all(abs(r["coverage_radius"] - radius) < 1e-9 for r in rows)


def test_kcenter_sampled_radius_near_exact(spark, sf_dir):
    """Quality of the sampled tier on the fixture: its full-corpus
    coverage radius stays within a small factor of the exact tier's.
    (Greedy-on-sample misses only regions thinner than ~sample_mod
    points; the fixture's embedding space has none, so the radii are
    close — this pins the trade-off claim with a number.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    sampled = selection.kcenter_select_sampled(emb, k=5, sample_mod=2)
    s_radius = sampled.select("coverage_radius").first()[0]
    exact = selection.kcenter_select(emb, k=5)
    centers = emb.join(
        exact.select("vec_id"), "vec_id", "left_semi"
    ).select("vec_id", "embedding")
    e_radius = (
        selection.coverage_assign(emb, centers)
        .agg(F.max("center_dist"))
        .first()[0]
    )
    assert s_radius <= 1.25 * e_radius + 1e-6, (s_radius, e_radius)


def test_kcenter_one_scan_per_round_and_no_block_leak(spark, sf_dir):
    """Two scale contracts of the exact tier, pinned by observation
    rather than docstring:

    1. lineage truncation works — total STAGES grow linearly in k
       (a regression that replays rounds 1..r-1 inside round r goes
       quadratic);
    2. every round's localCheckpoint blocks are freed — after the
       call returns, no new persistent RDDs remain (k rounds used to
       retain up to k corpus-sized copies)."""
    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint()
    sc = spark.sparkContext
    before_rdds = set(sc._jsc.getPersistentRDDs().keySet())

    def stages_for(k: int) -> int:
        group = f"kc_probe_{k}"
        sc.setJobGroup(group, "kcenter stage audit")
        try:
            selection.kcenter_select(emb, k=k).collect()
        finally:
            sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        n = 0
        for jid in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(jid)
            if info is not None:
                n += len(info.stageIds)
        return n

    s4, s8 = stages_for(4), stages_for(8)
    # linear growth: doubling k at most ~doubles stages (+ slack for
    # the constant setup jobs). Quadratic replay would make
    # s8 ≈ 4x s4 and trip this.
    assert s8 <= 2 * s4 + 6, (s4, s8)
    after_rdds = set(sc._jsc.getPersistentRDDs().keySet())
    leaked = after_rdds - before_rdds - {emb.rdd.id()}
    # the input's own checkpoint stays (we made it); kcenter's
    # per-round checkpoints must all be gone
    assert not leaked or len(leaked) <= 1, leaked


def test_mmr_over_ivf_matches_bruteforce_shortlist(spark, sf_dir):
    """The composed ANN-probe -> MMR path returns the SAME re-ranked
    rows as MMR over the exact brute-force shortlist on the planted
    corpus (both shortlists resolve to the 5 exact copies)."""
    import shutil
    import tempfile

    from delta_lake_platform_spark.queries.pipeline import (
        _planted_ann_corpus,
    )
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    queries_df, corpus = _planted_ann_corpus(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="mmr_ivf_")
    try:
        idx = ManagedTable(spark, f"{d}/idx")
        similarity.build_ivf_index(corpus, idx)
        short_ivf = similarity.ivf_probe_index(queries_df, idx, k=5, nprobe=4)
        short_bf = similarity.cosine_topk_bruteforce(queries_df, corpus, k=5)
        vecs = corpus.select(
            F.col("vec_id").alias("neighbor_id"), "embedding"
        )
        out_ivf = selection.mmr_rerank(
            short_ivf.join(vecs, "neighbor_id"), k=4, lambda_=0.7
        ).collect()
        out_bf = selection.mmr_rerank(
            short_bf.join(vecs, "neighbor_id"), k=4, lambda_=0.7
        ).collect()
        assert sorted(map(tuple, out_ivf)) == sorted(map(tuple, out_bf))
        assert len(out_ivf) == 40  # 10 queries x 4 picks
    finally:
        shutil.rmtree(d, ignore_errors=True)
