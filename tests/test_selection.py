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
