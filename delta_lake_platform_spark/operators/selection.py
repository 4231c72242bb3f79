"""Diversity-driven data selection over embedding columns.

Training-data curation prunes by quality (operators/text.py), by
duplication (operators/dedup.py), and — the axis this module adds — by
COVERAGE: pick the subset that best spans the embedding space, so the
kept data is maximally diverse per token. Two standard selectors:

- ``kcenter_select``: greedy farthest-point traversal (Gonzalez 1985),
  the classic 2-approximation to the k-center objective and the
  selection rule behind coreset-based data pruning (Sener & Savarese
  2018, "Active Learning for CNNs: A Core-Set Approach"). Each round
  adds the point FARTHEST from everything selected so far.
- ``mmr_rerank``: Maximal Marginal Relevance (Carbonell & Goldstein
  1998) — re-rank an ANN candidate shortlist per query, trading
  relevance against redundancy with the already-picked results.

Scale shapes (the part that matters at 100 TB):

- ``kcenter_select`` is inherently iterative (k rounds), but each round
  is ONE distributed pass: the running min-distance-to-selected column
  is updated with a single cosine against the newest center (not
  recomputed against all centers) and the argmax is a TakeOrdered
  (orderBy+limit(1)) — no shuffle of the corpus, no pairwise matrix.
  The state (id, vector, running distance) is re-materialized per round
  with an eager localCheckpoint, so round r never replays rounds
  1..r-1; total cost is TWO corpus-sized passes per round (materialize
  the folded state + the argmax read over it), ~2k passes overall — the
  point is the constant, not replayed, per-round cost. k is bounded by
  contract
  (coresets are 10^2-10^3 centers); the selected set — k vectors —
  lives on the driver and enters each round's plan as literals, the
  same broadcast-the-small-side rule every other operator here follows.
- ``mmr_rerank`` is greedy PER QUERY over a candidate list that an ANN
  stage already cut to tens of rows, so the greedy loop runs inside
  one ``applyInPandas`` group — bounded memory per task, parallel
  across queries, and never sees the corpus.

Determinism: distances are rounded (default 6 dp) BEFORE every argmax
and ties break on the id column, so the selected set is reproducible
across engines, partitionings, and retries — the property the DuckDB
oracle checks value-for-value.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType
)

from ..functions.vectors import cosine_similarity, l2_norm


def _lit_vec(vals: list[float]):
    return F.array(*[F.lit(float(x)) for x in vals])


def kcenter_select(
    corpus: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> DataFrame:
    """Greedy k-center (farthest-point) selection under cosine distance.

    Seed = the row with the smallest id (deterministic, engine-
    agnostic). Each subsequent round picks the row with the LARGEST
    running distance to its nearest selected center (rounded, ties by
    smallest id), then folds one cosine against the new center into the
    running distance with ``least``. Rows with NULL or zero-norm
    vectors carry no direction and are excluded up front.

    Returns a k-row DataFrame: ``rank`` (1..k, selection order),
    ``id_col``, and ``kc_dist`` — the distance that won the round
    (NULL for the seed). ``kc_dist`` is non-increasing in rank and
    ``kc_dist[k+1]`` would be the coverage radius: the standard
    stopping diagnostic (select until the radius is small enough).

    Stops early (fewer than k rows) when the corpus runs out.
    """
    if k <= 0:
        raise ValueError("kcenter_select requires k >= 1")
    spark = corpus.sparkSession
    base = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("__v"))
        .filter(F.col(vec_col).isNotNull() & (l2_norm(vec_col) > 0))
    )
    seed_rows = base.orderBy(F.col(id_col)).limit(1).collect()
    out_schema = StructType(
        [
            StructField("rank", LongType()),
            StructField(id_col, LongType()),
            StructField("kc_dist", DoubleType()),
        ]
    )
    if not seed_rows:
        return spark.createDataFrame([], out_schema)
    seed = seed_rows[0]
    picked: list[tuple[int, int, float | None]] = [(1, seed[id_col], None)]

    def dist_to(center: list[float]):
        return F.round(
            F.lit(1.0) - cosine_similarity(F.col("__v"), _lit_vec(center)),
            round_decimals,
        )

    # Running min-distance state: one cosine per row per round. The
    # eager localCheckpoint truncates lineage so round r is O(one
    # scan), not a replay of rounds 1..r-1. Each round's checkpoint
    # fully materializes its own blocks, so the PRIOR round's blocks
    # are dead the moment the new one lands — free them explicitly
    # (localCheckpoint persists the internal RDD, which
    # DataFrame.unpersist cannot reach), else k rounds retain up to k
    # corpus-sized (id, vector, dist) copies in executor storage.
    sc = spark.sparkContext

    def _ckpt(df: DataFrame, prior_ids: set[int]) -> tuple[DataFrame, set]:
        before = set(sc._jsc.getPersistentRDDs().keySet())
        out = df.localCheckpoint(eager=True)
        mine = set(sc._jsc.getPersistentRDDs().keySet()) - before
        jmap = sc._jsc.getPersistentRDDs()
        for rid in prior_ids:
            jr = jmap.get(rid)
            if jr is not None:
                jr.unpersist(False)
        return out, mine

    ckpt_ids: set[int] = set()
    state = base.withColumn("__d", dist_to([float(x) for x in seed["__v"]]))
    for r in range(2, k + 1):
        state, ckpt_ids = _ckpt(state, ckpt_ids)
        far = (
            state.filter(~F.col(id_col).isin([p[1] for p in picked]))
            .orderBy(F.desc("__d"), F.col(id_col))
            .limit(1)
            .collect()
        )
        if not far:
            break
        row = far[0]
        picked.append((r, row[id_col], float(row["__d"])))
        state = state.withColumn(
            "__d",
            F.least(F.col("__d"), dist_to([float(x) for x in row["__v"]])),
        )
    # picked is complete: the final round's blocks are dead too.
    jmap = sc._jsc.getPersistentRDDs()
    for rid in ckpt_ids:
        jr = jmap.get(rid)
        if jr is not None:
            jr.unpersist(False)
    return spark.createDataFrame(picked, out_schema)


def kcenter_select_sampled(
    corpus: DataFrame,
    k: int,
    sample_mod: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> DataFrame:
    """Sampled tier of greedy k-center, for corpora where k full passes
    are the scale-killer (k in the thousands x 100 TB): run the exact
    greedy on a deterministic 1-in-``sample_mod`` subsample, then ONE
    ``coverage_assign`` sweep over the FULL corpus reports the achieved
    coverage radius. Total cost: k passes over n/sample_mod rows plus
    one pass over n — vs k passes over n for the exact tier.

    The subsample is ``id % sample_mod == 0``: deterministic and
    oracle-replayable. Production ids with periodic structure should
    hash first (``xxhash64(id) % mod``); the selection quality argument
    is the same either way — a uniform 1/m sample preserves cluster
    structure, and greedy-on-sample is the standard coreset
    construction (each greedy round only needs SOME far point, and a
    uniform sample contains one for every region big enough to
    matter). Regions smaller than ~sample_mod points can be missed
    entirely — that is the quantified trade, and ``coverage_radius``
    is its measurement: the max over the full corpus of the (rounded)
    distance to the nearest selected center, i.e. exactly what the
    exact tier's kc_dist[k+1] would bound.

    Returns the k selected centers (``rank``, id, ``kc_dist`` — all
    computed within the sample) plus the full-corpus
    ``coverage_radius`` repeated on every row.
    """
    if sample_mod < 1:
        raise ValueError("kcenter_select_sampled requires sample_mod >= 1")
    sample = corpus.filter(
        F.pmod(F.col(id_col), F.lit(sample_mod)) == 0
    )
    sel = kcenter_select(
        sample, k, vec_col=vec_col, id_col=id_col,
        round_decimals=round_decimals,
    )
    ids = [r[id_col] for r in sel.select(id_col).collect()]
    if not ids:
        return sel.withColumn(
            "coverage_radius", F.lit(None).cast("double")
        )
    centers = corpus.filter(F.col(id_col).isin(ids)).select(
        id_col, vec_col
    )
    cov = coverage_assign(
        corpus, centers, vec_col=vec_col, id_col=id_col,
        center_id_col=id_col, round_decimals=round_decimals,
    )
    radius = cov.agg(F.max("center_dist").alias("r")).first()["r"]
    return sel.withColumn(
        "coverage_radius", F.lit(float(radius)).cast("double")
    )


def coverage_assign(
    corpus: DataFrame,
    centers: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    center_id_col: str = "vec_id",
    round_decimals: int = 6,
) -> DataFrame:
    """Assign every corpus row to its nearest selected center (cosine
    distance, rounded; ties to the smallest center id) — the second
    half of coreset selection: keep one representative per region, or
    weight each center by how much corpus it covers.

    ``centers`` must be small (it is a selection — k rows); it is
    collected to the driver and unrolled into ONE projection of k
    cosines + a least/argmin chain, so the corpus is scanned once with
    zero shuffles and zero UDFs.

    Output: every corpus row's id, ``center_id``, ``center_dist``.
    """
    rows = centers.select(
        F.col(center_id_col).alias("__cid"), F.col(vec_col).alias("__cv")
    ).collect()
    if not rows:
        raise ValueError("coverage_assign requires at least one center")
    base = corpus.select(F.col(id_col), F.col(vec_col).alias("__v")).filter(
        F.col(vec_col).isNotNull() & (l2_norm(vec_col) > 0)
    )
    # struct-min trick: min over (dist, center_id) structs = nearest
    # center with smallest-id tie-break, in one expression.
    pairs = [
        F.struct(
            F.round(
                F.lit(1.0)
                - cosine_similarity(F.col("__v"), _lit_vec(list(r["__cv"]))),
                round_decimals,
            ).alias("d"),
            F.lit(int(r["__cid"])).cast("long").alias("cid"),
        )
        for r in rows
    ]
    best = F.array_min(F.array(*pairs))
    return base.select(
        id_col,
        best["cid"].alias("center_id"),
        best["d"].alias("center_dist"),
    )


def mmr_rerank(
    scored: DataFrame,
    k: int,
    lambda_: float = 0.7,
    query_col: str = "query_id",
    cand_col: str = "neighbor_id",
    rel_col: str = "cosine",
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> DataFrame:
    """Maximal Marginal Relevance re-rank of a per-query candidate
    shortlist: greedily pick the candidate maximizing

        lambda * relevance  -  (1 - lambda) * max_similarity_to_picked

    (Carbonell & Goldstein 1998). ``scored`` is the output of an ANN
    stage joined back to candidate vectors: one row per (query,
    candidate) with the relevance score and the candidate's vector.
    The greedy loop is sequential IN k but runs per query group inside
    ``applyInPandas`` — tens of candidates per task, parallel across
    queries, no driver involvement.

    Scores are rounded before each argmax and ties break on the
    candidate id, so the picked set is engine-reproducible.

    Output: query_col, cand_col, ``mmr_score`` (the winning marginal
    score; relevance itself for the first pick), ``mmr_rank`` (1..k).
    """
    if k <= 0:
        raise ValueError("mmr_rerank requires k >= 1")
    import numpy as np
    import pandas as pd

    lam = float(lambda_)
    rd = int(round_decimals)

    out_schema = StructType(
        [
            scored.schema[query_col],
            scored.schema[cand_col],
            StructField("mmr_score", DoubleType()),
            StructField("mmr_rank", LongType()),
        ]
    )

    def _one_query(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(cand_col).reset_index(drop=True)
        vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        picked_idx: list[int] = []
        picked_score: list[float] = []
        remaining = list(range(n))
        for _ in range(min(k, n)):
            if not picked_idx:
                marg = rel[remaining]
            else:
                sim = unit[remaining] @ unit[picked_idx].T
                marg = lam * rel[remaining] - (1 - lam) * sim.max(axis=1)
            marg = np.round(marg, rd)
            # argmax with smallest-candidate-id tie-break: remaining is
            # sorted by cand id, and np.argmax returns the FIRST max.
            j = int(np.argmax(marg))
            picked_idx.append(remaining[j])
            picked_score.append(float(marg[j]))
            remaining.pop(j)
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[picked_idx].to_numpy(),
                cand_col: pdf[cand_col].iloc[picked_idx].to_numpy(),
                "mmr_score": picked_score,
                "mmr_rank": list(range(1, len(picked_idx) + 1)),
            }
        )

    return (
        scored.select(query_col, cand_col, rel_col, vec_col)
        .groupBy(query_col)
        .applyInPandas(_one_query, out_schema)
    )


__all__ = [
    "kcenter_select", "kcenter_select_sampled", "coverage_assign",
    "mmr_rerank",
]
