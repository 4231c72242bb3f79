"""Diversity-selection queries (operators/selection.py) with DuckDB
oracles: greedy k-center coreset selection, nearest-center coverage
assignment, and MMR re-rank of ANN shortlists.

The k-center and MMR oracles UNROLL the greedy rounds as CTE stages —
each stage is the same rounded-argmax-with-id-tie-break the Spark
operator performs, so the comparison is value-exact, not just
shape-level. Distances/marginals are rounded to 6 dp on both sides
before every argmax (the determinism contract in selection.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import selection, similarity
from ..sources.catalog import load_table
from .registry import register

# Directional (non-NULL, non-zero-norm) embeddings as DOUBLE[] — the
# same up-front filter kcenter_select/coverage_assign apply.
_E = """
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings
  WHERE embedding IS NOT NULL
    AND list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) > 0
)
"""

KCENTER_ORACLE = f"""
WITH {_E},
s1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
d1 AS (
  SELECT e.vec_id, e.v,
         ROUND(1 - list_cosine_similarity(e.v, s1.v), 6) AS d
  FROM e, s1
),
s2 AS (
  SELECT vec_id, v, d FROM d1
  WHERE vec_id NOT IN (SELECT vec_id FROM s1)
  ORDER BY d DESC, vec_id LIMIT 1
),
d2 AS (
  SELECT d1.vec_id, d1.v,
         LEAST(d1.d, ROUND(1 - list_cosine_similarity(d1.v, s2.v), 6)) AS d
  FROM d1, s2
),
s3 AS (
  SELECT vec_id, v, d FROM d2
  WHERE vec_id NOT IN (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2)
  ORDER BY d DESC, vec_id LIMIT 1
),
d3 AS (
  SELECT d2.vec_id, d2.v,
         LEAST(d2.d, ROUND(1 - list_cosine_similarity(d2.v, s3.v), 6)) AS d
  FROM d2, s3
),
s4 AS (
  SELECT vec_id, v, d FROM d3
  WHERE vec_id NOT IN (
    SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2
    UNION ALL SELECT vec_id FROM s3
  )
  ORDER BY d DESC, vec_id LIMIT 1
),
d4 AS (
  SELECT d3.vec_id, d3.v,
         LEAST(d3.d, ROUND(1 - list_cosine_similarity(d3.v, s4.v), 6)) AS d
  FROM d3, s4
),
s5 AS (
  SELECT vec_id, v, d FROM d4
  WHERE vec_id NOT IN (
    SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2
    UNION ALL SELECT vec_id FROM s3 UNION ALL SELECT vec_id FROM s4
  )
  ORDER BY d DESC, vec_id LIMIT 1
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS rank, vec_id, CAST(NULL AS DOUBLE) AS kc_dist FROM s1
  UNION ALL SELECT 2, vec_id, d FROM s2
  UNION ALL SELECT 3, vec_id, d FROM s3
  UNION ALL SELECT 4, vec_id, d FROM s4
  UNION ALL SELECT 5, vec_id, d FROM s5
)
ORDER BY rank
"""


@register("embeddings_kcenter_select", KCENTER_ORACLE)
def embeddings_kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy farthest-point coreset over the embeddings table: 5
    rounds, each ONE corpus pass (running min-distance folded with a
    single cosine against the newest center + TakeOrdered argmax)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return selection.kcenter_select(emb, k=5).orderBy("rank")


COVERAGE_ORACLE = f"""
WITH {_E},
c AS (SELECT vec_id AS center_id, v AS cv FROM e WHERE vec_id < 4),
scored AS (
  SELECT e.vec_id, c.center_id,
         ROUND(1 - list_cosine_similarity(e.v, c.cv), 6) AS d
  FROM e, c
),
ranked AS (
  SELECT vec_id, center_id, d,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, center_id) AS rn
  FROM scored
)
SELECT vec_id, center_id, d AS center_dist
FROM ranked WHERE rn = 1
ORDER BY vec_id
"""


@register("embeddings_coverage_assign", COVERAGE_ORACLE)
def embeddings_coverage_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-center assignment: 4 fixed centers unrolled into one
    zero-shuffle projection (struct-min over per-center cosines)."""
    emb = load_table(spark, sf_dir, "embeddings")
    centers = emb.filter(F.col("vec_id") < 4)
    return selection.coverage_assign(emb, centers).orderBy("vec_id")


# MMR: shortlist = exact top-10 cosine for 3 queries, then 4 greedy
# rounds. Stage pN picks rank N; its marginal is
# ROUND(0.7*rel - 0.3*max_sim_to_picked, 6) (first pick: raw rel).
MMR_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
scored AS (
  SELECT q.query_id, e.vec_id AS cand, e.v AS cv,
         list_cosine_similarity(q.qv, e.v) AS cos
  FROM q JOIN e ON q.query_id != e.vec_id
),
short AS (
  SELECT query_id, cand, cv, ROUND(cos, 6) AS rel,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand) AS rn
  FROM scored
),
cands AS (SELECT query_id, cand, cv, rel FROM short WHERE rn <= 10),
p1 AS (
  SELECT query_id, cand AS cand1, cv AS cv1, ROUND(rel, 6) AS score1
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY ROUND(rel, 6) DESC, cand) AS rn
    FROM cands
  ) WHERE rn = 1
),
m2 AS (
  SELECT c.query_id, c.cand, c.cv, c.rel,
         ROUND(0.7 * c.rel
               - 0.3 * list_cosine_similarity(c.cv, p1.cv1), 6) AS marg
  FROM cands c JOIN p1 USING (query_id)
  WHERE c.cand != p1.cand1
),
p2 AS (
  SELECT query_id, cand AS cand2, cv AS cv2, marg AS score2
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY marg DESC, cand) AS rn
    FROM m2
  ) WHERE rn = 1
),
m3 AS (
  SELECT c.query_id, c.cand, c.cv, c.rel,
         ROUND(0.7 * c.rel - 0.3 * GREATEST(
           list_cosine_similarity(c.cv, p1.cv1),
           list_cosine_similarity(c.cv, p2.cv2)), 6) AS marg
  FROM cands c JOIN p1 USING (query_id) JOIN p2 USING (query_id)
  WHERE c.cand != p1.cand1 AND c.cand != p2.cand2
),
p3 AS (
  SELECT query_id, cand AS cand3, cv AS cv3, marg AS score3
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY marg DESC, cand) AS rn
    FROM m3
  ) WHERE rn = 1
),
m4 AS (
  SELECT c.query_id, c.cand, c.cv, c.rel,
         ROUND(0.7 * c.rel - 0.3 * GREATEST(
           list_cosine_similarity(c.cv, p1.cv1),
           list_cosine_similarity(c.cv, p2.cv2),
           list_cosine_similarity(c.cv, p3.cv3)), 6) AS marg
  FROM cands c
  JOIN p1 USING (query_id) JOIN p2 USING (query_id) JOIN p3 USING (query_id)
  WHERE c.cand != p1.cand1 AND c.cand != p2.cand2 AND c.cand != p3.cand3
),
p4 AS (
  SELECT query_id, cand AS cand4, marg AS score4
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY marg DESC, cand) AS rn
    FROM m4
  ) WHERE rn = 1
)
SELECT * FROM (
  SELECT query_id, cand1 AS neighbor_id, score1 AS mmr_score,
         CAST(1 AS BIGINT) AS mmr_rank FROM p1
  UNION ALL SELECT query_id, cand2, score2, 2 FROM p2
  UNION ALL SELECT query_id, cand3, score3, 3 FROM p3
  UNION ALL SELECT query_id, cand4, score4, 4 FROM p4
)
ORDER BY query_id, mmr_rank
"""


@register("embeddings_mmr_rerank", MMR_ORACLE)
def embeddings_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR re-rank of exact top-10 shortlists for 3 queries: the greedy
    loop runs per query inside one applyInPandas group (bounded
    candidates per task, parallel across queries)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 3)
    shortlist = similarity.cosine_topk_bruteforce(queries_df, emb, k=10)
    cands = shortlist.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    return selection.mmr_rerank(cands, k=4, lambda_=0.7).orderBy(
        "query_id", "mmr_rank"
    )


# --- sampled k-center (r11) --------------------------------------------------

def _kcenter_stages(k: int, src: str) -> str:
    """Unrolled greedy k-center CTE stages over source CTE ``src``:
    the same rounded-argmax-with-id-tie-break per round as
    selection.kcenter_select, value-exact. Returns the CTE text for
    s1..s{k} / d1..d{k-1} (callers add the final UNION)."""
    parts = [
        f"s1 AS (SELECT vec_id, v FROM {src} ORDER BY vec_id LIMIT 1)",
        f"""d1 AS (
  SELECT {src}.vec_id, {src}.v,
         ROUND(1 - list_cosine_similarity({src}.v, s1.v), 6) AS d
  FROM {src}, s1
)""",
    ]
    for r in range(2, k + 1):
        prior = " UNION ALL ".join(
            f"SELECT vec_id FROM s{i}" for i in range(1, r)
        )
        parts.append(
            f"""s{r} AS (
  SELECT vec_id, v, d FROM d{r - 1}
  WHERE vec_id NOT IN ({prior})
  ORDER BY d DESC, vec_id LIMIT 1
)"""
        )
        if r < k:
            parts.append(
                f"""d{r} AS (
  SELECT d{r - 1}.vec_id, d{r - 1}.v,
         LEAST(d{r - 1}.d,
               ROUND(1 - list_cosine_similarity(d{r - 1}.v, s{r}.v), 6)) AS d
  FROM d{r - 1}, s{r}
)"""
            )
    return ",\n".join(parts)


def _kcenter_union(k: int) -> str:
    rows = [
        "SELECT CAST(1 AS BIGINT) AS rank, vec_id,"
        " CAST(NULL AS DOUBLE) AS kc_dist FROM s1"
    ]
    rows += [f"SELECT {r}, vec_id, d FROM s{r}" for r in range(2, k + 1)]
    return " UNION ALL ".join(rows)


# sampled tier: greedy on the vec_id%2==0 half, then the full-corpus
# coverage radius (max over rows of the rounded min distance to the
# selected centers) — the oracle replays BOTH the sampled greedy and
# the full sweep.
KCENTER_SAMPLED_ORACLE = f"""
WITH {_E},
es AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 0),
{_kcenter_stages(5, "es")},
centers AS (
  SELECT v FROM s1 UNION ALL SELECT v FROM s2 UNION ALL SELECT v FROM s3
  UNION ALL SELECT v FROM s4 UNION ALL SELECT v FROM s5
),
cov AS (
  SELECT MAX(md) AS coverage_radius FROM (
    SELECT ef.vec_id,
           MIN(ROUND(1 - list_cosine_similarity(ef.v, c.v), 6)) AS md
    FROM e ef CROSS JOIN centers c GROUP BY ef.vec_id
  )
)
SELECT rank, vec_id, kc_dist,
       (SELECT coverage_radius FROM cov) AS coverage_radius
FROM ({_kcenter_union(5)})
ORDER BY rank
"""


@register("embeddings_kcenter_sampled", KCENTER_SAMPLED_ORACLE)
def embeddings_kcenter_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-coreset tier (selection.kcenter_select_sampled): greedy
    k-center on the deterministic 1-in-2 subsample, then ONE
    coverage_assign sweep over the full corpus reporting the achieved
    radius — k passes over n/2 rows + 1 over n, the shape that
    survives k in the thousands at 100 TB."""
    emb = load_table(spark, sf_dir, "embeddings")
    return selection.kcenter_select_sampled(
        emb, k=5, sample_mod=2
    ).orderBy("rank")


# --- MMR over a persisted-IVF shortlist (r11) --------------------------------

# The composed serving path a real pipeline runs: ANN probe feeds the
# diversity re-rank. On the planted corpus (pipeline.py::
# _planted_ann_corpus) the probe's top-5 for each query is PROVABLY
# its 5 exact copies (cosine 1.0 vs natural max ~0.51; an exact copy
# assigns to the query's own argmax centroid — the first probe), so
# the MMR stage's input is a constant and its greedy is too: all
# relevances round to 1.0 and all pairwise sims are 1.0, so pick 1 is
# the smallest neighbor id at score 1.0 and every later pick scores
# lambda - (1-lambda) = 0.4, ids ascending. Any regression in the
# probe join, the partition pruning, the vector join-back, or the
# greedy loop breaks the constant and hash-mismatches.
MMR_IVF_ORACLE = """
SELECT q.vec_id AS query_id,
       q.vec_id * 100 + 2000000 + t.j AS neighbor_id,
       CASE WHEN t.j = 0 THEN 1.0 ELSE 0.4 END AS mmr_score,
       CAST(t.j + 1 AS BIGINT) AS mmr_rank
FROM embeddings q CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS j) t
WHERE q.vec_id < 10
ORDER BY query_id, mmr_rank
"""


@register("embeddings_mmr_ivf", MMR_IVF_ORACLE)
def embeddings_mmr_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR re-rank over a PERSISTED-IVF shortlist: ivf_probe_index
    (partition-pruned cells, no corpus pass) -> join candidate vectors
    back from the index itself -> per-query greedy inside
    applyInPandas. The brute-force-shortlist equivalence on this
    corpus is pinned in tests/test_selection.py."""
    from .pipeline import _ivf_index, _planted_ann_corpus

    queries_df, _ = _planted_ann_corpus(spark, sf_dir)
    idx = _ivf_index(spark, sf_dir)
    short = similarity.ivf_probe_index(queries_df, idx, k=5, nprobe=4)
    cands = short.join(
        idx.read().select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    return selection.mmr_rerank(cands, k=4, lambda_=0.7).orderBy(
        "query_id", "mmr_rank"
    )
