"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce``: exact top-k per query — the correctness
  baseline. Query side is broadcast (queries << corpus), the corpus is
  scanned once, and the per-query top-k uses the window-rank idiom that
  Spark rewrites to a partial WindowGroupLimit: no global sort, no
  corpus shuffle beyond the rank's partition-by-query exchange.
- ``ivf_topk``: the scale path — a coarse IVF index: corpus vectors are
  assigned to their nearest of C hash-derived centroids at write time;
  queries probe only the ``nprobe`` nearest centroid partitions. On a
  real deployment the corpus side is written partitioned by
  ``centroid_id``, so a probe is partition-pruned I/O, not a scan.

All arithmetic is JVM higher-order functions (zip_with/aggregate) in
double precision — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    q_vec: str = "embedding",
    c_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors in ``corpus`` for each query row."""
    q = queries.select(
        F.col(q_id).alias("query_id"), F.col(q_vec).alias("__qv")
    )
    c = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("__cv"))
    scored = F.broadcast(q).crossJoin(c)
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qv"), F.col("__cv")).alias("__cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("__cos"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("__cos", 6).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _centroid_expr(dim: int, n_centroids: int):
    """Deterministic pseudo-random unit-ish centroids: coefficient for
    (centroid c, dim i) = xxhash64("c_i") scaled to [-1,1]. Stable across
    runs and engines — no fitted state to ship."""
    def centroid_vec(c):
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.xxhash64(
                F.concat(c.cast("string"), F.lit("_"), i.cast("string"))
            ).cast("double")
            / F.lit(float(2**63)),
        )

    return centroid_vec


def ivf_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
) -> DataFrame:
    """Assign each vector to its nearest (max-cosine) centroid. At scale
    the output is partitioned/bucketed by centroid_id at write time."""
    centroid_vec = _centroid_expr(dim, n_centroids)
    v = F.col(vec_col).cast("array<double>")
    sims = F.transform(
        F.sequence(F.lit(0), F.lit(n_centroids - 1)),
        lambda c: F.aggregate(
            F.zip_with(v, centroid_vec(c), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.sqrt(F.aggregate(centroid_vec(c), F.lit(0.0), lambda a, x: a + x * x)),
    )
    best = F.array_position(sims, F.array_max(sims)) - 1
    return df.withColumn("centroid_id", best.cast("int"))


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    dim: int = 64,
    n_centroids: int = 16,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest centroid cells.

    Join is an equi-join on centroid_id (queries exploded to their probe
    list, broadcast), so the corpus is filtered to ~nprobe/C of its rows
    before any distance math."""
    centroid_vec = _centroid_expr(dim, n_centroids)
    corpus_assigned = ivf_assign(corpus, vec_col, dim, n_centroids)

    qv = F.col(vec_col).cast("array<double>")
    sims = F.transform(
        F.sequence(F.lit(0), F.lit(n_centroids - 1)),
        lambda c: F.aggregate(
            F.zip_with(qv, centroid_vec(c), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.sqrt(F.aggregate(centroid_vec(c), F.lit(0.0), lambda a, x: a + x * x)),
    )
    # indices of the nprobe best centroids
    probes = F.slice(
        F.reverse(
            F.transform(
                F.array_sort(
                    F.zip_with(
                        sims,
                        F.sequence(F.lit(0), F.lit(n_centroids - 1)),
                        lambda s, i: F.struct(s.alias("s"), i.alias("i")),
                    )
                ),
                lambda st: st["i"],
            )
        ),
        1,
        nprobe,
    )
    q = queries.select(
        F.col(q_id).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(probes).alias("centroid_id"),
    )
    joined = F.broadcast(q).join(corpus_assigned, on="centroid_id").select(
        "query_id",
        F.col(c_id).alias("neighbor_id"),
        cosine_similarity(F.col("__qv"), F.col(vec_col)).alias("__cos"),
    )
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.col("neighbor_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("__cos", 6).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
