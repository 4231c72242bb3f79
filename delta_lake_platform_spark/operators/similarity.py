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

Per-pair cosine scoring is JVM higher-order functions
(zip_with/aggregate) in double precision; the centroid/probe
assignment is an Arrow-batched pandas_udf (one BLAS matmul per batch —
measured ~100x faster than the equivalent literal expression tree,
which falls out of whole-stage codegen at this width).
"""

from __future__ import annotations

import pandas as pd
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


def deterministic_planes(n: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random coefficient matrix (numpy PCG with a
    fixed seed — stable across runs and machines). Computed ONCE on the
    driver and shipped as literals: the alternative (hash expressions
    per row) re-derives row-independent constants n*dim times per row,
    which dominated the scan cost at bench."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return (rng.uniform(-1.0, 1.0, size=(n, dim))).tolist()


def _centroid_matrix(dim: int, n_centroids: int):
    """(normalized centroid matrix, raw) — computed once on the driver."""
    import numpy as np

    cents = np.asarray(deterministic_planes(n_centroids, dim, seed=7))
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def ivf_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
) -> DataFrame:
    """Assign each vector to its nearest (max-cosine) centroid. At scale
    the output is partitioned/bucketed by centroid_id at write time.

    The assignment is an Arrow-batched pandas_udf doing one BLAS matmul
    per batch: a pure-expression formulation (16x64 literal tree) falls
    out of whole-stage codegen and ran ~100x slower at bench.
    """
    from pyspark.sql.functions import pandas_udf

    cn = _centroid_matrix(dim, n_centroids)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        import numpy as np

        m = np.stack(vecs.to_numpy()).astype("float64")
        return pd.Series(np.argmax(m @ cn.T, axis=1).astype("int32"))

    return df.withColumn("centroid_id", assign(F.col(vec_col)))


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
    from pyspark.sql.functions import pandas_udf

    corpus_assigned = ivf_assign(corpus, vec_col, dim, n_centroids)

    cn = _centroid_matrix(dim, n_centroids)

    @pandas_udf("array<int>")
    def probe_list(vecs: pd.Series) -> pd.Series:
        import numpy as np

        m = np.stack(vecs.to_numpy()).astype("float64")
        order = np.argsort(-(m @ cn.T), axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype("int32")))

    q = queries.select(
        F.col(q_id).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(probe_list(F.col(vec_col))).alias("centroid_id"),
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
