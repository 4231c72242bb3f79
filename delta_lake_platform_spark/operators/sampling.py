"""Deterministic sampling for pipeline reproducibility.

``df.sample()`` is seed-stable only for a fixed partitioning — a
repartitioned or incrementally-grown input samples differently. These
operators key the decision on row CONTENT, so the same row is always
in or out regardless of layout, executors, or retries:

- ``hash_sample``: keep rows where hash(key) mod M < frac*M. O(1)
  per row, no shuffle, stable under any partitioning.
- ``stratified_hash_sample``: per-stratum fractions with the same
  guarantee.
- ``reservoir_sample``: exact-size uniform sample via per-partition
  reservoirs merged on the driver — the mapPartitions "last resort"
  pattern (SURVEY §2: RDD-free elsewhere); for when an exact k is
  required rather than a fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 1_000_000


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    gate = int(fraction * _M)
    return df.filter(F.pmod(F.xxhash64(F.col(key_col)), F.lit(_M)) < gate)


def stratified_hash_sample(
    df: DataFrame, key_col: str, stratum_col: str, fractions: dict[str, float]
) -> DataFrame:
    gate = F.lit(0)
    expr = None
    for value, frac in fractions.items():
        cond = F.col(stratum_col) == value
        g = int(frac * _M)
        expr = F.when(cond, g) if expr is None else expr.when(cond, g)
    gate = expr.otherwise(0) if expr is not None else gate
    return df.filter(F.pmod(F.xxhash64(F.col(key_col)), F.lit(_M)) < gate)


def reservoir_sample(df: DataFrame, k: int, key_col: str) -> DataFrame:
    """Exact-k sample, deterministic given content: global top-k by
    hash value (equivalent to a uniform k-sample under a random hash).
    Implemented as the rank idiom so Spark plans a partial top-k —
    no full sort, no driver collect of the data."""
    ranked = df.withColumn("__h", F.xxhash64(F.col(key_col)))
    return (
        ranked.orderBy("__h").limit(k).drop("__h")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    pos: int = 9,
    round_decimals: int = 6,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, A-ES): each row gets key ``u^(1/w)`` for a uniform u derived
    from sha-256 of its id; the k largest keys are a weight-
    proportional sample. Deterministic the same way the other
    samplers here are — u is a property of the ROW, so the selected
    set survives repartitioning and task retries. Unlike the
    threshold-based ``hash_sample``, membership is NOT stable under
    corpus growth: a fixed-k without-replacement sample is the top-k
    of the key order, so new rows with higher keys evict existing
    members (inherent to fixed-k sampling, not an implementation
    artifact).

    Rows with NULL or non-positive weight are excluded (they have no
    sampling mass). Keys are rounded BEFORE the top-k (ties broken by
    id) so the selected set and order are engine-reproducible.

    Physical shape: one projection + a distributed TakeOrdered
    (orderBy + limit) — no shuffle of the corpus, no driver-side
    state, any scale. ``pos`` picks the digest window, decorrelating
    this decision from ``hash_bucket``-based splits on the same ids.

    Output: every df column plus ``sample_key`` and ``rank`` (1..k).
    """
    if k <= 0:
        raise ValueError("weighted_sample requires k >= 1")
    u = (
        F.conv(
            F.substring(F.sha2(F.col(id_col).cast("string"), 256), pos, 8),
            16, 10,
        ).cast("double")
        + 1.0
    ) / F.lit(4294967296.0)
    key = F.round(
        F.pow(u, 1.0 / F.col(weight_col).cast("double")), round_decimals
    )
    from pyspark.sql import Window

    scored = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("sample_key", key)
        .orderBy(F.desc("sample_key"), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("sample_key"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w))
