"""Heavy-hitter / frequent-item operators.

The reference has no approximate aggregation surface (SURVEY.md §2.4:
only count/count-distinct assertions, test_scd_handler.py:109,166), but
a 100 TB curation pipeline needs frequency analysis over unbounded key
domains (which users/domains/dedup-clusters dominate the corpus).

Two tiers, mirroring the exact-baseline + sketch-scale-path pattern used
for percentiles (queries/warehouse_extra.py):

- ``heavy_hitters_exact``: two-phase exact counting. groupBy(key).count
  does map-side partial aggregation, so the shuffle carries at most
  (#distinct keys x #partitions) pre-aggregated rows, not the raw data;
  the global total rides along as a broadcast scalar. This is the
  correctness baseline and is itself scale-safe for key domains that fit
  a shuffle (users, domains — up to ~1e9 keys).
- ``frequent_items_approx``: Spark's built-in one-pass sketch
  (``DataFrame.freqItems``, Karp et al. misra-gries variant) for the
  truly unbounded case; support-bounded, may overreport — pair with an
  exact recount of the returned candidates (sketch-for-candidates,
  exact-verify, same discipline as dedup.py's SimHash pairing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters_exact(
    df: DataFrame, key_cols: list[str], min_share: float | None = None,
    k: int | None = None,
) -> DataFrame:
    """Keys holding >= ``min_share`` of all rows, and/or the top ``k``
    by count. Output: key cols + ``cnt`` + ``share`` (rounded to 6).

    One shuffle (partial-agg groupBy); the total-count side is a single
    broadcast row, so the share computation adds no exchange.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    total = df.select(F.count(F.lit(1)).alias("__total"))
    out = counts.crossJoin(F.broadcast(total)).select(
        *key_cols,
        "cnt",
        F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
    )
    if min_share is not None:
        out = out.filter(F.col("share") >= min_share)
    out = out.orderBy(F.col("cnt").desc(), *key_cols)
    if k is not None:
        out = out.limit(k)
    return out


def mg_truncate(
    counts: DataFrame,
    m: int,
    key_col: str,
    count_col: str = "mg_count",
) -> DataFrame:
    """Truncate a per-key count table to an m-counter Misra-Gries
    summary: subtract the (m+1)-th largest count from every counter and
    drop the non-positive ones (a no-op when there are <= m keys — the
    counts stay EXACT in that regime).

    This is the decrement step of the MERGEABLE MG summary (Agarwal et
    al. 2012, "Mergeable Summaries"): summing two summaries per key and
    truncating the result is again a valid summary, with total
    undercount bounded by N/(m+1) across any merge tree — which is what
    lets a stream fold batch summaries into a persisted state table
    without replaying history (streaming/heavy_hitters.py).

    Estimates never exceed true counts; any key with true count above
    the accumulated decrement total survives. One TakeOrdered for the
    threshold scalar + one filtered projection — no extra shuffle
    beyond the groupBy that produced ``counts``.
    """
    if m <= 0:
        raise ValueError("mg_truncate requires m >= 1")
    thr_rows = (
        counts.select(F.col(count_col).alias("__c"))
        .orderBy(F.desc("__c"))
        .offset(m)
        .limit(1)
        .collect()
    )
    if not thr_rows:
        return counts
    t = thr_rows[0]["__c"]
    return (
        counts.withColumn(count_col, F.col(count_col) - F.lit(t))
        .filter(F.col(count_col) > 0)
    )


def frequent_items_approx(
    df: DataFrame, key_col: str, support: float = 0.01
) -> list:
    """Candidate heavy hitters via the one-pass misra-gries sketch
    (``freqItems``). Returns the candidate list (driver-side, tiny by
    construction: at most 1/support items). False positives possible;
    verify with ``heavy_hitters_exact`` over the candidate set."""
    row = df.freqItems([key_col], support=support).first()
    return sorted(row[f"{key_col}_freqItems"])


def distinct_sketch_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count SKETCHES (Apache
    DataSketches HllSketch via Spark's ``hll_sketch_agg``) — the
    mergeable form of count-distinct. Unlike an exact
    ``count(DISTINCT)``, whose shuffle carries every distinct value,
    the sketch is a fixed ~``2^lg_config_k``-byte register bank that
    partial-aggregates map-side and MERGES: per-partition, per-day, or
    per-table sketches combine losslessly with ``hll_union_agg``, which
    is what makes incremental / distributed distinct counting viable at
    100 TB (store a sketch per ingest batch; the corpus-wide distinct
    is a union, not a rescan)."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias("hll"),
        F.count_distinct(value_col).alias("exact_distinct"),
    )


def distinct_union_estimate(
    sketches: DataFrame, hll_col: str = "hll"
) -> DataFrame:
    """Union pre-built group sketches into one corpus-wide estimate —
    no re-touching of the underlying rows (the merge property exact
    count-distinct fundamentally lacks)."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(hll_col)).alias(
            "union_estimate"
        )
    )


def set_overlap_theta(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Distinct-SET algebra from mergeable Theta sketches (Apache
    DataSketches via ``theta_sketch_agg``): one row estimating
    |A ∩ B| and |A \\ B| over the distinct ``value_col`` sets of two
    groups. HLL can only union; Theta's retained-hash-sample form also
    intersects and differences — the tool for audience-overlap /
    contamination-overlap questions at 100 TB, answered from per-group
    (or per-batch) sketches instead of a distinct-join over the raw
    rows. Sketches partial-aggregate map-side and merge, so the
    exchange carries two fixed-size sketches, not the value sets."""
    sk = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(group_col)
        .agg(F.theta_sketch_agg(value_col).alias("theta"))
    )
    wide = sk.groupBy().pivot(group_col, [group_a, group_b]).agg(
        F.first("theta")
    )
    a, b = f"`{group_a}`", f"`{group_b}`"
    return wide.select(
        F.theta_sketch_estimate(F.col(a)).alias("est_a"),
        F.theta_sketch_estimate(F.col(b)).alias("est_b"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col(a), F.col(b))
        ).alias("est_intersection"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col(a), F.col(b))
        ).alias("est_a_minus_b"),
    )
