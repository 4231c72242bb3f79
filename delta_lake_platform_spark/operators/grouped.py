"""Custom grouped aggregates via applyInPandas (grouped-map Pandas UDF).

The escalation ladder for operators Spark lacks (SURVEY.md §7 /
project brief): (a) compose built-ins, else (b) Arrow-batched
applyInPandas / mapInPandas, else (c) mapPartitions. This module is the
(b) tier for *grouped* computation: each group arrives as one pandas
DataFrame after the groupBy shuffle, so the per-group logic can be
arbitrary (multi-pass, order-dependent) while the distribution story
stays Spark's: one hash shuffle on the keys, groups processed in
parallel across executors, Arrow both ways.

Scale caveat baked into the contract: a single group must fit in one
executor's memory (same constraint Spark's own window functions have
per partition-key). Key-skew is the failure mode — salt upstream or
bound group size if a key can be pathological.

Median absolute deviation is the demonstrator because it needs two
ordered passes over the group (median, then median of deviations),
while DuckDB's built-in ``mad()`` provides an exact oracle. Spark 4's
exact ``percentile`` aggregate CAN express it as two grouped
aggregations (``value_mad_per_user_builtin``) — kept side by side with
the grouped-map version deliberately: the JVM two-shuffle plan beats
one shuffle + per-group Python by ~5x, the measured version of "UDFs
are the slow path".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_SCHEMA = "user_id long, n long, median_value double, mad_value double"


def value_mad_per_user(
    events: DataFrame, key_col: str = "user_id", val_col: str = "value"
) -> DataFrame:
    """Per-key count, continuous median, and median absolute deviation
    (both medians linearly interpolated, matching DuckDB median()/mad())."""

    def mad(pdf):
        import numpy as np
        import pandas as pd

        v = pdf[val_col].to_numpy(dtype="float64")
        med = float(np.median(v))
        return pd.DataFrame(
            {
                "user_id": [int(pdf[key_col].iloc[0])],
                "n": [len(v)],
                "median_value": [med],
                "mad_value": [float(np.median(np.abs(v - med)))],
            }
        )

    return events.groupBy(key_col).applyInPandas(mad, schema=MAD_SCHEMA)


def value_mad_per_user_builtin(
    events: DataFrame, key_col: str = "user_id", val_col: str = "value"
) -> DataFrame:
    """Same result, no Python on the data path: per-key exact median
    (agg 1), broadcast the #keys-row medians back onto the events, then
    exact median of absolute deviations (agg 2). Two hash shuffles of
    the fact table, both whole-stage-codegen; the join ships only the
    tiny per-key medians."""
    v = F.col(val_col)
    med = events.groupBy(key_col).agg(
        F.count(v).alias("n"),
        F.percentile(v, F.lit(0.5)).alias("median_value"),
    )
    return (
        events.join(F.broadcast(med), on=key_col)
        .groupBy(key_col)
        .agg(
            F.first("n").alias("n"),
            F.first("median_value").alias("median_value"),
            F.percentile(F.abs(v - F.col("median_value")), F.lit(0.5)).alias(
                "mad_value"
            ),
        )
    )
