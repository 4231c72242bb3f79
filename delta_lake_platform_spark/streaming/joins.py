"""Stream-stream joins with watermarked time bounds.

Both sides buffer state only within the watermark horizon; the join
condition must bound event-time distance or state grows without limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_after_signup(
    signups: DataFrame,
    purchases: DataFrame,
    within: str = "2 hours",
    watermark: str = "4 hours",
) -> DataFrame:
    """Purchases joined to the signup they followed within ``within``.

    Works on two streaming frames (state-bounded by the watermark) or
    two static frames (same plan, batch semantics) — used by the tests
    to assert stream==batch.
    """
    s = signups.select(
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("signup_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if signups.isStreaming:
        s = s.withWatermark("signup_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("s_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("signup_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("signup_ts") + F.expr(f"INTERVAL {within}")
        )
    )
    return s.join(p, cond, "inner").select(
        F.col("s_user").alias("user_id"),
        "signup_ts",
        "purchase_ts",
        "purchase_value",
    )
