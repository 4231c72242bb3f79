"""Window-function depth: RANGE frames over event time, the analytic
function suite (first/last/nth/ntile/dense_rank/percent_rank/cume_dist),
and array explosion with positional indexes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

RANGE_FRAME_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderdate,
  ROUND(SUM(o_totalprice) OVER (
    PARTITION BY o_custkey
    ORDER BY epoch(o_orderdate)
    RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW
  ), 2) AS spend_90d
FROM orders
WHERE o_custkey <= 50
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


@register("orders_rolling_90d_spend", RANGE_FRAME_ORACLE)
def orders_rolling_90d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time (90-day rolling spend per customer):
    the frame is value-based (seconds), not row-based — late/sparse
    orders are handled correctly."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7776000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_90d"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


ANALYTIC_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
  FIRST_VALUE(o_orderdate) OVER w AS first_order,
  LAST_VALUE(o_orderdate) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS last_order,
  NTILE(4) OVER w AS quartile,
  DENSE_RANK() OVER w AS drank,
  ROUND(PERCENT_RANK() OVER w, 6) AS prank,
  ROUND(CUME_DIST() OVER w, 6) AS cdist
FROM orders
WHERE o_custkey <= 20
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


@register("orders_analytic_suite", ANALYTIC_ORACLE)
def orders_analytic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.first("o_orderdate").over(w).alias("first_order"),
        F.last("o_orderdate").over(w_full).alias("last_order"),
        F.ntile(4).over(w).alias("quartile"),
        F.dense_rank().over(w).alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


EXPLODE_ORACLE = """
SELECT dim,
  ROUND(AVG(val), 6) AS avg_val,
  ROUND(MIN(val), 6) AS min_val,
  ROUND(MAX(val), 6) AS max_val
FROM (
  SELECT UNNEST(embedding::DOUBLE[]) AS val,
         generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings
) t
WHERE dim < 8
GROUP BY dim
ORDER BY dim
"""


@register("embedding_dim_stats", EXPLODE_ORACLE)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the embedding array -> per-dimension distribution
    stats (the feature-drift monitor shape)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim", "val"
            )
        )
        .filter(F.col("dim") < 8)
        .groupBy("dim")
        .agg(
            F.round(F.avg("val"), 6).alias("avg_val"),
            F.round(F.min("val"), 6).alias("min_val"),
            F.round(F.max("val"), 6).alias("max_val"),
        )
        .orderBy("dim")
    )
