"""Relational surface the registry lacked: full-outer joins, bag
(multiset) set-ops, calendar gap-fill with LOCF imputation, and linear
regression / correlation aggregates.

The reference's join inventory stops at inner/left_anti (SURVEY.md
§2.3: scd_handler.py:111-134) and its set-op inventory at unionByName
(§2.7: scd_handler.py:136-139); a warehouse needs the rest of the
lattice. Each query has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import load_table
from .registry import register

FULL_OUTER_ORACLE = """
WITH c AS (
  SELECT CAST(floor(c_acctbal / 1000) AS BIGINT) AS balance_band,
         COUNT(*) AS n_customers
  FROM customer GROUP BY 1
), s AS (
  SELECT CAST(floor(s_acctbal / 1000) AS BIGINT) AS balance_band,
         COUNT(*) AS n_suppliers
  FROM supplier GROUP BY 1
)
SELECT COALESCE(c.balance_band, s.balance_band) AS balance_band,
       COALESCE(c.n_customers, 0) AS n_customers,
       COALESCE(s.n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s ON c.balance_band = s.balance_band
ORDER BY balance_band
"""


@register("full_outer_balance_bands", FULL_OUTER_ORACLE)
def full_outer_balance_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregates: customer vs supplier counts
    per 1000-unit account-balance band. The supplier side is ~10x
    sparser, so bands exist on each side alone — both null-padding
    directions are exercised. Both inputs are pre-aggregated (tiny), so
    the outer join itself is a few dozen rows regardless of base-table
    scale; at 100 TB the cost is the two partial-agg scans, not the
    join."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("balance_band")
        )
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(
            F.floor(F.col("s_acctbal") / 1000).cast("long").alias("balance_band")
        )
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        cust.join(supp, on="balance_band", how="full_outer")
        .select(
            "balance_band",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("balance_band")
    )


BAG_OPS_ORACLE = """
WITH urgent AS (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
), high AS (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
), ex AS (
  SELECT 'except_all' AS op, COUNT(*) AS n_rows,
         COUNT(DISTINCT o_custkey) AS n_custkeys
  FROM (SELECT o_custkey FROM urgent EXCEPT ALL SELECT o_custkey FROM high)
), ia AS (
  SELECT 'intersect_all' AS op, COUNT(*) AS n_rows,
         COUNT(DISTINCT o_custkey) AS n_custkeys
  FROM (SELECT o_custkey FROM urgent INTERSECT ALL SELECT o_custkey FROM high)
)
SELECT * FROM ex UNION ALL SELECT * FROM ia ORDER BY op
"""


@register("bag_ops_urgent_vs_high", BAG_OPS_ORACLE)
def bag_ops_urgent_vs_high(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL / INTERSECT ALL (bag semantics — duplicates
    preserved by multiplicity arithmetic, unlike the distinct-set
    except/intersect queries): urgent-order customer keys vs high-order
    customer keys. Spark plans both as a single hash aggregate over
    per-side counts — one shuffle each, no join explosion."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")

    def summarize(df: DataFrame, op: str) -> DataFrame:
        return df.agg(
            F.lit(op).alias("op"),
            F.count("*").alias("n_rows"),
            F.countDistinct("o_custkey").alias("n_custkeys"),
        ).select("op", "n_rows", "n_custkeys")

    return (
        summarize(urgent.exceptAll(high), "except_all")
        .unionByName(summarize(urgent.intersectAll(high), "intersect_all"))
        .orderBy("op")
    )


GAPFILL_ORACLE = """
WITH spine AS (
  SELECT CAST(d AS DATE) AS day
  FROM generate_series(DATE '1995-02-01', DATE '1995-03-31', INTERVAL 1 DAY) AS t(d)
), daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         COUNT(*) AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-02-01'
    AND o_orderdate < TIMESTAMP '1995-04-01'
  GROUP BY 1
)
SELECT spine.day,
       COALESCE(daily.n_orders, 0) AS n_orders,
       COALESCE(daily.revenue,
                last_value(daily.revenue IGNORE NULLS) OVER (
                  ORDER BY spine.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                0.0) AS revenue_locf
FROM spine LEFT JOIN daily ON spine.day = daily.day
ORDER BY spine.day
"""


@register("orders_daily_gapfill", GAPFILL_ORACLE)
def orders_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: a generated date spine (sequence + explode —
    no driver-side loop) left-joined to daily order aggregates, with
    missing days zero-filled for counts and last-observation-carried-
    forward for revenue. The spine is 59 rows → broadcast; the orders
    scan carries a pushed-down date-range filter, so at 100 TB this
    reads only the two months' partitions. The LOCF window is a single
    global ordered window over 59 rows — trivially driver-sized."""
    orders = load_table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-02-01").cast("date"),
                F.lit("1995-03-31").cast("date"),
            )
        ).alias("day")
    )
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-02-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, on="day", how="left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce(
                F.col("revenue"),
                F.last("revenue", ignorenulls=True).over(w),
                F.lit(0.0),
            ).alias("revenue_locf"),
        )
        .orderBy("day")
    )


REGR_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       ROUND(regr_slope(value, (epoch(ts) - epoch(TIMESTAMP '2024-01-01')) / 3600.0), 6) AS slope_per_hour,
       ROUND(regr_intercept(value, (epoch(ts) - epoch(TIMESTAMP '2024-01-01')) / 3600.0), 4) AS intercept,
       ROUND(corr(value, (epoch(ts) - epoch(TIMESTAMP '2024-01-01')) / 3600.0), 6) AS time_corr
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("events_value_regression", REGR_ORACLE)
def events_value_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (regr_slope / regr_intercept /
    corr): per event type, the OLS trend of `value` against event time
    in hours. All three are single-pass distributive aggregates (sum of
    x, y, xy, x², y²) — one partial-agg shuffle, JVM codegen end to
    end; the idiomatic way to get a per-key trend without ML libs.
    x is centered on a fixed reference instant: raw epoch-hours (~470k)
    make the intercept ill-conditioned (catastrophic cancellation →
    engine-dependent 4th-decimal drift); hours-since-reference keeps
    both sides bit-stable."""
    ev = load_table(spark, sf_dir, "events")
    x = (
        F.unix_timestamp("ts")
        - F.unix_timestamp(F.lit("2024-01-01").cast("timestamp"))
    ) / 3600.0
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.regr_slope(F.col("value"), x), 6).alias("slope_per_hour"),
            F.round(F.regr_intercept(F.col("value"), x), 4).alias("intercept"),
            F.round(F.corr(F.col("value"), x), 6).alias("time_corr"),
        )
        .orderBy("event_type")
    )
