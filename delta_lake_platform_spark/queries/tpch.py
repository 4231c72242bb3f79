"""Relational analytic queries over the driver's TPC-H-ish star schema.

Coverage targets SURVEY.md §2: scans (S1), projections/filters (P1-P6),
joins inner/left_anti/semi/broadcast (J1-J2 + extensions), aggregations
(A1-A4), window ranking (W1), sorts/top-k (O1-O3), set ops (U1), and
the scalar layer (F1-F8). Each query is declarative DataFrame API so
Catalyst owns pushdown, pruning, join strategy, and AQE re-planning.

Scale notes (100 TB design point), applied throughout:
- dimension tables (region/nation/customer/supplier/part at TPC-H
  ratios) are broadcast — no shuffle of the fact table for those joins;
- aggregations are expressed as groupBy().agg() so partial (map-side)
  aggregation happens before the shuffle;
- top-k per group uses window rank + filter, which Spark >= 3.3 rewrites
  to WindowGroupLimit (partial top-k before the shuffle);
- all filters are plain column predicates -> parquet PushedFilters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Q1: pricing summary (flagship; scan→filter→agg→sort) -----------------

Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
  ROUND(AVG(l_discount), 6)                                        AS avg_disc,
  COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. Single scan, pushed filter, hash agg, tiny sort."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q3: shipping priority (3-way join, agg, top-k) ------------------------

Q3_ORACLE = """
SELECT
  l_orderkey,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer (filtered, broadcast) ⋈ orders ⋈ lineitem → agg → top-10.

    customer is ~1.5% of lineitem rows; after the segment filter it is
    broadcastable at any SF where the fact side dominates.
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --- Q5: local supplier volume (6-way join) --------------------------------

Q5_ORACLE = """
SELECT
  n_name,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("q5_local_supplier_volume", Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join; all dimensions broadcast, lineitem never shuffles
    until the final (tiny, per-nation) aggregation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# --- Q6: forecast revenue change (pure scan+filter+global agg) -------------

Q6_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four predicates reach the parquet scan (PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# --- top-k per group via window rank (W1 + P5) ------------------------------

TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
) t
WHERE rn <= 3
ORDER BY o_custkey, rn
"""


@register("topk_orders_per_customer", TOPK_ORACLE)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer — the reference's W1+P5
    latest-per-key idiom (scd_handler.py:73-74) generalized to top-k.
    Spark plans a WindowGroupLimit partial top-k before the shuffle."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


# --- latest event per user (the reference's dedupe-latest, A4) --------------

LATEST_ORACLE = """
SELECT user_id, event_id, event_type, ts
FROM (
  SELECT user_id, event_id, event_type, ts,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
) t
WHERE rn = 1
ORDER BY user_id
"""


@register("latest_event_per_user", LATEST_ORACLE)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max per key via window rank — reference scd_handler.py:73-74."""
    from ..operators.relational import latest_per_key

    ev = _t(spark, sf_dir, "events")
    return (
        latest_per_key(ev, keys=["user_id"], order=[F.desc("ts"), F.desc("event_id")])
        .select("user_id", "event_id", "event_type", "ts")
        .orderBy("user_id")
    )


# --- anti join: customers with no orders (J2) -------------------------------

ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
)
ORDER BY c_custkey
"""


@register("customers_without_big_orders", ANTI_ORACLE)
def customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti — the reference's brand-new-entity path (scd_handler.py:126).

    The filtered keyset keeps the result non-empty at every SF (every
    customer has *some* order in the synthetic data)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --- semi join: parts that ship (J1 extension) -------------------------------

SEMI_ORACLE = """
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_partkey IN (
  SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
)
ORDER BY p_partkey
"""


@register("parts_with_bulk_lineitems", SEMI_ORACLE)
def parts_with_bulk_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
    )


# --- grouping sets / rollup ---------------------------------------------------

ROLLUP_ORACLE = """
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  COUNT(*) AS n_items,
  ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


@register("rollup_lineitem_status", ROLLUP_ORACLE)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


# --- distinct / set ops -------------------------------------------------------

DISTINCT_ORACLE = """
SELECT DISTINCT o_orderstatus, o_orderpriority
FROM orders
ORDER BY o_orderstatus, o_orderpriority
"""


@register("distinct_order_status_priority", DISTINCT_ORACLE)
def distinct_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


UNION_ORACLE = """
SELECT nat_key, name FROM (
  SELECT n_nationkey AS nat_key, n_name AS name FROM nation
  UNION ALL
  SELECT r_regionkey AS nat_key, r_name AS name FROM region
) u
ORDER BY nat_key, name
"""


@register("union_nation_region_names", UNION_ORACLE)
def union_nation_region_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName (U1 — reference scd_handler.py:136-139)."""
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nat_key"), F.col("n_name").alias("name")
    )
    region = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("nat_key"), F.col("r_name").alias("name")
    )
    return nation.unionByName(region).orderBy("nat_key", "name")


# --- window analytics: lag/lead + running aggregates --------------------------

RUNNING_ORACLE = """
SELECT user_id, event_id, ts, value,
       ROUND(SUM(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 2) AS running_value,
       ROUND(COALESCE(value - LAG(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
       ), 0.0), 2) AS delta_prev
FROM events
WHERE user_id <= 10
ORDER BY user_id, ts, event_id
"""


@register("running_value_per_user", RUNNING_ORACLE)
def running_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(F.sum("value").over(wrun), 2).alias("running_value"),
        F.round(
            F.coalesce(F.col("value") - F.lag("value").over(w), F.lit(0.0)), 2
        ).alias("delta_prev"),
    ).orderBy("user_id", "ts", "event_id")


# --- correlated-style aggregate filter (HAVING) -------------------------------

HAVING_ORACLE = """
SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_spent
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 12
ORDER BY total_spent DESC, o_custkey
"""


@register("big_customers_by_order_count", HAVING_ORACLE)
def big_customers_by_order_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 12)
        .orderBy(F.desc("total_spent"), "o_custkey")
    )


# --- scalar/date functions + CASE ---------------------------------------------

CASE_ORACLE = """
SELECT
  o_orderkey,
  EXTRACT(year FROM o_orderdate) AS order_year,
  CASE
    WHEN o_totalprice >= 300000 THEN 'large'
    WHEN o_totalprice >= 100000 THEN 'medium'
    ELSE 'small'
  END AS price_band,
  UPPER(o_orderpriority) AS priority_uc,
  LENGTH(o_orderstatus) AS status_len
FROM orders
WHERE o_orderkey <= 1000
ORDER BY o_orderkey
"""


@register("order_price_bands", CASE_ORACLE)
def order_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("price_band"),
        F.upper("o_orderpriority").alias("priority_uc"),
        F.length("o_orderstatus").cast("long").alias("status_len"),
    ).orderBy("o_orderkey")
