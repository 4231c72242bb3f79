"""Advanced relational shapes: correlated/scalar subqueries, EXISTS,
conditional aggregation, join-backs, distribution queries.

These extend the §2 operator surface with the query forms a warehouse
engine must support (TPC-H Q2/Q4/Q7/Q8/Q11/Q13/Q14/Q17/Q18/Q22
analogues adapted to the driver's star schema). Every query is
expressed so Catalyst can decorrelate/broadcast:

- correlated aggregates become join-backs against a pre-aggregated
  side (what Catalyst's decorrelation produces anyway, stated
  explicitly so the physical plan is predictable at 100 TB);
- scalar subqueries become broadcast crossJoins of 1-row aggregates;
- EXISTS becomes left_semi, NOT EXISTS left_anti.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Q4 analogue: EXISTS ----------------------------------------------------

Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_quantity >= 45
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q4_priority_with_bulk_items", Q4_ORACLE)
def q4_priority_with_bulk_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    bulk = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return (
        orders.join(bulk, orders.o_orderkey == bulk.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q7 analogue: nation-pair trade volume ---------------------------------

Q7_ORACLE = """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
  EXTRACT(year FROM l_shipdate)::BIGINT AS ship_year,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name IN ('NATION_0', 'NATION_1') AND sn.n_name IN ('NATION_0', 'NATION_1')
  AND cn.n_name != sn.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@register("q7_nation_pair_volume", Q7_ORACLE)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_0", "NATION_1"))
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_0", "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


# --- Q8 analogue: market share (conditional aggregation) --------------------

Q8_ORACLE = """
WITH rev AS (
  SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS order_year,
    sn.n_name AS supp_nation,
    l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
)
SELECT order_year,
  ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
        / SUM(volume), 6) AS mkt_share
FROM rev
GROUP BY order_year
ORDER BY order_year
"""


@register("q8_market_share", Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_3", volume).otherwise(0.0))
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
        .orderBy("order_year")
    )


# --- Q11 analogue: scalar subquery threshold --------------------------------

Q11_ORACLE = """
WITH sup_value AS (
  SELECT l_suppkey, SUM(l_extendedprice * l_quantity) AS value
  FROM lineitem GROUP BY l_suppkey
),
total AS (SELECT SUM(value) AS tv FROM sup_value)
SELECT l_suppkey, ROUND(value, 2) AS stock_value
FROM sup_value, total
WHERE value > 0.0012 * tv
ORDER BY stock_value DESC, l_suppkey
"""


@register("q11_important_suppliers", Q11_ORACLE)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery -> broadcast crossJoin of a 1-row aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    sup_value = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value")
    )
    total = sup_value.agg(F.sum("value").alias("tv"))
    return (
        sup_value.crossJoin(F.broadcast(total))
        .filter(F.col("value") > 0.0012 * F.col("tv"))
        .select("l_suppkey", F.round("value", 2).alias("stock_value"))
        .orderBy(F.desc("stock_value"), "l_suppkey")
    )


# --- Q13 analogue: customer order-count distribution ------------------------

Q13_ORACLE = """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_order_count_distribution", Q13_ORACLE)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    c_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- Q14 analogue: promo revenue share --------------------------------------

Q14_ORACLE = """
SELECT ROUND(
  100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
  / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
"""


@register("q14_promo_revenue", Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_revenue_pct")
    )


# --- Q17 analogue: correlated average (join-back decorrelation) -------------

Q17_ORACLE = """
WITH avg_qty AS (
  SELECT l_partkey AS ap, 0.5 * AVG(l_quantity) AS half_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_qty ON ap = l_partkey
WHERE p_brand = 'Brand#9' AND l_quantity < half_avg
"""


@register("q17_small_quantity_revenue", Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic correlated scalar subquery, decorrelated into an
    aggregate join-back (one extra shuffle on l_partkey, no per-row
    subquery execution)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#9")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --- Q18 analogue: large-volume orders --------------------------------------

Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey AS bk, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
SELECT c_name, o_orderkey, o_orderdate, ROUND(o_totalprice, 2) AS o_totalprice,
       ROUND(total_qty, 2) AS total_qty
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN big ON bk = o_orderkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("q18_large_volume_orders", Q18_ORACLE)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == F.col("bk"))
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# --- Q22 analogue: above-average idle customers -----------------------------

Q22_ORACLE = """
WITH avg_bal AS (
  SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@register("q22_idle_rich_customers", Q22_ORACLE)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (broadcast 1-row agg) + NOT EXISTS (left_anti)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --- SQL API surface: the same engine through spark.sql ---------------------

SQL_API_ORACLE = """
SELECT n_name, o_orderstatus, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_value
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, o_orderstatus
ORDER BY n_name, o_orderstatus
"""


@register("sql_api_orders_by_nation", SQL_API_ORACLE)
def sql_api_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same engine through the SQL entry point (registered temp views +
    spark.sql — reference entry point 3, SURVEY.md §3)."""
    from ..sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, o_orderstatus, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_value
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, o_orderstatus
        ORDER BY n_name, o_orderstatus
        """
    )
