"""The remaining TPC-H query shapes (Q2/Q9/Q10/Q12/Q15/Q16/Q19/Q20/Q21
analogues), adapted to the driver star schema — with these the full
22-query family is represented.

Adaptations forced by the schema (no partsupp table; lineitem has no
shipmode/commitdate/receiptdate):

- Q2's min-supplycost becomes min-s_acctbal over suppliers observed
  shipping the part (argmin-per-group with ties kept, as in the spec).
- Q9's supplycost-based profit becomes discounted revenue by supplier
  nation and ship year.
- Q12's shipmode lateness becomes bands of (l_shipdate - o_orderdate).
- Q16/Q20's availqty comes from aggregated shipped quantity.
- Q21's receipt-vs-commit lateness becomes ship-vs-order delay > 60d.

Physical-plan intent (100 TB): dimension sides (part, supplier,
nation, customer) are broadcast; the only big-table shuffles are the
groupBy keys themselves; argmin/argmax use window-over-small or
aggregate join-backs, never correlated per-row subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_TS = lambda s: F.lit(s).cast("timestamp")  # noqa: E731


# --- Q2 analogue: cheapest observed supplier per part (argmin w/ ties) ------

Q2_ORACLE = """
WITH shipped AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
  FROM shipped
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE p_type = 'STANDARD' AND p_size <= 5
)
SELECT p_partkey, p_name, s_suppkey, s_name, ROUND(s_acctbal, 2) AS s_acctbal
FROM cand
WHERE s_acctbal = (
  SELECT MIN(c2.s_acctbal) FROM cand c2 WHERE c2.p_partkey = cand.p_partkey
)
ORDER BY p_partkey, s_suppkey
"""


@register("q2_min_balance_supplier", Q2_ORACLE)
def q2_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated MIN subquery -> window min over the (small) candidate
    set; ties kept like spec Q2. The distinct (part,supp) pairs are the
    only big-table pass."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 5)
    )
    supp = _t(spark, sf_dir, "supplier")
    shipped = li.select("l_partkey", "l_suppkey").distinct()
    cand = (
        shipped.join(F.broadcast(part), shipped.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), shipped.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


# --- Q9 analogue: profit by supplier nation and ship year -------------------

Q9_ORACLE = """
SELECT n_name AS supp_nation,
  EXTRACT(year FROM l_shipdate)::BIGINT AS ship_year,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


@register("q9_nation_profit", Q9_ORACLE)
def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("profit")
        )
        .orderBy("supp_nation", F.desc("ship_year"))
    )


# --- Q10 analogue: top returned-item customers ------------------------------

Q10_ORACLE = """
WITH rev AS (
  SELECT c_custkey, c_name, c_nationkey,
    SUM(l_extendedprice * (1 - l_discount)) AS revenue
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
    AND l_returnflag = 'R'
  GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, c_nationkey, ROUND(revenue, 2) AS revenue
FROM rev
ORDER BY rev.revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order by the UNrounded revenue before LIMIT (cross-engine float
    parity recipe), round only in the projection."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1997-04-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev_raw"
            )
        )
        .orderBy(F.desc("rev_raw"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.round("rev_raw", 2).alias("revenue"),
        )
    )


# --- Q12 analogue: shipping-delay bands vs order priority -------------------

Q12_ORACLE = """
SELECT
  CASE WHEN date_diff('day', o_orderdate, l_shipdate) >= 90
       THEN 'LATE' ELSE 'ONTIME' END AS ship_band,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
ORDER BY 1
"""


@register("q12_late_lines_by_priority", Q12_ORACLE)
def q12_late_lines_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "ship_band",
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) >= 90,
                "LATE",
            ).otherwise("ONTIME"),
        )
        .groupBy("ship_band")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_band")
    )


# --- Q15 analogue: top supplier(s) by quarterly revenue ---------------------

Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec Q15's view + scalar MAX: the 1-row max aggregate is
    broadcast and compared on the UNrounded sum (identical within each
    engine, so the equality is exact on both sides)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1997-04-01 00:00:00"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_rev_raw"
        )
    )
    mx = rev.agg(F.max("total_rev_raw").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev_raw") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev_raw", 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --- Q16 analogue: supplier diversity per part attribute --------------------

Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q16_supplier_part_counts", Q16_ORACLE)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN -> left_anti against the excluded-supplier set (spec Q16's
    complaint exclusion, stood in by negative account balance)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --- Q19 analogue: disjunctive multi-attribute predicate --------------------

Q19_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 30
       AND l_quantity BETWEEN 20 AND 40)
"""


@register("q19_disjunctive_revenue", Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-conjunctions across both join sides — Catalyst still pushes
    the single-side residuals (p_brand/p_size disjunction to the part
    scan, l_quantity range union to the lineitem scan)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(11, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(21, 30)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(clause).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


# --- Q20 analogue: suppliers with heavy shipments of target parts -----------

Q20_ORACLE = """
WITH shipped AS (
  SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1, 2
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM shipped JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%' AND qty > 50
)
ORDER BY s_suppkey
"""


@register("q20_excess_shippers", Q20_ORACLE)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec Q20's nested IN-chain as a semi-join pipeline: aggregate ->
    broadcast-join part filter -> left_semi into supplier."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1998-01-01 00:00:00"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supp = _t(spark, sf_dir, "supplier")
    heavy = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("l_suppkey")
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --- Q21 analogue: the only-late supplier on multi-supplier orders ----------

Q21_ORACLE = """
WITH fo AS (
  SELECT l_orderkey, l_suppkey,
    date_diff('day', o_orderdate, l_shipdate) > 60 AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
    COUNT(DISTINCT l_suppkey) AS n_supp,
    COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
  FROM fo GROUP BY 1
),
late_pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM fo WHERE is_late
)
SELECT s_name, COUNT(*) AS numwait
FROM late_pairs
JOIN per_order ON late_pairs.l_orderkey = per_order.l_orderkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp > 1 AND n_late = 1
GROUP BY 1
ORDER BY numwait DESC, s_name
"""


@register("q21_waiting_suppliers", Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec Q21's EXISTS/NOT-EXISTS pair expressed as one per-order
    aggregation (supplier count + late-supplier count) joined back —
    a single shuffle on l_orderkey instead of two correlated probes."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    fo = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
            ).alias("is_late"),
        )
    )
    per_order = fo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late"),
    )
    late_pairs = (
        fo.filter(F.col("is_late")).select("l_orderkey", "l_suppkey").distinct()
    )
    return (
        late_pairs.join(per_order, on="l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
