"""Incremental materialized-view maintenance as an oracle-checked
query: base table mutates (DELETE + APPEND), the view refreshes from
the change feed only, and the final state must equal a from-scratch
recompute — which is exactly what the DuckDB oracle expresses."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from ..sources.managed_table import ManagedTable
from ..sources.materialized_view import MaterializedAggView
from .registry import register

MV_ORACLE = """
WITH b AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
),
after AS (
  SELECT o_orderkey, o_orderstatus, price_cents
  FROM b WHERE o_orderkey % 17 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderstatus, price_cents
  FROM b WHERE o_orderkey % 13 = 0 AND o_orderkey % 17 <> 0
)
SELECT o_orderstatus,
  COUNT(*)::BIGINT AS n_rows,
  SUM(price_cents)::BIGINT AS sum_price_cents
FROM after
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("mv_incremental_orders_by_status", MV_ORACLE)
def mv_incremental_orders_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Create an aggregate MV over orders, DELETE every 17th key from
    the base, APPEND key-shifted copies of every 13th surviving row,
    then refresh incrementally (sources/materialized_view.py — the
    refresh reads the change feed, never the full base)."""
    d = tempfile.mkdtemp(prefix="dlp_mv_q_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    base = ManagedTable(spark, f"{d}/orders_base")
    base.create(orders)
    mv = MaterializedAggView(
        base, f"{d}/orders_by_status_mv",
        group_cols=["o_orderstatus"], sum_cols=["price_cents"],
    )
    mv.create()
    # A delete scattered across every file is exactly what deletion
    # vectors are for: no data file rewritten, and the change feed's
    # manifest pruning then reads only the DV delta + the appended
    # batch instead of two full snapshots.
    base.delete("o_orderkey % 17 = 0", rewrite=False)
    base.append(
        base.read()
        .filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    )
    mv.refresh()
    out = (
        mv.state.read()
        .select("o_orderstatus", "n_rows", "sum_price_cents")
        .orderBy("o_orderstatus")
        .localCheckpoint()  # materialize before the temp dir is removed
    )
    shutil.rmtree(d, ignore_errors=True)
    return out


MV_JOIN_ORACLE = """
WITH o AS (
  SELECT o_custkey AS custkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
         o_orderkey
  FROM orders
),
o_after AS (
  SELECT custkey, price_cents FROM o WHERE o_orderkey % 17 <> 0
  UNION ALL
  SELECT custkey, price_cents + 1 FROM o
  WHERE o_orderkey % 13 = 0 AND o_orderkey % 17 <> 0
),
c_after AS (
  SELECT c_custkey AS custkey,
         CASE WHEN c_custkey % 10 = 0 THEN 'MOVED' ELSE c_mktsegment END
           AS segment
  FROM customer
)
SELECT segment,
       COUNT(*)::BIGINT AS n_rows,
       SUM(price_cents)::BIGINT AS sum_price_cents
FROM o_after JOIN c_after USING (custkey)
GROUP BY segment
ORDER BY segment
"""


@register("mv_join_orders_customers", MV_JOIN_ORACLE)
def mv_join_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained JOIN view (sources/materialized_view.py
    ::MaterializedJoinAggView): revenue per customer segment over
    orders ⋈ customer. Both bases mutate after the view is created —
    orders: DV-delete every 17th key + append perturbed copies of every
    13th; customer: UPDATE moves every 10th customer's segment — and the
    refresh folds ONLY the two delta joins (dO ⋈ C_old, O_new ⋈ dC)
    into the state, never re-joining the full bases. Final state must
    equal the from-scratch recompute the oracle expresses."""
    from ..sources.materialized_view import MaterializedJoinAggView

    d = tempfile.mkdtemp(prefix="dlp_mvj_q_")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        "o_orderkey",
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    o_t = ManagedTable(spark, f"{d}/orders")
    o_t.create(orders)
    c_t = ManagedTable(spark, f"{d}/cust")
    c_t.create(cust)
    mv = MaterializedJoinAggView(
        o_t, c_t, f"{d}/mv",
        on=["custkey"], group_cols=["segment"], sum_cols=["price_cents"],
    )
    mv.create()
    o_t.delete("o_orderkey % 17 = 0", rewrite=False)
    o_t.append(
        o_t.read()
        .filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("price_cents", F.col("price_cents") + 1)
    )
    c_t.update({"segment": "'MOVED'"}, "custkey % 10 = 0")
    mv.refresh()
    out = (
        mv.state.read()
        .select("segment", "n_rows", "sum_price_cents")
        .orderBy("segment")
        .localCheckpoint()
    )
    shutil.rmtree(d, ignore_errors=True)
    return out


MV_MINMAX_ORACLE = """
WITH b AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
),
after AS (
  SELECT o_orderkey, o_orderstatus, price_cents
  FROM b WHERE o_orderkey % 17 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderstatus, price_cents + 1
  FROM b WHERE o_orderkey % 13 = 0 AND o_orderkey % 17 <> 0
)
SELECT o_orderstatus,
  COUNT(*)::BIGINT AS n_rows,
  CAST(MIN(price_cents) AS BIGINT) AS min_price_cents,
  CAST(MAX(price_cents) AS BIGINT) AS max_price_cents
FROM after
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("mv_minmax_orders_by_status", MV_MINMAX_ORACLE)
def mv_minmax_orders_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max MV maintained incrementally under delete + append churn
    (sources/materialized_view.py dirty-group rule): the scattered
    DELETE removes some groups' extrema — exactly those groups are
    recomputed from the base through a broadcast semi-join; the append
    folds in monotonically. The oracle is the from-scratch recompute."""
    d = tempfile.mkdtemp(prefix="dlp_mvmm_q_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    base = ManagedTable(spark, f"{d}/orders_base")
    base.create(orders)
    mv = MaterializedAggView(
        base, f"{d}/mv",
        group_cols=["o_orderstatus"], sum_cols=[],
        minmax_cols=["price_cents"],
    )
    mv.create()
    base.delete("o_orderkey % 17 = 0", rewrite=False)
    base.append(
        base.read()
        .filter(F.col("o_orderkey") % 13 == 0)
        .select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_orderstatus",
            (F.col("price_cents") + 1).alias("price_cents"),
        )
    )
    mv.refresh()
    out = (
        mv.state.read()
        .select(
            "o_orderstatus", "n_rows", "min_price_cents", "max_price_cents"
        )
        .orderBy("o_orderstatus")
        .localCheckpoint()
    )
    shutil.rmtree(d, ignore_errors=True)
    return out


MV_NULLKEY_ORACLE = """
WITH b AS (
  SELECT o_orderkey,
         NULLIF(o_orderpriority, '1-URGENT') AS priority_group,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
),
after AS (
  SELECT o_orderkey, priority_group, price_cents
  FROM b WHERE o_orderkey % 17 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, priority_group, price_cents + 1
  FROM b WHERE o_orderkey % 13 = 0 AND o_orderkey % 17 <> 0
)
SELECT priority_group,
  COUNT(*)::BIGINT AS n_rows,
  CAST(MIN(price_cents) AS BIGINT) AS min_price_cents,
  CAST(MAX(price_cents) AS BIGINT) AS max_price_cents
FROM after
GROUP BY priority_group
ORDER BY priority_group
"""


@register("mv_nullkey_orders_by_priority", MV_NULLKEY_ORACLE)
def mv_nullkey_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max MV whose GROUPING COLUMN CONTAINS NULL (every urgent
    order maps to a NULL priority group — the real-dimension-data shape
    the r4 verdict flagged): the refresh's state⟗delta merge and the
    dirty-group recompute join must reunite the NULL group null-safely
    (sources/materialized_view.py::_ns_cond) or it splits into
    duplicate state rows / gets NULL extrema. Delete + append churn
    hits extrema in the NULL group too; the oracle is the from-scratch
    recompute."""
    d = tempfile.mkdtemp(prefix="dlp_mvnull_q_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias(
            "priority_group"
        ),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    base = ManagedTable(spark, f"{d}/orders_base")
    base.create(orders)
    mv = MaterializedAggView(
        base, f"{d}/mv",
        group_cols=["priority_group"], sum_cols=[],
        minmax_cols=["price_cents"],
    )
    mv.create()
    base.delete("o_orderkey % 17 = 0", rewrite=False)
    base.append(
        base.read()
        .filter(F.col("o_orderkey") % 13 == 0)
        .select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "priority_group",
            (F.col("price_cents") + 1).alias("price_cents"),
        )
    )
    mv.refresh()
    out = (
        mv.state.read()
        .select(
            "priority_group", "n_rows", "min_price_cents", "max_price_cents"
        )
        .orderBy("priority_group")
        .localCheckpoint()
    )
    shutil.rmtree(d, ignore_errors=True)
    return out


MV_STREAM_ORACLE = """
WITH b AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
),
after AS (
  SELECT o_orderkey, o_orderstatus,
         price_cents + CASE WHEN o_orderkey % 11 = 0 THEN 5 ELSE 0 END
           AS price_cents
  FROM b WHERE o_orderkey % 17 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderstatus, price_cents
  FROM b WHERE o_orderkey % 13 = 0
)
SELECT o_orderstatus,
  COUNT(*)::BIGINT AS n_rows,
  SUM(price_cents)::BIGINT AS sum_price_cents
FROM after
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("mv_stream_maintained_orders", MV_STREAM_ORACLE)
def mv_stream_maintained_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MV maintained by a PER-COMMIT change-feed stream (r7,
    streaming/cdf.py::mv_maintain_stream): the base mutates across
    three DML commits (UPDATE, MOR DELETE, APPEND) while a
    ChangeFeedStream(per_commit=True) folds each commit window into
    the view exactly once — interleaved mid-history and catching up
    over a backlog. The oracle is the from-scratch recompute, so any
    double-fold, missed window, or wrong per-commit sign
    hash-mismatches."""
    from ..streaming.cdf import mv_maintain_stream

    d = tempfile.mkdtemp(prefix="dlp_mv_stream_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    base = ManagedTable(spark, f"{d}/orders_base")
    base.create(orders)
    base.set_property("enableChangeDataFeed", "true")
    mv = MaterializedAggView(
        base, f"{d}/orders_by_status_mv",
        group_cols=["o_orderstatus"], sum_cols=["price_cents"],
    )
    mv.create()
    ckpt = f"{d}/ckpt"
    base.update({"price_cents": "price_cents + 5"}, "o_orderkey % 11 = 0")
    mv_maintain_stream(mv, ckpt)          # current through the update
    base.delete("o_orderkey % 17 = 0", rewrite=False)
    base.append(
        orders.filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    )
    mv_maintain_stream(mv, ckpt)          # two-commit backlog, one each
    out = (
        mv.state.read()
        .select("o_orderstatus", "n_rows", "sum_price_cents")
        .orderBy("o_orderstatus")
        .localCheckpoint()
    )
    shutil.rmtree(d, ignore_errors=True)
    return out


MV_HLL_ORACLE = """
WITH b AS (
  SELECT o_orderkey, o_orderstatus, o_custkey FROM orders
),
after AS (
  SELECT o_orderkey, o_orderstatus,
         o_custkey + CASE WHEN o_orderkey % 11 = 0 THEN 3000 ELSE 0 END
           AS o_custkey
  FROM b WHERE o_orderkey % 17 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderstatus, o_custkey + 100000
  FROM b WHERE o_orderkey % 13 = 0
)
SELECT o_orderstatus,
  COUNT(*)::BIGINT AS n_rows,
  COUNT(DISTINCT o_custkey)::BIGINT AS approx_distinct_custkey
FROM after
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("mv_approx_distinct_orders", MV_HLL_ORACLE)
def mv_approx_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained APPROX COUNT DISTINCT (r9,
    materialized_view.py approx_distinct_cols): per-status distinct
    customer counts kept as stored HLL sketches. The base mutates
    through a key-shifting UPDATE (old values must leave the count, a
    sketch cannot subtract -> dirty-group recompute), a MOR DELETE,
    and an APPEND of new customers (folds monotonically through
    sketch union). lg_k=20 keeps DataSketches in its exact regime at
    these cardinalities, so the estimate is hash-oracled against the
    EXACT COUNT(DISTINCT) of the final state — any missed dirty
    group, bad union, or stale sketch mismatches."""
    d = tempfile.mkdtemp(prefix="dlp_mv_hll_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_custkey"
    )
    base = ManagedTable(spark, f"{d}/orders_base")
    base.create(orders)
    mv = MaterializedAggView(
        base, f"{d}/orders_distinct_mv",
        group_cols=["o_orderstatus"], sum_cols=[],
        approx_distinct_cols=["o_custkey"], hll_lg_k=20,
    )
    mv.create()
    base.update({"o_custkey": "o_custkey + 3000"}, "o_orderkey % 11 = 0")
    base.delete("o_orderkey % 17 = 0", rewrite=False)
    base.append(
        orders.filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
        .withColumn("o_custkey", F.col("o_custkey") + 100_000)
    )
    mv.refresh()
    out = (
        mv.read()
        .select(
            "o_orderstatus",
            "n_rows",
            F.col("approx_distinct_o_custkey").alias(
                "approx_distinct_custkey"
            ),
        )
        .orderBy("o_orderstatus")
        .localCheckpoint()
    )
    shutil.rmtree(d, ignore_errors=True)
    return out


# --- transparent MV query rewrite (r9) ---------------------------------------

MV_REWRITE_ORACLE = """
WITH base AS (
  SELECT o_orderstatus, o_orderpriority, o_totalprice FROM orders
  WHERE o_orderkey % 17 != 0
)
SELECT o_orderstatus,
  COUNT(*)::BIGINT AS n,
  ROUND(SUM(o_totalprice), 2) AS total,
  MIN(o_totalprice) AS lo,
  MAX(o_totalprice) AS hi
FROM base
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("mv_rewrite_orders", MV_REWRITE_ORACLE)
def mv_rewrite_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transparent materialized-view query rewrite end to end (r9,
    sql.py::_try_mv_rewrite): a coarser-grain aggregate SELECT over
    the BASE table — with a WHERE on a group column — is answered
    from the maintained (status, priority) view. The base mutates (MOR
    DELETE) and the view refreshes first, so the rewrite folds real
    maintenance state; the base's read path is replaced with a raiser
    while the SELECT runs, so any fallthrough to a scan errors the
    query instead of silently passing. Oracle: the plain aggregate
    over the surviving rows."""
    from ..sql import PlatformSQL

    d = tempfile.mkdtemp(prefix="dlp_mv_rw_")
    p = PlatformSQL(spark)
    base = ManagedTable(spark, f"{d}/orders_base")
    base.create(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        )
    )
    p.register("orders_rw", base)
    p.sql(
        f"CREATE MATERIALIZED VIEW orders_rw_mv LOCATION "
        f"'{d}/orders_rw_mv' AS SELECT o_orderstatus, o_orderpriority, "
        "COUNT(*) AS n_rows, SUM(o_totalprice) AS sum_o_totalprice, "
        "MIN(o_totalprice) AS min_o_totalprice, "
        "MAX(o_totalprice) AS max_o_totalprice "
        "FROM orders_rw GROUP BY o_orderstatus, o_orderpriority"
    )
    base.delete("o_orderkey % 17 = 0", rewrite=False)
    p.sql("REFRESH MATERIALIZED VIEW orders_rw_mv")

    def _raise_on_scan(self, *a, **kw):
        raise AssertionError("rewrite fell through to a base scan")

    base.read = _raise_on_scan.__get__(base)
    try:
        out = p.sql(
            "SELECT o_orderstatus, COUNT(*) AS n, "
            "SUM(o_totalprice) AS total, MIN(o_totalprice) AS lo, "
            "MAX(o_totalprice) AS hi FROM orders_rw "
            "WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderstatus"
        )
        out = (
            out.withColumn("total", F.round("total", 2))
            .orderBy("o_orderstatus")
            .localCheckpoint()
        )
        assert p.last_select_rewrite == "orders_rw_mv"
    finally:
        del base.read
    shutil.rmtree(d, ignore_errors=True)
    return out
