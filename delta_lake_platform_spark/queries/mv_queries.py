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
