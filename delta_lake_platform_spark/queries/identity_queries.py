"""Identity / surrogate-key assignment through the driver's
correctness gate.

The distributed dense-id assignment (functions/ids.py) is defined to
equal the global ``ROW_NUMBER() OVER (ORDER BY ...)`` when the
ordering key is unique — which makes it directly DuckDB-checkable,
including the SCD surrogate flow (reference ``account_key BIGINT
GENERATED ALWAYS AS IDENTITY (START WITH 10)``,
test_scd_handler.py:41): initial load draws 10..N ordered by PK, each
subsequent batch's inserts draw from the table's high-water mark in PK
order.
"""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ids import assign_dense_ids
from ..scd import ScdConfig, apply_scd
from ..scd.engine import create_scd_target
from ..sources.catalog import load_table
from ..sources.managed_table import ManagedTable
from .registry import register

DENSE_IDS_ORACLE = """
SELECT c_custkey,
       9 + ROW_NUMBER() OVER (ORDER BY c_custkey) AS sk
FROM customer
ORDER BY c_custkey
"""


@register("customer_dense_ids", DENSE_IDS_ORACLE)
def customer_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense ids over customer: range-partition + per-partition offsets
    (one small collect), never a single-partition global window."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    return assign_dense_ids(
        cust, ["c_custkey"], start=10, id_col="sk"
    ).orderBy("c_custkey")


SURROGATE_ORACLE = """
WITH day1 AS (
  SELECT c_custkey, c_name, c_mktsegment
  FROM customer WHERE c_custkey % 3 <> 0
),
k1 AS (
  SELECT c_custkey, c_mktsegment,
         9 + ROW_NUMBER() OVER (ORDER BY c_custkey) AS account_key
  FROM day1
),
hwm AS (SELECT MAX(account_key) AS m FROM k1),
k2 AS (
  SELECT c_custkey, 'MOVED' AS c_mktsegment,
         (SELECT m FROM hwm)
           + ROW_NUMBER() OVER (ORDER BY c_custkey) AS account_key
  FROM day1 WHERE c_custkey % 3 = 1
)
SELECT k1.c_custkey, k1.account_key, k1.c_mktsegment,
       CASE WHEN k1.c_custkey % 3 = 1 THEN 'I' ELSE 'A' END
         AS record_status
FROM k1
UNION ALL
SELECT c_custkey, account_key, c_mktsegment, 'A' AS record_status
FROM k2
ORDER BY c_custkey, account_key
"""


@register("scd_surrogate_keys", SURROGATE_ORACLE)
def scd_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-day SCD run with a GENERATED-ALWAYS surrogate key: day 1
    loads every custkey%3!=0 customer (keys 10..N by PK order); day 2
    moves the %3==1 segment (SCD2), so each closed row keeps its key
    and each new version draws from the footer-stats high-water mark."""
    d = tempfile.mkdtemp(prefix="dlp_sk_q_")
    cfg = dict(
        pk_cols=["c_custkey"],
        scd_cols=["c_mktsegment"],
        surrogate_col="account_key",
        surrogate_start=10,
    )
    day1 = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 != 0)
        .select("c_custkey", "c_name", "c_mktsegment")
    )
    day2 = day1.filter(F.col("c_custkey") % 3 == 1).withColumn(
        "c_mktsegment", F.lit("MOVED")
    )
    table = ManagedTable(spark, f"{d}/customer_dim")
    create_scd_target(
        table, day1, ScdConfig(clock=lambda: datetime(2026, 1, 1), **cfg)
    )
    apply_scd(day1, table, ScdConfig(clock=lambda: datetime(2026, 1, 1), **cfg))
    apply_scd(day2, table, ScdConfig(clock=lambda: datetime(2026, 1, 2), **cfg))
    out = (
        table.read()
        .select("c_custkey", "account_key", "c_mktsegment", "record_status")
        .orderBy("c_custkey", "account_key")
        .localCheckpoint()  # materialize before the temp dir is removed
    )
    shutil.rmtree(d, ignore_errors=True)
    return out
