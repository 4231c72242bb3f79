"""SCD engine exposed through the driver's correctness gate.

A deterministic two-batch SCD1+SCD2 pipeline over ``customer``:

- batch 1 (clock T1): full initial load;
- batch 2 (clock T2): same rows, with ``c_acctbal_cents`` bumped for
  custkey%10==0 (an SCD2 history change) and ``c_mktsegment`` rewritten
  for custkey%7==0 (an SCD1 in-place change).

The final table state is fully expressible in ANSI SQL (DuckDB oracle
below), hash keys included: every hashed column is integer or string,
so Spark's and DuckDB's cast-to-string bytes agree exactly, and both
sides compute sha256 over the same ``chr(31)``-joined fingerprint
(functions/hashing.py).

The acctbal is carried as integer cents precisely to keep float
formatting out of the hash preimage.
"""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..scd import ScdConfig, apply_scd
from ..scd.engine import create_scd_target
from ..sources.catalog import load_table
from ..sources.managed_table import ManagedTable
from .registry import register

T1 = datetime(2026, 1, 1, 0, 0, 0)
T2 = datetime(2026, 1, 2, 0, 0, 0)

_BUSINESS = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal_cents"]
_SYSTEM = [
    "record_status",
    "effective_from",
    "effective_to",
    "dw_inserted_at",
    "dw_updated_at",
    "scd_key",
    "upd_key",
]


def _batch1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("c_acctbal_cents"),
    )


def _batch2(spark: SparkSession, sf_dir: str) -> DataFrame:
    b1 = _batch1(spark, sf_dir)
    return b1.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("MODIFIED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        (
            F.col("c_acctbal_cents")
            + F.when(F.col("c_custkey") % 10 == 0, F.lit(10000)).otherwise(F.lit(0))
        ).alias("c_acctbal_cents"),
    )


def _cfg(clock_value: datetime) -> ScdConfig:
    return ScdConfig(
        pk_cols=["c_custkey"],
        scd_cols=["c_acctbal_cents"],
        select_cols=list(_BUSINESS),
        clock=lambda: clock_value,
    )


SCD_ORACLE = """
WITH b1 AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents
  FROM customer
),
b2 AS (
  SELECT c_custkey, c_name, c_nationkey,
         CASE WHEN c_custkey % 7 = 0 THEN 'MODIFIED' ELSE c_mktsegment END AS c_mktsegment,
         c_acctbal_cents + CASE WHEN c_custkey % 10 = 0 THEN 10000 ELSE 0 END AS c_acctbal_cents
  FROM b1
),
h1 AS (
  SELECT *,
    sha256(concat_ws(chr(31), CAST(c_acctbal_cents AS VARCHAR), CAST(c_custkey AS VARCHAR))) AS scd_key,
    sha256(concat_ws(chr(31), c_name, CAST(c_nationkey AS VARCHAR), c_mktsegment)) AS upd_key
  FROM b1
),
h2 AS (
  SELECT *,
    sha256(concat_ws(chr(31), CAST(c_acctbal_cents AS VARCHAR), CAST(c_custkey AS VARCHAR))) AS scd_key,
    sha256(concat_ws(chr(31), c_name, CAST(c_nationkey AS VARCHAR), c_mktsegment)) AS upd_key
  FROM h2_src
),
paired AS (
  SELECT h1.c_custkey,
         h1.c_name AS n1, h1.c_nationkey AS k1, h1.c_mktsegment AS m1,
         h1.c_acctbal_cents AS a1, h1.scd_key AS s1, h1.upd_key AS u1,
         h2.c_name AS n2, h2.c_nationkey AS k2, h2.c_mktsegment AS m2,
         h2.c_acctbal_cents AS a2, h2.scd_key AS s2, h2.upd_key AS u2
  FROM h1 JOIN h2 USING (c_custkey)
)
SELECT * FROM (
  -- closed-out superseded versions (SCD2)
  SELECT c_custkey, n1 AS c_name, k1 AS c_nationkey, m1 AS c_mktsegment,
         a1 AS c_acctbal_cents, 'I' AS record_status,
         TIMESTAMP '2026-01-01 00:00:00' AS effective_from,
         TIMESTAMP '2026-01-02 00:00:00' AS effective_to,
         TIMESTAMP '2026-01-01 00:00:00' AS dw_inserted_at,
         TIMESTAMP '2026-01-02 00:00:00' AS dw_updated_at,
         s1 AS scd_key, u1 AS upd_key
  FROM paired WHERE s1 != s2
  UNION ALL
  -- the new active versions (SCD2)
  SELECT c_custkey, n2, k2, m2, a2, 'A',
         TIMESTAMP '2026-01-02 00:00:00', NULL,
         TIMESTAMP '2026-01-02 00:00:00', TIMESTAMP '2026-01-02 00:00:00',
         s2, u2
  FROM paired WHERE s1 != s2
  UNION ALL
  -- SCD1 in-place updates: business cols refreshed, version kept
  SELECT c_custkey, n2, k2, m2, a2, 'A',
         TIMESTAMP '2026-01-01 00:00:00', NULL,
         TIMESTAMP '2026-01-01 00:00:00', TIMESTAMP '2026-01-02 00:00:00',
         s2, u2
  FROM paired WHERE s1 = s2 AND u1 != u2
  UNION ALL
  -- untouched rows
  SELECT c_custkey, n1, k1, m1, a1, 'A',
         TIMESTAMP '2026-01-01 00:00:00', NULL,
         TIMESTAMP '2026-01-01 00:00:00', TIMESTAMP '2026-01-01 00:00:00',
         s1, u1
  FROM paired WHERE s1 = s2 AND u1 = u2
) t
ORDER BY c_custkey, effective_from
""".replace("FROM h2_src", "FROM b2")


# The two-batch pipeline is deterministic in (sf_dir, mode); several
# driver queries (final state, CDF, time travel) interrogate the SAME
# built table. Build it once per process and share the committed
# artifact — exactly how a real deployment serves many readers from one
# table, instead of re-running ingestion per query. Temp dirs are
# reclaimed at process exit.
_PIPELINE_CACHE: dict[tuple[str, str], tuple[str, int, int]] = {}


def _built_pipeline(
    spark: SparkSession, sf_dir: str, mode: str
) -> tuple[ManagedTable, int, int]:
    import atexit
    import os

    key = (sf_dir, mode)
    cached = _PIPELINE_CACHE.get(key)
    if cached and os.path.isdir(cached[0]):
        return ManagedTable(spark, cached[0]), cached[1], cached[2]
    d = tempfile.mkdtemp(prefix=f"scd_pipeline_{mode}_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    table = ManagedTable(spark, f"{d}/customer_scd")
    b1 = _batch1(spark, sf_dir)
    create_scd_target(table, b1, _cfg(T1))
    v1 = apply_scd(b1, table, _cfg(T1), mode=mode)
    v2 = apply_scd(_batch2(spark, sf_dir), table, _cfg(T2), mode=mode)
    _PIPELINE_CACHE[key] = (table.path, v1, v2)
    return table, v1, v2


def _run_pipeline(spark: SparkSession, sf_dir: str, mode: str) -> DataFrame:
    table, _, _ = _built_pipeline(spark, sf_dir, mode)
    return (
        table.read()
        .select(*_BUSINESS, *_SYSTEM)
        .orderBy("c_custkey", "effective_from")
    )


@register("scd_hybrid_two_batches", SCD_ORACLE)
def scd_hybrid_two_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SCD1+SCD2 pipeline (default single-commit execution)."""
    return _run_pipeline(spark, sf_dir, "single_commit")


@register("scd_hybrid_two_batches_merge_mode", SCD_ORACLE)
def scd_hybrid_two_batches_merge_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pipeline through the reference-parity two-merge flow
    (ManagedTable.merge — reference delta_merge, scd_handler.py:7-55)."""
    return _run_pipeline(spark, sf_dir, "two_merge")


# CDF between the day-1 and day-2 commits. Classification with
# key_cols=(c_custkey, effective_from):
#   SCD2 entities: the old version flips A->I in place (update pair at
#     key (pk, T1)) and the new active version appears (insert at
#     (pk, T2));
#   SCD1 entities: business columns rewritten in place (update pair);
#   untouched entities: absent from the feed.
CDF_ORACLE = """
WITH b1 AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents
  FROM customer
),
b2 AS (
  SELECT c_custkey, c_name, c_nationkey,
         CASE WHEN c_custkey % 7 = 0 THEN 'MODIFIED' ELSE c_mktsegment END AS c_mktsegment,
         c_acctbal_cents + CASE WHEN c_custkey % 10 = 0 THEN 10000 ELSE 0 END AS c_acctbal_cents
  FROM b1
),
h1 AS (
  SELECT *,
    sha256(concat_ws(chr(31), CAST(c_acctbal_cents AS VARCHAR), CAST(c_custkey AS VARCHAR))) AS scd_key,
    sha256(concat_ws(chr(31), c_name, CAST(c_nationkey AS VARCHAR), c_mktsegment)) AS upd_key
  FROM b1
),
h2 AS (
  SELECT *,
    sha256(concat_ws(chr(31), CAST(c_acctbal_cents AS VARCHAR), CAST(c_custkey AS VARCHAR))) AS scd_key,
    sha256(concat_ws(chr(31), c_name, CAST(c_nationkey AS VARCHAR), c_mktsegment)) AS upd_key
  FROM b2
),
paired AS (
  SELECT h1.c_custkey,
         h1.c_name AS n1, h1.c_nationkey AS k1, h1.c_mktsegment AS m1,
         h1.c_acctbal_cents AS a1, h1.scd_key AS s1, h1.upd_key AS u1,
         h2.c_name AS n2, h2.c_nationkey AS k2, h2.c_mktsegment AS m2,
         h2.c_acctbal_cents AS a2, h2.scd_key AS s2, h2.upd_key AS u2
  FROM h1 JOIN h2 USING (c_custkey)
)
SELECT * FROM (
  -- SCD2: old active version, before the close-out
  SELECT c_custkey, n1 AS c_name, k1 AS c_nationkey, m1 AS c_mktsegment,
         a1 AS c_acctbal_cents, 'A' AS record_status,
         TIMESTAMP '2026-01-01 00:00:00' AS effective_from,
         CAST(NULL AS TIMESTAMP) AS effective_to,
         TIMESTAMP '2026-01-01 00:00:00' AS dw_inserted_at,
         TIMESTAMP '2026-01-01 00:00:00' AS dw_updated_at,
         s1 AS scd_key, u1 AS upd_key,
         'update_preimage' AS _change_type
  FROM paired WHERE s1 != s2
  UNION ALL
  -- SCD2: the same row after the close-out
  SELECT c_custkey, n1, k1, m1, a1, 'I',
         TIMESTAMP '2026-01-01 00:00:00', TIMESTAMP '2026-01-02 00:00:00',
         TIMESTAMP '2026-01-01 00:00:00', TIMESTAMP '2026-01-02 00:00:00',
         s1, u1, 'update_postimage'
  FROM paired WHERE s1 != s2
  UNION ALL
  -- SCD2: the new active version
  SELECT c_custkey, n2, k2, m2, a2, 'A',
         TIMESTAMP '2026-01-02 00:00:00', NULL,
         TIMESTAMP '2026-01-02 00:00:00', TIMESTAMP '2026-01-02 00:00:00',
         s2, u2, 'insert'
  FROM paired WHERE s1 != s2
  UNION ALL
  -- SCD1: before the in-place update
  SELECT c_custkey, n1, k1, m1, a1, 'A',
         TIMESTAMP '2026-01-01 00:00:00', NULL,
         TIMESTAMP '2026-01-01 00:00:00', TIMESTAMP '2026-01-01 00:00:00',
         s1, u1, 'update_preimage'
  FROM paired WHERE s1 = s2 AND u1 != u2
  UNION ALL
  -- SCD1: after
  SELECT c_custkey, n2, k2, m2, a2, 'A',
         TIMESTAMP '2026-01-01 00:00:00', NULL,
         TIMESTAMP '2026-01-01 00:00:00', TIMESTAMP '2026-01-02 00:00:00',
         s2, u2, 'update_postimage'
  FROM paired WHERE s1 = s2 AND u1 != u2
) t
ORDER BY c_custkey, _change_type, effective_from
"""


@register("scd_change_feed_day2", CDF_ORACLE)
def scd_change_feed_day2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change feed between the day-1 and day-2 SCD commits
    (ManagedTable.change_feed — the CDF analogue of Delta's
    table_changes, SURVEY.md §7 step 5). Every insert / update_preimage
    / update_postimage row is value-checked against the closed-form
    day-2 delta."""
    table, v1, v2 = _built_pipeline(spark, sf_dir, "single_commit")
    return (
        table.change_feed(v1, v2, key_cols=["c_custkey", "effective_from"])
        .select(*_BUSINESS, *_SYSTEM, "_change_type")
        .orderBy("c_custkey", "_change_type", "effective_from")
    )


# Day-1 state via time travel: after BOTH batches are applied, read the
# table AS OF the version the first apply committed. The oracle is the
# day-1 load alone — proving versioned reads return historical state
# (replaces the reference's CTAS snapshots, test_scd_handler.py:138-139).
TIME_TRAVEL_ORACLE = """
WITH b1 AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents
  FROM customer
)
SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal_cents,
  'A' AS record_status,
  TIMESTAMP '2026-01-01 00:00:00' AS effective_from,
  CAST(NULL AS TIMESTAMP) AS effective_to,
  TIMESTAMP '2026-01-01 00:00:00' AS dw_inserted_at,
  TIMESTAMP '2026-01-01 00:00:00' AS dw_updated_at,
  sha256(concat_ws(chr(31), CAST(c_acctbal_cents AS VARCHAR), CAST(c_custkey AS VARCHAR))) AS scd_key,
  sha256(concat_ws(chr(31), c_name, CAST(c_nationkey AS VARCHAR), c_mktsegment)) AS upd_key
FROM b1
ORDER BY c_custkey
"""


@register("scd_time_travel_day1", TIME_TRAVEL_ORACLE)
def scd_time_travel_day1(spark: SparkSession, sf_dir: str) -> DataFrame:
    table, v_day1, _ = _built_pipeline(spark, sf_dir, "single_commit")
    return (
        table.read(version=v_day1)
        .select(*_BUSINESS, *_SYSTEM)
        .orderBy("c_custkey")
    )
