"""The PlatformSQL dialect exercised end to end through the driver
gate: UPDATE → DELETE → MERGE (update + insert branches) issued as SQL
strings against a managed table, final state checked against a pure-SQL
DuckDB oracle.

This is reference entry point #3 made real (SURVEY.md §3: the
reference's users drive everything through ``spark.sql`` strings) —
the platform statements Spark's parser lacks for parquet tables are
routed by delta_lake_platform_spark.sql.PlatformSQL to the very same
ManagedTable code the Python API uses.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from ..sources.managed_table import ManagedTable
from ..sql import PlatformSQL
from .registry import register

SQL_DML_ORACLE = """
WITH base AS (
  SELECT c_custkey, c_name, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
u AS (
  SELECT c_custkey, c_name, c_mktsegment,
         cents + CASE WHEN c_custkey % 5 = 0 THEN 500 ELSE 0 END AS cents
  FROM base
),
d AS (SELECT * FROM u WHERE cents >= 0),
src AS (
  SELECT c_custkey, c_name, c_mktsegment, cents * 2 AS cents
  FROM base WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey + 1000000, c_name, 'NEWSEG', 12345
  FROM base WHERE c_custkey % 97 = 0
),
merged AS (
  SELECT d.c_custkey, d.c_name, d.c_mktsegment, COALESCE(s.cents, d.cents) AS cents
  FROM d LEFT JOIN src s ON d.c_custkey = s.c_custkey
  UNION ALL
  SELECT s.c_custkey, s.c_name, s.c_mktsegment, s.cents
  FROM src s LEFT JOIN d ON d.c_custkey = s.c_custkey
  WHERE d.c_custkey IS NULL
)
SELECT c_mktsegment, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total_cents
FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

_SQL_DML_CACHE: dict[str, str] = {}


def _source_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    return base.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey", "c_name", "c_mktsegment", (F.col("cents") * 2).alias("cents")
    ).unionByName(
        base.filter(F.col("c_custkey") % 97 == 0).select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            "c_name",
            F.lit("NEWSEG").alias("c_mktsegment"),
            F.lit(12345).cast("long").alias("cents"),
        )
    )


@register("sql_dml_pipeline", SQL_DML_ORACLE)
def sql_dml_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE, DELETE, and a three-branch MERGE issued as SQL text. The
    MERGE's physical shape is the engine's: one left-outer join for the
    matched rewrite + one left-anti for inserts, source side broadcast
    when small — SQL parsing adds zero execution cost at any scale."""
    path = _SQL_DML_CACHE.get(sf_dir)
    p = PlatformSQL(spark)
    if path is None or not os.path.isdir(path):
        d = tempfile.mkdtemp(prefix="sql_dml_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        t = ManagedTable(spark, f"{d}/ct")
        t.create(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey",
                "c_name",
                "c_mktsegment",
                F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
            )
        )
        p.register("ct", t)
        p.sql("UPDATE ct SET cents = cents + 500 WHERE c_custkey % 5 = 0")
        p.sql("DELETE FROM ct WHERE cents < 0")
        _source_batch(spark, sf_dir).createOrReplaceTempView("ct_changes")
        p.sql(
            """
            MERGE INTO ct t USING ct_changes s
            ON t.c_custkey = s.c_custkey
            WHEN MATCHED THEN UPDATE SET cents = s.cents
            WHEN NOT MATCHED THEN INSERT (c_custkey, c_name, c_mktsegment, cents)
                 VALUES (s.c_custkey, s.c_name, s.c_mktsegment, s.cents)
            """
        )
        _SQL_DML_CACHE[sf_dir] = t.path
        path = t.path
    else:
        p.register("ct", ManagedTable(spark, path))
    return p.sql(
        "SELECT c_mktsegment, COUNT(*) AS n, SUM(cents) AS total_cents "
        "FROM ct GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )


OPTIMIZE_WHERE_ORACLE = """
SELECT c_custkey, c_mktsegment,
       CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
FROM customer
WHERE c_custkey % 11 <> 0
ORDER BY c_custkey
"""


@register("sql_optimize_where_roundtrip", OPTIMIZE_WHERE_ORACLE)
def sql_optimize_where_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance DML through the SQL dialect: DV-DELETE a scattered
    slice, then ``OPTIMIZE <t> WHERE`` compacts only the files holding
    low keys (file-level manifest keeps the rest). Rows must round-trip
    exactly — the predicate-scoped rewrite materializes DV debt without
    changing the table's contents."""
    d = tempfile.mkdtemp(prefix="dlp_ow_q_")
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        )
        .repartitionByRange(8, "c_custkey")
    )
    t = ManagedTable(spark, f"{d}/cust")
    t.create(cust)
    # DV mode: the scattered delete becomes a merge-on-read sidecar
    # (no file rewritten), which the scoped OPTIMIZE then materializes
    # for the half of the files it touches.
    t.set_property("enableDeletionVectors", "true")
    psql = PlatformSQL(spark)
    psql.register("cust", t)
    psql.sql("DELETE FROM cust WHERE c_custkey % 11 = 0")
    half = cust.agg(F.expr("percentile(c_custkey, 0.5)")).first()[0]
    psql.sql(f"OPTIMIZE cust WHERE c_custkey <= {int(half)}")
    out = (
        t.read()
        .select("c_custkey", "c_mktsegment", "cents")
        .orderBy("c_custkey")
        .localCheckpoint()
    )
    shutil.rmtree(d, ignore_errors=True)
    return out


SCHEMA_EVOLUTION_ORACLE = """
WITH base AS (
  SELECT s_suppkey, CAST(ROUND(s_acctbal * 100) AS INT) AS cents
  FROM supplier
),
ins AS (
  SELECT s_suppkey + 1000000 AS s_suppkey,
         CAST(cents AS BIGINT) + 1000000000000 AS cents,
         'XL' AS tier
  FROM base WHERE s_suppkey % 7 = 0
),
cur AS (
  SELECT s_suppkey, CAST(cents AS BIGINT) AS cents,
         CASE WHEN s_suppkey % 2 = 0 THEN 'STD' END AS tier
  FROM base
  UNION ALL
  SELECT * FROM ins
),
survivors AS (
  SELECT * FROM cur
  WHERE NOT (s_suppkey % 97 = 0 AND tier IS NULL)
)
SELECT COALESCE(tier, 'NONE') AS tier,
       COUNT(*) AS n,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM survivors GROUP BY 1 ORDER BY 1
"""


@register("sql_schema_evolution", SCHEMA_EVOLUTION_ORACLE)
def sql_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only schema evolution driven as SQL: widen an INT
    column to BIGINT (old INT32 files upcast at scan — no rewrite),
    ADD COLUMN (old files fill NULLs), INSERT values that need the
    widened range, UPDATE through the evolved schema, then RENAME the
    widened column (metadata-only via column mapping — data files keep
    the physical name) and DELETE through the NEW logical name. Every
    ALTER commits only schema metadata; correctness of the final state
    — read through the mapping — is what the oracle checks."""
    d = tempfile.mkdtemp(prefix="dlp_evo_q_")
    t = ManagedTable(spark, f"{d}/st")
    t.create(
        load_table(spark, sf_dir, "supplier").select(
            "s_suppkey",
            F.round(F.col("s_acctbal") * 100).cast("int").alias("cents"),
        )
    )
    p = PlatformSQL(spark)
    p.register("st", t)
    p.sql("ALTER TABLE st ALTER COLUMN cents TYPE BIGINT")
    p.sql("ALTER TABLE st ADD COLUMN (tier STRING)")
    load_table(spark, sf_dir, "supplier").filter(
        F.col("s_suppkey") % 7 == 0
    ).select(
        (F.col("s_suppkey") + 1000000).alias("s_suppkey"),
        (
            F.round(F.col("s_acctbal") * 100).cast("long")
            + F.lit(1_000_000_000_000)
        ).alias("cents"),
        F.lit("XL").alias("tier"),
    ).createOrReplaceTempView("st_new")
    p.sql("INSERT INTO st (s_suppkey, cents, tier) SELECT * FROM st_new")
    p.sql("UPDATE st SET tier = 'STD' WHERE tier IS NULL AND s_suppkey % 2 = 0")
    p.sql("ALTER TABLE st RENAME COLUMN cents TO balance_cents")
    p.sql("DELETE FROM st WHERE s_suppkey % 97 = 0 AND tier IS NULL")
    out = (
        t.read()
        .select(
            F.coalesce(F.col("tier"), F.lit("NONE")).alias("tier"),
            "balance_cents",
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("balance_cents").alias("total_cents"),
        )
        .orderBy("tier")
        .localCheckpoint()
    )
    shutil.rmtree(d, ignore_errors=True)
    return out


IDENTITY_ORACLE = """
SELECT 9 + ROW_NUMBER() OVER (ORDER BY c_custkey) AS account_key
FROM customer
ORDER BY account_key
"""


@register("sql_identity_accounts", IDENTITY_ORACLE)
def sql_identity_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS IDENTITY end to end through the SQL DDL
    (the reference's own table declares ``account_key BIGINT GENERATED
    ALWAYS AS IDENTITY (START WITH 10)``, test_scd_handler.py:41): a
    CREATE TABLE with an identity column, two appends that must NOT
    supply it, ids drawn from the footer-stats high-water mark. WHICH
    row gets which id is placement-dependent (identity guarantees
    uniqueness, not order — Delta's contract), so the checkable
    invariant is the id SEQUENCE itself: dense from START WITH across
    both batches, exactly one per row."""
    d = tempfile.mkdtemp(prefix="sql_ident_")
    p = PlatformSQL(spark)
    p.sql(
        "CREATE TABLE accounts ("
        "account_key BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10), "
        f"name STRING) LOCATION '{d}/accounts'"
    )
    t = p.tables["accounts"]
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_name").alias("name")
    )
    t.append(cust.filter(F.col("c_custkey") % 2 == 0).select("name"))
    t.append(cust.filter(F.col("c_custkey") % 2 != 0).select("name"))
    out = (
        t.read().select("account_key").orderBy("account_key").localCheckpoint()
    )
    shutil.rmtree(d, ignore_errors=True)
    return out


MERGE_BY_SOURCE_ORACLE = """
WITH base AS (
  SELECT c_custkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
merged AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment
              ELSE 'ORPHAN' END AS c_mktsegment,
         CASE WHEN c_custkey % 3 = 0 THEN cents + 1 ELSE cents END AS cents
  FROM base
  WHERE NOT (c_custkey % 3 <> 0 AND c_custkey % 7 = 0)
)
SELECT c_mktsegment, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total_cents
FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

_MERGE_BY_SOURCE_CACHE: dict[str, str] = {}


@register("sql_merge_by_source_sync", MERGE_BY_SOURCE_ORACLE)
def sql_merge_by_source_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with WHEN NOT MATCHED BY SOURCE (Delta 2.3+) through the
    SQL dialect: matched rows update, unmatched-by-source rows are
    conditionally deleted (every 7th key) and otherwise flagged — the
    canonical sync-target-to-source shape. One left-outer join serves
    all clause families; under file-level COW only files containing
    touched rows are rewritten, which is what keeps a sync merge
    against a 100 TB dimension bounded by the churn, not the table."""
    path = _MERGE_BY_SOURCE_CACHE.get(sf_dir)
    p = PlatformSQL(spark)
    if path is None or not os.path.isdir(path):
        d = tempfile.mkdtemp(prefix="merge_bysrc_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        t = ManagedTable(spark, f"{d}/ct")
        t.create(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey",
                "c_mktsegment",
                F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
            )
        )
        p.register("ct", t)
        load_table(spark, sf_dir, "customer").filter(
            F.col("c_custkey") % 3 == 0
        ).select(
            "c_custkey",
            (F.round(F.col("c_acctbal") * 100).cast("long") + 1).alias("cents"),
        ).createOrReplaceTempView("ct_src")
        p.sql(
            """
            MERGE INTO ct t USING ct_src s
            ON t.c_custkey = s.c_custkey
            WHEN MATCHED THEN UPDATE SET cents = s.cents
            WHEN NOT MATCHED BY SOURCE AND t.c_custkey % 7 = 0 THEN DELETE
            WHEN NOT MATCHED BY SOURCE THEN UPDATE SET c_mktsegment = 'ORPHAN'
            """
        )
        _MERGE_BY_SOURCE_CACHE[sf_dir] = t.path
        path = t.path
    else:
        p.register("ct", ManagedTable(spark, path))
    return p.sql(
        "SELECT c_mktsegment, COUNT(*) AS n, SUM(cents) AS total_cents "
        "FROM ct GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )


COLUMN_DEFAULTS_ORACLE = """
WITH src AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 2 = 0 THEN 'direct' ELSE 'web' END
           AS channel,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
ins AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 4 = 0 THEN channel ELSE 'unknown' END
           AS channel,
         CASE WHEN c_custkey % 4 = 0 THEN cents ELSE 0 END AS cents
  FROM src
)
SELECT channel, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM ins
GROUP BY channel
ORDER BY channel
"""


@register("sql_column_defaults", COLUMN_DEFAULTS_ORACLE)
def sql_column_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column DEFAULT values end to end (Delta's defaultColumns):
    CREATE TABLE declares channel/cents defaults, a quarter of the
    customers insert with full columns, the rest insert only their
    key and take the declared defaults; SET DEFAULT mid-stream is NOT
    used here so the oracle stays a pure CASE reconstruction."""
    import shutil as _shutil
    import tempfile as _tempfile

    d = _tempfile.mkdtemp(prefix="sql_defaults_")
    p = PlatformSQL(spark)
    p.sql(
        f"CREATE TABLE cdef (c_custkey BIGINT, "
        f"channel STRING DEFAULT 'unknown', "
        f"cents BIGINT DEFAULT 0) LOCATION '{d}/cdef'"
    )
    t = p.tables["cdef"]
    src = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 2 == 0, F.lit("direct"))
        .otherwise(F.lit("web"))
        .alias("channel"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    # Full-column inserts for a quarter; key-only for the rest — the
    # engine fills the omitted columns from the declared defaults.
    t.append(src.filter(F.col("c_custkey") % 4 == 0))
    t.append(
        src.filter(F.col("c_custkey") % 4 != 0).select("c_custkey")
    )
    out = p.sql(
        "SELECT channel, COUNT(*) AS n, SUM(cents) AS total_cents "
        "FROM cdef GROUP BY channel ORDER BY channel"
    ).localCheckpoint()
    _shutil.rmtree(d, ignore_errors=True)
    return out


STATS_AGG_ORACLE = """
SELECT COUNT(*)::BIGINT AS n_orders,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       MIN(o_orderdate) AS first_day,
       MAX(o_orderdate) AS last_day
FROM orders
"""


@register("sql_stats_minmax_orders", STATS_AGG_ORACLE)
def sql_stats_minmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregates (r7, Delta's OptimizeMetadataOnlyQuery
    over add-action stats): bare COUNT(*)/MIN/MAX over a managed table
    are answered from the commit log's row accounting and per-file
    footer stats — zero data files opened, O(log) at any table size.
    The in-query monkeyless proof: ManagedTable.read is swapped for a
    raiser while the aggregate runs, so a scan would error the query
    rather than quietly pass."""
    import shutil as _shutil
    import tempfile as _tempfile

    d = _tempfile.mkdtemp(prefix="sql_statsagg_")
    p = PlatformSQL(spark)
    t = ManagedTable(spark, f"{d}/orders_t")
    t.create(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate"
        )
    )
    p.register("orders_t", t)
    # Instance-level patch: only THIS table loses its read path while
    # the aggregate runs — a class-level patch would break every other
    # ManagedTable in the process for the duration.
    t.read = _raise_on_scan.__get__(t)  # metadata-only or bust
    try:
        out = p.sql(
            "SELECT COUNT(*) AS n_orders, MIN(o_orderkey) AS min_key, "
            "MAX(o_orderkey) AS max_key, MIN(o_orderdate) AS first_day, "
            "MAX(o_orderdate) AS last_day FROM orders_t"
        ).localCheckpoint()
    finally:
        del t.read
    _shutil.rmtree(d, ignore_errors=True)
    return out


def _raise_on_scan(self, *a, **kw):
    raise AssertionError(
        "sql_stats_minmax_orders: aggregate fell back to a scan"
    )


def _stats_col_sql(c: str) -> str:
    return f"""
  SELECT '{c}' AS col_name, COUNT(*)::BIGINT AS row_count,
    COUNT(DISTINCT {c})::BIGINT AS ndv,
    (COUNT(*) - COUNT({c}))::BIGINT AS null_count,
    MIN({c})::VARCHAR AS min_val, MAX({c})::VARCHAR AS max_val,
    ROUND(AVG(LENGTH({c}::VARCHAR)), 6) AS avg_len
  FROM orders"""


ANALYZE_STATS_ORACLE = (
    "WITH s AS ("
    + "\n  UNION ALL".join(
        _stats_col_sql(c)
        for c in ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    )
    + ")\nSELECT * FROM s ORDER BY col_name"
)


@register("sql_analyze_stats_orders", ANALYZE_STATS_ORACLE)
def sql_analyze_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE + SHOW STATS end to end: persisted per-column
    statistics (exact NDV mode for oracle-grade comparison; the
    default is the one-pass HLL approximation, the 100 TB path).
    The same stats drive stats_planned_join's broadcast decision —
    this query verifies the numbers themselves against a full
    per-column DuckDB recomputation."""
    import shutil as _shutil
    import tempfile as _tempfile

    d = _tempfile.mkdtemp(prefix="sql_analyze_")
    p = PlatformSQL(spark)
    t = ManagedTable(spark, f"{d}/orders_t")
    t.create(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
        )
    )
    p.register("orders_t", t)
    p.sql(
        "ANALYZE TABLE orders_t COMPUTE STATISTICS FOR COLUMNS "
        "(o_orderkey, o_custkey, o_orderstatus, o_orderpriority) "
        "WITH EXACT NDV"
    )
    out = (
        p.sql("SHOW STATS orders_t")
        .drop("stale")
        .orderBy("col_name")
        .localCheckpoint()
    )
    _shutil.rmtree(d, ignore_errors=True)
    return out
