"""Parquet star-schema catalog.

Maps the driver's test tables (/root/testdata/sf*/ — see
/root/repo/TESTDATA.md) into DataFrames / temp views. The reference
reads its tables via ``spark.sql(f"select * from {target_table}")``
(scd_handler.py:71); here sources are parquet directories addressed by
scale-factor dir, which keeps scans columnar and lets Catalyst push
filters/projections into the parquet reader.

Scale note: at 100 TB each table would be a partitioned/bucketed
parquet (or Delta/Iceberg) root rather than a single file; the loader
is path-based so nothing else changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# DataFrame handles are cheap to hold and expensive to rebuild
# (spark.read.parquet runs a file-listing + schema-inference pass, ~100ms
# per table): cache per (session, sf_dir, table). A DataFrame is just a
# plan — caching one changes no execution semantics, and the underlying
# fixtures are immutable for a session's lifetime.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}
# Which sf_dir's views are currently registered per session (temp views
# are name-global, so switching sf_dir must re-register).
_VIEWS_FOR: dict[str, str] = {}


def _app_id(spark: SparkSession) -> str:
    return spark.sparkContext.applicationId


# A parquet SCAN parallelizes at row-group granularity: a single-file,
# single-row-group table - exactly how the driver fixtures are laid
# out, even 600k-row lineitem - is ONE input split, so every narrow
# stage (scan -> filter -> project -> partial agg) runs on one core no
# matter how wide the cluster is, and maxPartitionBytes cannot help (a
# byte-range split cannot cut inside a row group). When the layout
# under-fills the cluster, ``load_table(..., parallel=True)`` restores
# the parallelism a healthy layout would have given: one round-robin
# repartition straight after the scan. Filters and column pruning
# still reach the scan (Catalyst pushes both through Repartition), so
# the exchange moves only the pruned, filtered columns. At production
# scale tables have thousands of row groups and the policy is a no-op
# by construction.
#
# OPT-IN, not blanket, by measurement: for compute-bound narrow
# pipelines (regex/ngram batteries, BPE, vector math) the restored
# width wins 2-4x, but for shuffle-first queries (joins, groupBy,
# window as the first real operator) the extra exchange is pure
# overhead - the measured TPC-H suite regressed up to 3x with a
# blanket policy (q9 0.51s -> 1.56s). The query author knows which
# shape they are building - the same call a pipeline engineer makes
# repartitioning before an expensive narrow stage.
_SPLIT_MIN_ROWS = 2_000


def _restore_scan_parallelism(
    spark: SparkSession, path: str, df: DataFrame
) -> DataFrame:
    if not os.path.isfile(path):
        # directory roots parallelize per file already; footer-listing
        # every file to refine that is not worth the driver IO
        return df
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(path).metadata
    except Exception:
        return df
    width = spark.sparkContext.defaultParallelism
    if meta.num_rows >= _SPLIT_MIN_ROWS and meta.num_row_groups < width // 2:
        return df.repartition(width)
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool = False
) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # The fixtures store naive wall-clock timestamps; date-part
    # functions (year/dayofmonth/date_trunc) convert through the session
    # timezone. Pin UTC on EVERY call — including cache hits — because
    # the pinning must cover the caller's downstream expressions
    # (date_trunc over a cached frame analyzes under whatever tz the
    # session has NOW), not just the load itself.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (_app_id(spark), sf_dir, name, bool(parallel))
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # events.ts varies by fixture generation: parquet INT64
        # TIMESTAMP(NANOS) (Spark 4 reads it only as a raw long under
        # nanosAsLong) or plain timestamp[us] (read natively as
        # TIMESTAMP_NTZ). Branch on the dtype Spark actually produced
        # rather than assuming one encoding; a wrong assumption here
        # poisons every events query AND register_views.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # Epoch-nanos as long: truncate ns -> us with integer
            # division (`div`, not `/`, which would round-trip through
            # double and lose precision at epoch-nanos magnitudes).
            # DuckDB reads the same column us-truncated, so oracles agree.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Naive wall-clock micros; session TZ is pinned UTC above, so
            # this cast preserves the wall-clock and matches the
            # (timezone-naive) DuckDB oracle.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        # already "timestamp": leave as-is
        if parallel:
            df = _restore_scan_parallelism(
                spark, f"{sf_dir}/events.parquet", df
            )
        _DF_CACHE[key] = df
        return df
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if parallel:
        df = _restore_scan_parallelism(spark, path, df)
    _DF_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can use it.
    Idempotent per (session, sf_dir): repeated SQL-path queries skip the
    10-table re-registration."""
    app = _app_id(spark)
    if _VIEWS_FOR.get(app) == sf_dir:
        return
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _VIEWS_FOR[app] = sf_dir
