"""Inner-phase profile: monkeypatch timers around the engine internals
the three commit-tax queries spend their time in. Run directly."""

from __future__ import annotations

import functools
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LOG = []


def timed(label, fn):
    @functools.wraps(fn)
    def w(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            LOG.append((label, time.perf_counter() - t0))

    return w


def patch_all():
    from delta_lake_platform_spark.sources import managed_table as mt
    from delta_lake_platform_spark.sources import materialized_view as mv
    from delta_lake_platform_spark.functions import ids

    mt.ManagedTable.overwrite = timed("overwrite", mt.ManagedTable.overwrite)
    mt.ManagedTable._commit = timed("_commit(full)", mt.ManagedTable._commit)
    mt.ManagedTable._write_data_staged = timed(
        "_write_data_staged", mt.ManagedTable._write_data_staged
    )
    mt.ManagedTable.change_feed = timed(
        "change_feed(build)", mt.ManagedTable.change_feed
    )
    mt._scan_parquet_footers = timed(
        "_scan_parquet_footers", mt._scan_parquet_footers
    )
    ids.assign_dense_ids = timed("assign_dense_ids", ids.assign_dense_ids)
    ids.fill_identity = timed("fill_identity", ids.fill_identity)
    # scd engine imported these by name — rebind.
    from delta_lake_platform_spark.scd import engine as eng

    eng.assign_dense_ids = ids.assign_dense_ids
    eng.fill_identity = ids.fill_identity
    mv.MaterializedAggView._recompute_dirty = timed(
        "mv._recompute_dirty", mv.MaterializedAggView._recompute_dirty
    )


def dump(title):
    print(f"\n== {title}")
    for label, dt in LOG:
        print(f"  {dt*1000:8.0f} ms  {label}")
    LOG.clear()


def run_minmax(spark):
    from delta_lake_platform_spark.sources.managed_table import ManagedTable
    from delta_lake_platform_spark.sources.materialized_view import (
        MaterializedAggView,
    )
    from delta_lake_platform_spark.sources.catalog import load_table

    d = tempfile.mkdtemp(prefix="prof2_mm_")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    base = ManagedTable(spark, f"{d}/orders_base")
    base.create(orders)
    mvw = MaterializedAggView(
        base,
        f"{d}/mv",
        group_cols=["o_orderstatus"],
        sum_cols=["price_cents"],
        minmax_cols=["price_cents"],
    )
    mvw.create()
    base.delete("o_orderkey % 17 = 0", rewrite=False)
    base.append(
        base.read()
        .filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    )
    LOG.clear()
    t0 = time.perf_counter()
    mvw.refresh()
    LOG.append(("TOTAL refresh", time.perf_counter() - t0))
    dump("mv_minmax refresh")
    shutil.rmtree(d, ignore_errors=True)


def run_surrogate(spark):
    from datetime import datetime

    from delta_lake_platform_spark.scd import ScdConfig, apply_scd
    from delta_lake_platform_spark.scd.engine import create_scd_target
    from delta_lake_platform_spark.sources.catalog import load_table
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="prof2_sk_")
    cfg = dict(
        pk_cols=["c_custkey"],
        scd_cols=["c_mktsegment"],
        surrogate_col="account_key",
        surrogate_start=10,
    )
    day1 = (
        load_table(spark, SF_DIR, "customer")
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
    LOG.clear()
    t0 = time.perf_counter()
    apply_scd(day1, table, ScdConfig(clock=lambda: datetime(2026, 1, 1), **cfg))
    LOG.append(("TOTAL apply day1", time.perf_counter() - t0))
    dump("apply day1 (initial)")
    t0 = time.perf_counter()
    apply_scd(day2, table, ScdConfig(clock=lambda: datetime(2026, 1, 2), **cfg))
    LOG.append(("TOTAL apply day2", time.perf_counter() - t0))
    dump("apply day2 (scd2)")
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("profile_inner")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    patch_all()
    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "minmax"):
        run_minmax(spark)
    if which in ("all", "sk"):
        run_surrogate(spark)
    spark.stop()
