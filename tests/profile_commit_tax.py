"""Phase-level wall-clock profile of the three commit-tax queries.
Not a pytest module — run directly:  python tests/profile_commit_tax.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class T:
    def __init__(self, spark=None):
        self.t0 = time.perf_counter()
        self.last = self.t0
        self.rows = []
        self.spark = spark
        self._group = 0
        self._set_group()

    def _set_group(self):
        if self.spark is not None:
            self._group += 1
            self.spark.sparkContext.setJobGroup(
                f"phase-{self._group}", "profile"
            )

    def _jobs(self):
        if self.spark is None:
            return -1
        st = self.spark.sparkContext.statusTracker()
        return len(st.getJobIdsForGroup(f"phase-{self._group}") or [])

    def mark(self, label):
        now = time.perf_counter()
        self.rows.append((label, now - self.last, self._jobs()))
        self._set_group()
        self.last = now

    def dump(self, title):
        total = self.last - self.t0
        print(f"\n== {title}  total {total:.2f}s")
        for label, dt, nj in self.rows:
            print(f"  {dt*1000:8.0f} ms  {nj:3d} jobs  {label}")


def jobs(spark):
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])


def profile_mv_incremental(spark):
    from delta_lake_platform_spark.sources.managed_table import ManagedTable
    from delta_lake_platform_spark.sources.materialized_view import (
        MaterializedAggView,
    )
    from delta_lake_platform_spark.sources.catalog import load_table

    d = tempfile.mkdtemp(prefix="prof_mv_")
    t = T(spark)
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    base = ManagedTable(spark, f"{d}/orders_base")
    base.create(orders)
    t.mark("base.create")
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["o_orderstatus"], sum_cols=["price_cents"]
    )
    mv.create()
    t.mark("mv.create")
    base.delete("o_orderkey % 17 = 0", rewrite=False)
    t.mark("base.delete (MOR)")
    base.append(
        base.read()
        .filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    )
    t.mark("base.append")
    mv.refresh()
    t.mark("mv.refresh")
    mv.state.read().orderBy("o_orderstatus").localCheckpoint()
    t.mark("final read")
    t.dump("mv_incremental_orders_by_status")
    shutil.rmtree(d, ignore_errors=True)


def profile_mv_minmax(spark):
    from delta_lake_platform_spark.sources.managed_table import ManagedTable
    from delta_lake_platform_spark.sources.materialized_view import (
        MaterializedAggView,
    )
    from delta_lake_platform_spark.sources.catalog import load_table

    d = tempfile.mkdtemp(prefix="prof_mm_")
    t = T(spark)
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    base = ManagedTable(spark, f"{d}/orders_base")
    base.create(orders)
    t.mark("base.create")
    mv = MaterializedAggView(
        base,
        f"{d}/mv",
        group_cols=["o_orderstatus"],
        sum_cols=["price_cents"],
        minmax_cols=["price_cents"],
    )
    mv.create()
    t.mark("mv.create")
    base.delete("o_orderkey % 17 = 0", rewrite=False)
    t.mark("base.delete (MOR)")
    base.append(
        base.read()
        .filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    )
    t.mark("base.append")
    mv.refresh()
    t.mark("mv.refresh")
    mv.state.read().orderBy("o_orderstatus").localCheckpoint()
    t.mark("final read")
    t.dump("mv_minmax_orders_by_status")
    shutil.rmtree(d, ignore_errors=True)


def profile_surrogate(spark):
    from datetime import datetime

    from delta_lake_platform_spark.scd import ScdConfig, apply_scd
    from delta_lake_platform_spark.scd.engine import create_scd_target
    from delta_lake_platform_spark.sources.catalog import load_table
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="prof_sk_")
    t = T(spark)
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
    t.mark("create_scd_target")
    apply_scd(day1, table, ScdConfig(clock=lambda: datetime(2026, 1, 1), **cfg))
    t.mark("apply day1 (initial load)")
    apply_scd(day2, table, ScdConfig(clock=lambda: datetime(2026, 1, 2), **cfg))
    t.mark("apply day2 (scd2)")
    table.read().select(
        "c_custkey", "account_key", "c_mktsegment", "record_status"
    ).orderBy("c_custkey", "account_key").localCheckpoint()
    t.mark("final read")
    t.dump("scd_surrogate_keys")
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("profile_commit_tax")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the session (JIT, codegen caches) with a throwaway pass.
    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "mv"):
        profile_mv_incremental(spark)
    if which in ("all", "minmax"):
        profile_mv_minmax(spark)
    if which in ("all", "sk"):
        profile_surrogate(spark)
    spark.stop()
