"""Data-layout pruning (partitioning, Z-order) and approximate sketches
(HLL, approx percentiles) — the scale paths, bounded against exact."""

from __future__ import annotations

import re
import shutil
import tempfile

from pyspark.sql import functions as F

from delta_lake_platform_spark.plans.introspect import explain_str
from delta_lake_platform_spark.sources.catalog import load_table
from delta_lake_platform_spark.sources.partitioning import (
    read_partitioned,
    write_partitioned,
    zorder_frame,
)


def test_partition_pruning_engages(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="part_")
    try:
        ev = load_table(spark, sf_dir, "events").withColumn(
            "day", F.dayofmonth("ts")
        )
        write_partitioned(ev, f"{d}/events_by_day", ["day"])
        df = read_partitioned(spark, f"{d}/events_by_day").filter(F.col("day") == 5)
        plan = explain_str(df)
        m = re.search(r"PartitionFilters: \[([^\]]+)\]", plan)
        assert m and "day" in m.group(1), plan
        # pruned read returns exactly the partition's rows
        expected = ev.filter(F.col("day") == 5).count()
        assert df.count() == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_zorder_improves_rowgroup_locality(spark, sf_dir):
    """After Z-ordering on (o_custkey, o_orderkey), each output file
    covers a bounded range of BOTH columns (multi-dim min/max
    selectivity), unlike the original single-column ordering."""
    d = tempfile.mkdtemp(prefix="zorder_")
    try:
        orders = load_table(spark, sf_dir, "orders")
        z = zorder_frame(orders, ["o_custkey", "o_orderkey"], n_files=8)
        z.write.mode("overwrite").parquet(f"{d}/z")

        import pyarrow.parquet as pq
        import glob

        spans = []
        n_cust = orders.select(F.max("o_custkey")).first()[0]
        for f in glob.glob(f"{d}/z/*.parquet"):
            t = pq.read_table(f, columns=["o_custkey"])
            col = t.column("o_custkey").to_pylist()
            if col:
                spans.append((max(col) - min(col)) / max(n_cust, 1))
        # every file's custkey span is a fraction of the domain
        assert spans and sum(spans) / len(spans) < 0.8, spans
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_hll_within_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.1, (exact, approx)


def test_approx_percentile_within_error(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    exact = o.select(F.percentile("o_totalprice", F.lit(0.5))).first()[0]
    approx = o.select(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(1000))
    ).first()[0]
    assert abs(approx - exact) / exact < 0.05, (exact, approx)
