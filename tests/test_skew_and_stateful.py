"""Salted aggregation/join correctness + stateful streaming operator."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from delta_lake_platform_spark.operators.skew import salted_agg, salted_join
from delta_lake_platform_spark.sources.catalog import load_table
from delta_lake_platform_spark.streaming.stateful import running_user_totals


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag,): (r.n, round(r.s, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.n, round(r.s, 2))
        for r in salted_agg(
            li,
            keys=["l_returnflag"],
            aggs={"n": ("l_quantity", "count"), "s": ("l_quantity", "sum")},
            spread_col="l_orderkey",
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, on="l_orderkey").count()
    salted = salted_join(
        li, orders, on=["l_orderkey"], spread_col="l_quantity"
    ).count()
    assert plain == salted


def test_stateful_running_totals_across_batches(spark, sf_dir):
    """applyInPandasWithState carries state across micro-batches: with
    one input file per trigger, final totals must equal the batch
    aggregate over everything."""
    d = tempfile.mkdtemp(prefix="stateful_")
    try:
        ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
        # two files -> two micro-batches
        ev.filter(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(f"{d}/in/a")
        ev.filter(F.col("user_id") % 2 == 1).coalesce(1).write.parquet(f"{d}/in/b")
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/in/*")
        )
        q = (
            running_user_totals(stream)
            .writeStream.format("memory")
            .queryName("running_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # last emitted row per user == full batch aggregate
        got = {
            r.user_id: (r.n_events, r.total_value)
            for r in spark.table("running_totals").collect()
        }
        expected = {
            r.user_id: (r.n, round(r.s, 2))
            for r in ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)
