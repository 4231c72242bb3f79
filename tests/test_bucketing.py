"""Bucketed co-located join: the join plan must contain no shuffle
exchange (the write-time bucketing replaced it)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.plans import count_exchanges
from delta_lake_platform_spark.sources.bucketing import read_table, write_bucketed
from delta_lake_platform_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "li_bucketed", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(orders, "orders_bucketed", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = read_table(spark, li_name)
        orders = read_table(spark, o_name)
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        assert count_exchanges(joined) == 0, "bucketed join still shuffles"
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert n > 0


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the write-time
    distribution — no shuffle before the hash aggregate."""
    li_name, _ = bucketed_tables
    li = read_table(spark, li_name)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert count_exchanges(agg) == 0
