"""Distributed identity assignment (functions/ids.py) and the SCD
surrogate-key wiring — the rebuild of the reference's
``GENERATED ALWAYS AS IDENTITY (START WITH 10)`` column
(test_scd_handler.py:41)."""

from __future__ import annotations

import tempfile
from datetime import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from delta_lake_platform_spark.functions.ids import (
    _range_sorted,
    assign_dense_ids,
    fill_identity,
)
from delta_lake_platform_spark.plans.introspect import explain_str
from delta_lake_platform_spark.scd.engine import (
    ScdConfig,
    apply_scd,
    create_scd_target,
)
from delta_lake_platform_spark.sources.catalog import load_table
from delta_lake_platform_spark.sources.managed_table import ManagedTable


def test_dense_ids_equal_global_rank(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    got = assign_dense_ids(
        cust, ["c_custkey"], start=10, id_col="sk", num_partitions=8
    )
    want = cust.withColumn(
        "sk", F.lit(9) + F.row_number().over(Window.orderBy("c_custkey"))
    )
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_dense_ids_stable_across_partition_counts(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    a = assign_dense_ids(cust, ["c_custkey"], num_partitions=2).collect()
    b = assign_dense_ids(cust, ["c_custkey"], num_partitions=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dense_ids_no_single_partition_stage(spark, sf_dir):
    """The scale contract: range exchange, never a global collapse to
    one task (which is what a naive global row_number window does)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    plan = explain_str(_range_sorted(cust, ["c_custkey"], 8))
    assert "rangepartitioning" in plan
    assert "SinglePartition" not in plan


def test_dense_ids_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    out = assign_dense_ids(df, ["k"], id_col="sk")
    assert out.count() == 0 and "sk" in out.columns


def test_fill_identity_only_touches_nulls(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, None), (3, None)], "k int, sk long"
    )
    out = fill_identity(df, "sk", ["k"], next_value=200).collect()
    got = {r["k"]: r["sk"] for r in out}
    assert got == {1: 100, 2: 200, 3: 201}


@pytest.fixture()
def scd_cfg_and_table(spark):
    d = tempfile.mkdtemp(prefix="dlp_sk_")
    cfg = ScdConfig(
        pk_cols=["id"],
        scd_cols=["units"],
        clock=lambda: datetime(2024, 1, 1),
        surrogate_col="account_key",
        surrogate_start=10,
    )
    table = ManagedTable(spark, f"{d}/dim")
    batch0 = spark.createDataFrame([], "id int, units string, platform string")
    create_scd_target(table, batch0, cfg)
    return cfg, table


def test_scd_surrogate_keys_three_days(spark, scd_cfg_and_table):
    """Reference scenario shape: initial load starts at 10; SCD2 new
    versions draw fresh keys; SCD1 updates and duplicates keep keys."""
    cfg, table = scd_cfg_and_table
    day1 = spark.createDataFrame(
        [(1, "u1", "p1"), (2, "u2", "p2"), (3, "u3", "p3")],
        "id int, units string, platform string",
    )
    apply_scd(day1, table, cfg)
    keys1 = {
        r["id"]: r["account_key"] for r in table.read().collect()
    }
    assert keys1 == {1: 10, 2: 11, 3: 12}

    # Day 2: id=1 changes units (SCD2 -> new key), id=2 duplicate
    # (no-op), id=3 changes platform only (SCD1 -> keeps key).
    cfg2 = ScdConfig(
        **{**cfg.__dict__, "clock": lambda: datetime(2024, 1, 2)}
    )
    day2 = spark.createDataFrame(
        [(1, "u1b", "p1"), (2, "u2", "p2"), (3, "u3", "p3b")],
        "id int, units string, platform string",
    )
    apply_scd(day2, table, cfg2)
    rows = table.read().collect()
    active = {
        r["id"]: r["account_key"] for r in rows if r["record_status"] == "A"
    }
    closed = {
        r["id"]: r["account_key"] for r in rows if r["record_status"] == "I"
    }
    assert closed == {1: 10}  # old version keeps its key
    assert active[1] == 13  # new SCD2 version drew from the HWM
    assert active[2] == 11 and active[3] == 12  # no-op + SCD1 keep keys
    assert len(rows) == 4


def test_scd_surrogate_ignores_batch_supplied_values(spark, scd_cfg_and_table):
    """GENERATED ALWAYS: a batch that smuggles in account_key values
    does not control the assignment."""
    cfg, table = scd_cfg_and_table
    day1 = spark.createDataFrame(
        [(1, "u1", "p1", 999)],
        "id int, units string, platform string, account_key long",
    )
    apply_scd(day1, table, cfg)
    assert table.read().first()["account_key"] == 10


def test_surrogate_hwm_from_footer_stats_no_scan(spark, scd_cfg_and_table):
    """The high-water mark must come from commit-log footer stats."""
    cfg, table = scd_cfg_and_table
    day1 = spark.createDataFrame(
        [(1, "u1", "p1")], "id int, units string, platform string"
    )
    apply_scd(day1, table, cfg)
    assert table.column_max("account_key") == 10


def test_surrogate_rejected_in_two_merge_mode(spark, scd_cfg_and_table):
    cfg, table = scd_cfg_and_table
    day1 = spark.createDataFrame(
        [(1, "u1", "p1")], "id int, units string, platform string"
    )
    with pytest.raises(ValueError, match="single_commit"):
        apply_scd(day1, table, cfg, mode="two_merge")
