"""ANALYZE TABLE / persisted column statistics / stats-driven join.

Covers: exact + approx NDV modes, null accounting, staleness after
DML, the SQL surface (ANALYZE TABLE ... COMPUTE STATISTICS, SHOW
STATS), and the broadcast decision stats_planned_join makes from
persisted estimates (plan-gated both ways).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.operators.relational import stats_planned_join
from delta_lake_platform_spark.plans.introspect import (
    explain_str,
    has_broadcast_hash_join,
)
from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.sql import PlatformSQL


@pytest.fixture()
def table(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", None), (3, "b", 30.0), (4, None, 40.0)],
            "k long, s string, v double",
        )
    )
    return t


def test_analyze_exact_values_and_nulls(table):
    st = table.analyze(exact_ndv=True)
    assert st["rowCount"] == 4 and st["exactNdv"] is True
    cols = st["columns"]
    assert cols["k"]["ndv"] == 4 and cols["k"]["nullCount"] == 0
    assert cols["s"]["ndv"] == 2 and cols["s"]["nullCount"] == 1
    assert cols["v"]["ndv"] == 3 and cols["v"]["nullCount"] == 1
    assert cols["k"]["min"] == "1" and cols["k"]["max"] == "4"
    # avg string length of k = (1+1+1+1)/4 = 1.0
    assert cols["k"]["avgLen"] == 1.0


def test_analyze_approx_mode_close_at_small_ndv(table):
    st = table.analyze()  # HLL default
    assert st["exactNdv"] is False
    # HLL is exact in this cardinality regime
    assert st["columns"]["k"]["ndv"] == 4


def test_column_stats_staleness_tracks_dml(table):
    table.analyze(exact_ndv=True)
    assert table.column_stats()["stale"] is False
    table.append(table.spark.createDataFrame([(9, "z", 1.0)], "k long, s string, v double"))
    assert table.column_stats()["stale"] is True
    table.analyze(exact_ndv=True)
    st = table.column_stats()
    assert st["stale"] is False and st["rowCount"] == 5


def test_analyze_subset_and_unknown_column(table):
    st = table.analyze(columns=["k"], exact_ndv=True)
    assert list(st["columns"]) == ["k"]
    with pytest.raises(ValueError, match="no such column"):
        table.analyze(columns=["nope"])


def test_estimated_size_bytes_is_rows_times_width(table):
    table.analyze(exact_ndv=True)
    st = table.column_stats()
    widths = sum(
        c["avgLen"] for c in st["columns"].values() if c["avgLen"] is not None
    )
    assert table.estimated_size_bytes() == int(4 * widths) > 0


def test_sql_analyze_and_show_stats(spark, tmp_path):
    p = PlatformSQL(spark)
    t = ManagedTable(spark, str(tmp_path / "sq"))
    t.create(spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string"))
    p.register("sq", t)
    with pytest.raises(ValueError, match="no statistics"):
        p.sql("SHOW STATS sq")
    out = p.sql(
        "ANALYZE TABLE sq COMPUTE STATISTICS FOR COLUMNS (k, s) WITH EXACT NDV"
    ).collect()[0]
    assert out.row_count == 2 and out.n_columns == 2 and out.exact_ndv
    rows = {r.col_name: r for r in p.sql("SHOW STATS sq").collect()}
    assert set(rows) == {"k", "s"}
    assert rows["k"].ndv == 2 and rows["k"].min_val == "1"
    assert rows["s"].null_count == 0 and not rows["s"].stale


def _mk_fact_dim(spark, tmp_path, n_fact=2000, n_dim=5):
    fact = ManagedTable(spark, str(tmp_path / "fact"))
    fact.create(
        spark.range(n_fact).select(
            F.col("id").alias("k"), (F.col("id") % n_dim).alias("dim_id")
        )
    )
    dim = ManagedTable(spark, str(tmp_path / "dim"))
    dim.create(
        spark.createDataFrame(
            [(i, f"dim_{i}") for i in range(n_dim)], "dim_id long, name string"
        )
    )
    return fact, dim


def test_stats_planned_join_broadcasts_analyzed_small_side(spark, tmp_path):
    fact, dim = _mk_fact_dim(spark, tmp_path)
    dim.analyze(exact_ndv=True)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = stats_planned_join(
            fact, dim, on="dim_id", broadcast_threshold=10**9
        )
        assert has_broadcast_hash_join(df), explain_str(df)
        assert df.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_stats_planned_join_ignores_stale_and_missing_stats(spark, tmp_path):
    """No fresh stats on either side -> no broadcast hint is added (AQE
    / the session threshold decides; with auto-broadcast off the plan
    is a shuffle join). Stale stats must not be trusted either."""
    fact, dim = _mk_fact_dim(spark, tmp_path)
    dim.analyze(exact_ndv=True)
    dim.append(dim.spark.createDataFrame([(99, "late")], "dim_id long, name string"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = stats_planned_join(
            fact, dim, on="dim_id", broadcast_threshold=10**9
        )
        assert not has_broadcast_hash_join(df), explain_str(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partial_analyze_refuses_size_estimate(table):
    """Review finding: a column-subset ANALYZE would undercount the
    row width ~Nx and mislead the broadcast decision — the estimate
    must refuse, and stats_planned_join must then add no hint."""
    table.analyze(columns=["k"], exact_ndv=True)
    assert table.column_stats()["coversAllColumns"] is False
    assert table.estimated_size_bytes() is None
    table.analyze(exact_ndv=True)
    assert table.estimated_size_bytes() is not None


def test_threshold_parser_handles_spark_size_forms():
    from delta_lake_platform_spark.operators.relational import (
        _parse_size_bytes,
    )

    assert _parse_size_bytes("10485760") == 10 * 1024 * 1024
    assert _parse_size_bytes("10485760b") == 10 * 1024 * 1024  # b = bytes
    assert _parse_size_bytes("10MB") == 10 * 1024 * 1024
    assert _parse_size_bytes("1g") == 1024**3
    assert _parse_size_bytes("-1") == -1  # broadcast disabled
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _parse_size_bytes("ten megabytes")
