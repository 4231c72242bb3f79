"""Fixture-schema contract: every real testdata table loads with the
expected dtypes through load_table.

Round-1 postmortem: the events loader assumed INT64-nanos `ts` while the
actual fixtures were timestamp[us]; every unit test that built synthetic
DataFrames stayed green while the real loader was broken, so the drift
was invisible to pytest. This test reads the REAL parquet fixtures so a
fixture/Spark-version change fails loudly here first.
"""

from __future__ import annotations

import os

import pytest

from delta_lake_platform_spark.sources.catalog import TABLES, load_table

SF = "/root/testdata/sf0.001"

# Post-load_table dtypes we rely on downstream (not the raw parquet
# encoding — load_table may normalize, e.g. events.ts -> timestamp).
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_regionkey": "int", "n_name": "string"},
    "customer": {
        "c_custkey": "bigint",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int", "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_size": "int", "p_retailprice": "double"},
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_shipdate": "timestamp_ntz",
    },
    # events.ts is normalized by load_table to session-TZ timestamp
    # whatever the parquet encoding (int64-nanos OR timestamp[us]).
    "events": {
        "event_id": "bigint",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "ts": "timestamp",
    },
    "documents": {"doc_id": "bigint", "text": "string", "lang": "string", "source": "string"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata not present")
@pytest.mark.parametrize("name", TABLES)
def test_real_fixture_loads_with_expected_dtypes(spark, name):
    df = load_table(spark, SF, name)
    dtypes = dict(df.dtypes)
    for col, expected in EXPECTED[name].items():
        assert col in dtypes, f"{name}: missing column {col}; has {sorted(dtypes)}"
        assert dtypes[col] == expected, (
            f"{name}.{col}: expected {expected}, got {dtypes[col]} "
            f"(fixture drift — update load_table normalization)"
        )
    # The load itself must be executable, not just analyzable.
    assert df.limit(1).count() >= 0


def test_scan_parallelism_restored_for_degenerate_layouts(spark, tmp_path):
    """The driver fixtures are single-file single-row-group parquet —
    ONE input split however wide the cluster, and maxPartitionBytes
    cannot cut inside a row group. load_table restores cluster-width
    parallelism with one post-scan repartition, but ONLY for that
    degenerate shape: small tables and healthy multi-row-group layouts
    pass through unchanged (at production scale the policy is a no-op
    by construction)."""
    from delta_lake_platform_spark.sources.catalog import (
        _restore_scan_parallelism,
    )

    width = spark.sparkContext.defaultParallelism

    # degenerate: one big row group -> repartitioned to cluster width
    big = str(tmp_path / "big.parquet")
    spark.range(10_000).coalesce(1).write.parquet(str(tmp_path / "bigdir"))
    import glob
    import shutil

    shutil.move(glob.glob(str(tmp_path / "bigdir" / "part-*.parquet"))[0], big)
    out = _restore_scan_parallelism(spark, big, spark.read.parquet(big))
    assert out.rdd.getNumPartitions() == width

    # small table: unchanged (an exchange would cost more than it buys)
    small = str(tmp_path / "small.parquet")
    spark.range(100).coalesce(1).write.parquet(str(tmp_path / "smalldir"))
    shutil.move(
        glob.glob(str(tmp_path / "smalldir" / "part-*.parquet"))[0], small
    )
    sdf = spark.read.parquet(small)
    assert _restore_scan_parallelism(spark, small, sdf) is sdf

    # healthy layout: enough row groups to fill the cluster -> unchanged
    many = str(tmp_path / "many.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"id": list(range(100_000))}), many, row_group_size=2_000
    )
    mdf = spark.read.parquet(many)
    assert _restore_scan_parallelism(spark, many, mdf) is mdf

    # directory roots pass through untouched
    ddir = str(tmp_path / "adir")
    spark.range(10_000).coalesce(1).write.parquet(ddir)
    ddf = spark.read.parquet(ddir)
    assert _restore_scan_parallelism(spark, ddir, ddf) is ddf
