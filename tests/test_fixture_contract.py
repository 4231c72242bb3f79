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
