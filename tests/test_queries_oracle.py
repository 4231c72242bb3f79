"""Every registered query with an oracle must match DuckDB on sf0.001.

This mirrors the driver's correctness gate (see /root/repo/__spark_entry__.py
docstring) but runs locally at the smallest SF for fast iteration.
"""

from __future__ import annotations

import pytest

import delta_lake_platform_spark.queries.all  # noqa: F401
from delta_lake_platform_spark.queries.registry import ORACLE_SQL, QUERIES

from .oracle_utils import compare, run_oracle


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    opdf = run_oracle(ORACLE_SQL[name], sf_dir)
    problems = compare(sdf, opdf)
    assert not problems, f"{name}: {problems}"


def test_all_queries_have_runnable_plans(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"
