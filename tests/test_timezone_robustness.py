"""Queries must produce oracle-identical results even when the caller's
session starts in a non-UTC timezone (the driver's session tz is not
ours to control — the catalog pins UTC at load time)."""

from __future__ import annotations

import pytest

import delta_lake_platform_spark.queries.all  # noqa: F401
from delta_lake_platform_spark.queries.registry import ORACLE_SQL, QUERIES
from .oracle_utils import compare, run_oracle


@pytest.fixture(scope="module")
def ny_spark(spark):
    # newSession(): an ISOLATED SQLConf over the suite's shared
    # SparkContext. The previous form (get_spark + s.stop()) was a
    # landmine: builder.getOrCreate() returns the EXISTING session
    # with the tz conf applied to it, and stop() then kills the
    # JVM-shared SparkContext for every later test file — latent
    # until a file sorting after this one touched the context
    # (test_variant.py, caught in round 9).
    s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s
    # no stop(): the SparkContext is shared suite-wide


@pytest.mark.parametrize(
    "name",
    ["orders_date_functions", "events_hourly_by_type", "order_price_bands"],
)
def test_tz_sensitive_queries_still_match(ny_spark, sf_dir, name):
    sdf = QUERIES[name](ny_spark, sf_dir)
    opdf = run_oracle(ORACLE_SQL[name], sf_dir)
    problems = compare(sdf, opdf)
    assert not problems, f"{name} under non-UTC session: {problems}"
