"""Queries must produce oracle-identical results even when the caller's
session starts in a non-UTC timezone (the driver's session tz is not
ours to control — the catalog pins UTC at load time)."""

from __future__ import annotations

import pytest

import delta_lake_platform_spark.queries.all  # noqa: F401
from delta_lake_platform_spark.queries.registry import ORACLE_SQL, QUERIES
from delta_lake_platform_spark.session import get_spark

from .oracle_utils import compare, run_oracle


@pytest.fixture(scope="module")
def ny_spark():
    s = get_spark(
        "dlp-tz-test",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.session.timeZone": "America/New_York"},
    )
    yield s
    s.stop()


@pytest.mark.parametrize(
    "name",
    ["orders_date_functions", "events_hourly_by_type", "order_price_bands"],
)
def test_tz_sensitive_queries_still_match(ny_spark, sf_dir, name):
    sdf = QUERIES[name](ny_spark, sf_dir)
    opdf = run_oracle(ORACLE_SQL[name], sf_dir)
    problems = compare(sdf, opdf)
    assert not problems, f"{name} under non-UTC session: {problems}"
