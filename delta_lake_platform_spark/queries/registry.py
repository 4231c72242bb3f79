"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus the
DuckDB-oracle ANSI SQL for each (driver correctness gate — see
/root/repo/__spark_entry__.py).

Every computed column is aliased identically in the Spark plan and the
oracle SQL: the driver sorts columns by name before value-hashing.
Float aggregates are rounded on BOTH sides to absorb summation-order
differences between Spark (parallel partial aggregation) and DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query builder (and optionally its oracle SQL)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco
