"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

ROTATION (r10): the driver's correctness window holds ~50 slots per
round while the registry has 150+ oracled queries, so by round 9 only
105/154 had ever received a driver-side row. ``queries()`` therefore
exposes a rotating window: every query that has NEVER had a green
driver row comes first (in registry order), then the least-recently
green ones fill the window — a 2-round schedule under which every
registry query gets a driver row. The FULL registry remains the
source of truth for the local sweep (tests/test_queries_oracle.py
iterates the registry directly, all queries, every run) and for
bench.py; only the driver-facing window rotates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_WINDOW = 50


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from delta_lake_platform_spark.queries.registry import QUERIES
    import delta_lake_platform_spark.queries.all  # noqa: F401  (registers)

    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _rotation(all_names: list[str]) -> list[str]:
    """Window of query names for this round's driver run: never-green
    first (registry order), then stalest-green. Falls back to the full
    registry if the history can't be read."""
    import glob
    import json
    import os
    import re

    try:
        root = os.path.dirname(os.path.abspath(__file__))
        last_green: dict[str, int] = {}
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
            m = re.search(r"_r(\d+)", os.path.basename(p))
            rnd = int(m.group(1)) if m else 0
            with open(p) as fh:
                data = json.load(fh)
            for name, row in data.items():
                if (
                    isinstance(row, dict)
                    and row.get("rows_match")
                    and row.get("hash_match")
                ):
                    last_green[name] = max(last_green.get(name, -1), rnd)
        never = [n for n in all_names if n not in last_green]
        stale = sorted(
            (n for n in all_names if n in last_green),
            key=lambda n: (last_green[n], n),
        )
        width = max(_WINDOW, len(never))
        return (never + stale)[:width]
    except Exception:
        return list(all_names)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """This round's driver window (see ROTATION in the module doc).
    One entry per implemented operator from SURVEY.md §2 lives in the
    full registry; the window is a coverage-rotation subset of it."""
    from delta_lake_platform_spark.queries.registry import QUERIES
    import delta_lake_platform_spark.queries.all  # noqa: F401

    names = _rotation(list(QUERIES))
    return {n: QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for non-SQL ops),
    filtered to the same rotation window as ``queries()``."""
    from delta_lake_platform_spark.queries.registry import ORACLE_SQL, QUERIES
    import delta_lake_platform_spark.queries.all  # noqa: F401

    names = set(_rotation(list(QUERIES)))
    return {n: s for n, s in ORACLE_SQL.items() if n in names}
