"""Transparent materialized-view query rewrite in PlatformSQL.

An aggregate SELECT over the BASE table is answered from a fresh
maintained view — proven by poisoning the base table's read path while
the query runs. Stale views, uncovered columns, and non-group WHERE
references all fall through to the real scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.sources.materialized_view import (
    MaterializedAggView,
)
from delta_lake_platform_spark.sql import PlatformSQL


def _raise_on_scan(self, *a, **kw):
    raise AssertionError("base table was scanned — rewrite did not fire")


@pytest.fixture()
def env(spark, tmp_path):
    p = PlatformSQL(spark)
    t = ManagedTable(spark, str(tmp_path / "orders"))
    t.create(
        spark.createDataFrame(
            [
                ("O", "HIGH", 10.0, 1),
                ("O", "LOW", 20.0, 2),
                ("F", "HIGH", 30.0, 3),
                ("F", "HIGH", 40.0, 1),
                ("P", "LOW", 50.0, 2),
            ],
            "status string, prio string, price double, cust long",
        )
    )
    p.register("orders", t)
    mv = MaterializedAggView(
        t,
        str(tmp_path / "mv"),
        group_cols=["status", "prio"],
        sum_cols=["price"],
        minmax_cols=["price"],
        approx_distinct_cols=["cust"],
        hll_lg_k=20,
    )
    mv.create()
    p._views["orders_by_sp"] = mv
    return p, t, mv


def test_exact_grain_is_answered_without_base_scan(env):
    p, t, _ = env
    t.read = _raise_on_scan.__get__(t)
    try:
        rows = p.sql(
            "SELECT status, prio, COUNT(*) AS n, SUM(price) AS total "
            "FROM orders GROUP BY status, prio"
        ).collect()
    finally:
        del t.read
    assert p.last_select_rewrite == "orders_by_sp"
    got = {(r.status, r.prio): (r.n, r.total) for r in rows}
    assert got[("O", "HIGH")] == (1, 10.0)
    assert got[("F", "HIGH")] == (2, 70.0)


def test_coarser_grain_reaggregates_state(env):
    p, t, _ = env
    t.read = _raise_on_scan.__get__(t)
    try:
        rows = p.sql(
            "SELECT status, COUNT(*) AS n, MIN(price) AS lo, "
            "MAX(price) AS hi FROM orders GROUP BY status"
        ).collect()
    finally:
        del t.read
    assert p.last_select_rewrite == "orders_by_sp"
    got = {r.status: (r.n, r.lo, r.hi) for r in rows}
    assert got["O"] == (2, 10.0, 20.0)
    assert got["F"] == (2, 30.0, 40.0)
    assert got["P"] == (1, 50.0, 50.0)


def test_global_aggregate_and_where_on_group_cols(env):
    p, t, _ = env
    t.read = _raise_on_scan.__get__(t)
    try:
        r = p.sql(
            "SELECT COUNT(*) AS n, SUM(price) AS total FROM orders "
            "WHERE prio = 'HIGH'"
        ).collect()[0]
    finally:
        del t.read
    assert p.last_select_rewrite == "orders_by_sp"
    assert (r.n, r.total) == (3, 80.0)


def test_approx_distinct_unions_sketches_at_coarser_grain(env):
    p, t, _ = env
    t.read = _raise_on_scan.__get__(t)
    try:
        rows = p.sql(
            "SELECT status, APPROX_COUNT_DISTINCT(cust) AS nd "
            "FROM orders GROUP BY status"
        ).collect()
    finally:
        del t.read
    assert p.last_select_rewrite == "orders_by_sp"
    got = {r.status: r.nd for r in rows}
    # lg_k=20: exact at these cardinalities; sketch UNION dedups the
    # customer shared between the two F/HIGH rows' groups correctly
    assert got == {"O": 2, "F": 2, "P": 1}


def test_stale_view_falls_through_to_scan(env):
    p, t, mv = env
    t.append(
        t.spark.createDataFrame(
            [("X", "LOW", 5.0, 9)],
            "status string, prio string, price double, cust long",
        )
    )
    rows = p.sql(
        "SELECT status, COUNT(*) AS n FROM orders GROUP BY status"
    ).collect()
    assert p.last_select_rewrite is None  # scanned, not rewritten
    assert {r.status: r.n for r in rows}["X"] == 1
    mv.refresh()
    p.sql("SELECT status, COUNT(*) AS n FROM orders GROUP BY status")
    assert p.last_select_rewrite == "orders_by_sp"  # fresh again


def test_uncovered_shapes_fall_through(env):
    p, _, _ = env
    # AVG is not derivable soundly (NULL semantics) -> scan
    p.sql("SELECT status, AVG(price) AS a FROM orders GROUP BY status")
    assert p.last_select_rewrite is None
    # WHERE on a non-group column -> scan
    p.sql("SELECT status, COUNT(*) AS n FROM orders WHERE price > 20 GROUP BY status")
    assert p.last_select_rewrite is None
    # group col outside the view grain -> scan
    p.sql("SELECT cust, COUNT(*) AS n FROM orders GROUP BY cust")
    assert p.last_select_rewrite is None


def test_rewrite_matches_scan_results_exactly(env):
    p, _, _ = env
    q = (
        "SELECT status, COUNT(*) AS n, SUM(price) AS total FROM orders "
        "GROUP BY status"
    )
    via_mv = {tuple(r) for r in p.sql(q).collect()}
    assert p.last_select_rewrite == "orders_by_sp"
    # disable the rewrite by hiding the view registry entry
    mv = p._views.pop("orders_by_sp")
    try:
        via_scan = {tuple(r) for r in p.sql(q).collect()}
        assert p.last_select_rewrite is None
    finally:
        p._views["orders_by_sp"] = mv
    assert via_mv == via_scan


@pytest.mark.parametrize("group_by", ["status, prio", "status", "prio", None])
@pytest.mark.parametrize(
    "where", [None, "prio = 'HIGH'", "status IN ('O', 'F')",
              "status = 'O' AND prio = 'LOW'"]
)
def test_rewrite_equals_scan_across_shapes(env, group_by, where):
    """Equivalence sweep: every covered (GROUP BY, WHERE) shape must
    return exactly what the scan returns."""
    p, _, _ = env
    q = "SELECT "
    if group_by:
        q += group_by + ", "
    q += ("COUNT(*) AS n, SUM(price) AS total, MIN(price) AS lo, "
          "MAX(price) AS hi FROM orders")
    if where:
        q += " WHERE " + where
    if group_by:
        q += " GROUP BY " + group_by
    via_mv = {tuple(r) for r in p.sql(q).collect()}
    assert p.last_select_rewrite == "orders_by_sp", q
    mv = p._views.pop("orders_by_sp")
    try:
        via_scan = {tuple(r) for r in p.sql(q).collect()}
    finally:
        p._views["orders_by_sp"] = mv
    assert via_mv == via_scan, q


def test_explain_reports_routing_strategy(env):
    p, t, _ = env
    r = p.sql(
        "EXPLAIN SELECT status, COUNT(*) AS n FROM orders GROUP BY status"
    ).collect()[0]
    assert r.strategy == "mv_rewrite:orders_by_sp"
    r = p.sql(
        "EXPLAIN SELECT status, AVG(price) AS a FROM orders GROUP BY status"
    ).collect()[0]
    assert r.strategy == "scan" and (
        "Scan" in r.plan or "scan" in r.plan.lower()
    )
    r = p.sql("EXPLAIN SELECT COUNT(*) FROM orders").collect()[0]
    assert r.strategy == "metadata_only"


def test_global_count_with_no_matching_groups_returns_zero(env):
    """Review finding: SUM(n_rows) over zero state rows is NULL; SQL
    COUNT(*) must be 0 exactly like the scan. SUM/MIN/MAX stay NULL
    (also like the scan)."""
    p, t, _ = env
    q = ("SELECT COUNT(*) AS n, SUM(price) AS total FROM orders "
         "WHERE status = 'ZZZ'")
    r = p.sql(q).collect()[0]
    assert p.last_select_rewrite == "orders_by_sp"
    mv = p._views.pop("orders_by_sp")
    try:
        scan = p.sql(q).collect()[0]
    finally:
        p._views["orders_by_sp"] = mv
    assert (r.n, r.total) == (scan.n, scan.total) == (0, None)


def test_explain_refuses_dml(env):
    p, t, _ = env
    v_before = t.latest_version()
    with pytest.raises(ValueError, match="SELECT statements only"):
        p.sql("EXPLAIN DELETE FROM orders WHERE status = 'O'")
    assert t.latest_version() == v_before  # nothing executed


def test_having_order_limit_rewrite(env):
    """Dashboard shape: HAVING on an output alias, ORDER BY ... DESC,
    LIMIT — all applied on the rewritten state, base never read."""
    p, t, _ = env
    t.read = _raise_on_scan.__get__(t)
    try:
        rows = p.sql(
            "SELECT status, COUNT(*) AS n, SUM(price) AS total "
            "FROM orders GROUP BY status HAVING n >= 2 "
            "ORDER BY total DESC LIMIT 1"
        ).collect()
    finally:
        del t.read
    assert p.last_select_rewrite == "orders_by_sp"
    assert len(rows) == 1
    assert rows[0].status == "F" and rows[0].total == 70.0  # top by total


def test_having_on_unselected_aggregate_falls_through(env):
    p, _, _ = env
    p.sql(
        "SELECT status, COUNT(*) AS n FROM orders GROUP BY status "
        "HAVING SUM(price) > 10"
    )
    assert p.last_select_rewrite is None  # SUM not selected -> scan
    p.sql(
        "SELECT status, COUNT(*) AS n FROM orders GROUP BY status "
        "ORDER BY MAX(price)"
    )
    assert p.last_select_rewrite is None  # aggregate ORDER BY -> scan


def test_having_order_limit_equals_scan(env):
    p, _, _ = env
    q = ("SELECT status, COUNT(*) AS n FROM orders GROUP BY status "
         "HAVING n >= 1 ORDER BY n DESC, status ASC LIMIT 2")
    via_mv = [tuple(r) for r in p.sql(q).collect()]
    assert p.last_select_rewrite == "orders_by_sp"
    mv = p._views.pop("orders_by_sp")
    try:
        via_scan = [tuple(r) for r in p.sql(q).collect()]
    finally:
        p._views["orders_by_sp"] = mv
    assert via_mv == via_scan
