"""Incremental materialized-view maintenance: after any mix of base
DML (append / delete / merge-update), refresh() must land on exactly
the state a full recompute produces — and must do so from the change
feed, not a base rescan."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.catalog import load_table
from delta_lake_platform_spark.sources.managed_table import ManagedTable, MergeClauses
from delta_lake_platform_spark.sources.materialized_view import MaterializedAggView


@pytest.fixture()
def base_and_view(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="dlp_mv_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    base = ManagedTable(spark, f"{d}/orders_base")
    base.create(orders)
    mv = MaterializedAggView(
        base, f"{d}/orders_by_status_mv",
        group_cols=["o_orderstatus"], sum_cols=["price_cents"],
    )
    mv.create()
    return base, mv


def _recompute(mv):
    return mv._aggregate(mv.base.read())


def _assert_view_exact(mv):
    got, want = mv.read().drop("avg_price_cents"), _recompute(mv)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_refresh_after_append_and_delete(base_and_view):
    base, mv = base_and_view
    sample = base.read().filter(F.col("o_orderkey") % 13 == 0)
    shifted = sample.withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    base.append(shifted)
    base.delete("o_orderkey % 17 = 0")
    assert mv.is_stale()
    mv.refresh()
    assert not mv.is_stale()
    _assert_view_exact(mv)


def test_refresh_after_merge_update(base_and_view):
    base, mv = base_and_view
    bump = (
        base.read()
        .filter(F.col("o_orderkey") % 11 == 0)
        .withColumn("price_cents", F.col("price_cents") + 500)
    )
    base.merge(
        bump,
        MergeClauses(
            condition="target.o_orderkey = updates.o_orderkey",
            matched_update={
                "price_cents": "updates.price_cents",
                "o_orderstatus": "updates.o_orderstatus",
            },
            check_multi_match=False,
        ),
    )
    mv.refresh()
    _assert_view_exact(mv)


def test_refresh_is_noop_when_current(base_and_view):
    base, mv = base_and_view
    v = mv.state.latest_version()
    assert mv.refresh() == v
    assert mv.state.latest_version() == v  # no empty commit


def test_group_disappears_when_all_rows_deleted(base_and_view):
    base, mv = base_and_view
    base.delete("o_orderstatus = 'F'")
    mv.refresh()
    assert mv.read().filter(F.col("o_orderstatus") == "F").isEmpty()
    _assert_view_exact(mv)


def test_avg_derivation(base_and_view):
    base, mv = base_and_view
    row = mv.read().filter(F.col("o_orderstatus") == "O").first()
    assert row["avg_price_cents"] == pytest.approx(
        row["sum_price_cents"] / row["n_rows"]
    )


# --- incrementally-maintained JOIN view --------------------------------------


@pytest.fixture()
def join_view(spark, sf_dir):
    from delta_lake_platform_spark.sources.materialized_view import (
        MaterializedJoinAggView,
    )

    d = tempfile.mkdtemp(prefix="dlp_mvj_")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    left = ManagedTable(spark, f"{d}/orders")
    left.create(orders)
    right = ManagedTable(spark, f"{d}/cust")
    right.create(cust)
    mv = MaterializedJoinAggView(
        left, right, f"{d}/mv",
        on=["custkey"], group_cols=["segment"], sum_cols=["price_cents"],
    )
    mv.create()
    return left, right, mv


def _join_recompute(mv):
    return mv._aggregate(
        mv.left.read().join(mv.right.read(), on=mv.on)
    )


def _assert_join_view_exact(mv):
    got = mv.read().drop("avg_price_cents")
    want = _join_recompute(mv)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_join_view_left_dml(join_view):
    left, right, mv = join_view
    left.delete("o_orderkey % 7 = 0", rewrite=False)
    left.append(
        left.read().filter(F.col("o_orderkey") % 11 == 0)
        .withColumn("price_cents", F.col("price_cents") + 5)
    )
    mv.refresh()
    _assert_join_view_exact(mv)


def test_join_view_right_dml(join_view):
    left, right, mv = join_view
    right.update({"segment": "'MOVED'"}, "custkey % 5 = 0")
    mv.refresh()
    _assert_join_view_exact(mv)


def test_join_view_both_sides_dml(join_view):
    """The dL ⋈ R_old + L_new ⋈ dR decomposition must stay exact when
    BOTH bases changed between refreshes (the cross term dL ⋈ dR rides
    inside L_new ⋈ dR)."""
    left, right, mv = join_view
    left.delete("o_orderkey % 17 = 0", rewrite=False)
    right.update({"segment": "'MOVED'"}, "custkey % 10 = 0")
    left.append(
        left.read().filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("price_cents", F.col("price_cents") + 1)
    )
    mv.refresh()
    _assert_join_view_exact(mv)
    # second wave on top of the refreshed state
    right.delete("custkey % 21 = 0", rewrite=False)
    left.update({"price_cents": "price_cents + 3"}, "o_orderkey % 19 = 0")
    mv.refresh()
    _assert_join_view_exact(mv)


def test_join_view_refresh_is_noop_when_current(join_view):
    left, right, mv = join_view
    v = mv.state.latest_version()
    assert mv.refresh() == v
    assert not mv.is_stale()


def test_join_view_refresh_prunes_base_files_by_delta_keys(spark):
    """A narrow delta must not scan the whole opposite base: the
    refresh prunes base files by the delta's join-key [min, max]
    (VERDICT r3 #3). Pinned by spying on read_pruned AND by checking
    the prune actually skips files on a range-laid-out base; result
    equality vs a full recompute pins correctness."""
    from unittest import mock

    from delta_lake_platform_spark.sources.materialized_view import (
        MaterializedJoinAggView,
    )

    d = tempfile.mkdtemp(prefix="dlp_mvj_prune_")
    left = ManagedTable(spark, f"{d}/fact")
    left.create(
        spark.range(2000).select(
            (F.col("id") % 500).alias("k"),
            (F.col("id") * 3).alias("val"),
        )
    )
    right = ManagedTable(spark, f"{d}/dim")
    right.create(
        spark.range(500)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 10).alias("grp"),
        )
        .repartitionByRange(16, F.col("k"))  # range layout: stats prune
    )
    mv = MaterializedJoinAggView(
        left, right, f"{d}/mv", on=["k"], group_cols=["grp"], sum_cols=["val"]
    )
    mv.create()

    # Narrow delta: keys 100..104 live in ~1 of the dim's 16 files.
    left.append(
        spark.createDataFrame([(k, 7) for k in range(100, 105)], "k long, val long")
    )
    calls = []
    orig = ManagedTable.read_pruned

    def spy(self, col, lo=None, hi=None, version=None):
        calls.append((self.path, col, lo, hi))
        return orig(self, col, lo, hi, version=version)

    with mock.patch.object(ManagedTable, "read_pruned", spy):
        mv.refresh()
    assert any(
        p.endswith("/dim") and c == "k" and lo == 100 and hi == 104
        for p, c, lo, hi in calls
    ), calls
    kept, total = right.prune_files("k", 100, 104)
    assert total == 16 and len(kept) <= 2, "delta range did not prune dim files"

    got = mv.read().drop("avg_val")
    want = mv._aggregate(left.read().join(right.read(), on=["k"]))
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


# --- min/max with dirty-group recompute -------------------------------------


@pytest.fixture()
def minmax_view(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="dlp_mvmm_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    base = ManagedTable(spark, f"{d}/orders_base")
    base.create(orders)
    mv = MaterializedAggView(
        base, f"{d}/mv",
        group_cols=["o_orderstatus"], sum_cols=["price_cents"],
        minmax_cols=["price_cents"],
    )
    mv.create()
    return base, mv


def _dirty_groups(mv):
    return mv.state.history(1)[0]["operationMetrics"].get("numDirtyGroups")


def test_minmax_insert_only_refresh_recomputes_nothing(minmax_view):
    """Insert extrema fold in monotonically: zero dirty groups even
    when an insert BEATS the current min."""
    base, mv = minmax_view
    lo = base.read().agg(F.min("price_cents")).first()[0]
    base.append(
        base.read().limit(1).select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_orderstatus",
            F.lit(lo - 1).cast("long").alias("price_cents"),
        )
    )
    mv.refresh()
    assert _dirty_groups(mv) == 0
    _assert_view_exact(mv)
    assert (
        mv.read().agg(F.min("min_price_cents")).first()[0] == lo - 1
    )


def test_minmax_delete_missing_extremum_recomputes_nothing(minmax_view):
    """A delete strictly inside the (min, max) envelope cannot move
    either extremum — the refresh must not touch the base."""
    base, mv = minmax_view
    st = mv.read().orderBy("o_orderstatus").first()
    victim = (
        base.read()
        .filter(
            (F.col("o_orderstatus") == st.o_orderstatus)
            & (F.col("price_cents") > st.min_price_cents)
            & (F.col("price_cents") < st.max_price_cents)
        )
        .first()
    )
    base.delete(f"o_orderkey = {victim.o_orderkey}", rewrite=False)
    mv.refresh()
    assert _dirty_groups(mv) == 0
    _assert_view_exact(mv)


def test_minmax_delete_of_extremum_dirties_only_that_group(minmax_view):
    base, mv = minmax_view
    st = mv.read().orderBy("o_orderstatus").first()
    victim = (
        base.read()
        .filter(
            (F.col("o_orderstatus") == st.o_orderstatus)
            & (F.col("price_cents") == st.min_price_cents)
        )
        .first()
    )
    base.delete(f"o_orderkey = {victim.o_orderkey}", rewrite=False)
    mv.refresh()
    assert _dirty_groups(mv) == 1
    _assert_view_exact(mv)
    # The recomputed min is exact (a tie may keep it equal, never lower).
    new_min = (
        mv.read()
        .filter(F.col("o_orderstatus") == st.o_orderstatus)
        .first()
        .min_price_cents
    )
    assert new_min >= st.min_price_cents


def test_minmax_mixed_churn_matches_full_recompute(minmax_view):
    base, mv = minmax_view
    base.append(
        base.read()
        .filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    )
    base.delete("o_orderkey % 7 = 0", rewrite=False)
    mv.refresh()
    _assert_view_exact(mv)
    # And a second round on the refreshed state.
    base.delete("o_orderkey % 5 = 1", rewrite=False)
    mv.refresh()
    _assert_view_exact(mv)


@pytest.fixture()
def join_minmax_view(spark, sf_dir):
    from delta_lake_platform_spark.sources.materialized_view import (
        MaterializedJoinAggView,
    )

    d = tempfile.mkdtemp(prefix="dlp_mvjmm_")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    left = ManagedTable(spark, f"{d}/orders")
    left.create(orders)
    right = ManagedTable(spark, f"{d}/cust")
    right.create(cust)
    mv = MaterializedJoinAggView(
        left, right, f"{d}/mv",
        on=["custkey"], group_cols=["segment"], sum_cols=["price_cents"],
        minmax_cols=["price_cents"],
    )
    mv.create()
    return left, right, mv


def test_join_view_minmax_insert_only_recomputes_nothing(join_minmax_view):
    left, right, mv = join_minmax_view
    lo = (
        left.read()
        .join(right.read(), on=["custkey"])
        .agg(F.min("price_cents"))
        .first()[0]
    )
    joined_key = right.read().select("custkey").first()[0]
    left.append(
        left.read()
        .limit(1)
        .select(
            F.lit(joined_key).alias("custkey"),
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            F.lit(lo - 5).cast("long").alias("price_cents"),
        )
    )
    mv.refresh()
    m = mv.state.history(1)[0]["operationMetrics"]
    assert m["numDirtyGroups"] == 0
    _assert_join_view_exact(mv)
    assert mv.read().agg(F.min("min_price_cents")).first()[0] == lo - 5


def test_join_view_minmax_extremum_delete_and_group_move(join_minmax_view):
    """A delete of a group's minimum order dirties that group; a
    customer changing segment MOVES all its joined rows (delete+insert
    pairs) — the source group's extremum may leave, the target group
    folds the rows in. Final state must equal a full recompute."""
    left, right, mv = join_minmax_view
    st = mv.read().orderBy("segment").first()
    victim = (
        left.read()
        .join(right.read().filter(F.col("segment") == st.segment), on=["custkey"])
        .filter(F.col("price_cents") == st.min_price_cents)
        .first()
    )
    left.delete(f"o_orderkey = {victim.o_orderkey}", rewrite=False)
    right.update(
        {"segment": "'MOVED'"}, f"custkey % 10 = 0", rewrite=False
    )
    mv.refresh()
    m = mv.state.history(1)[0]["operationMetrics"]
    assert m["numDirtyGroups"] >= 1
    _assert_join_view_exact(mv)
    # Second round on the refreshed state.
    left.delete("o_orderkey % 11 = 0", rewrite=False)
    mv.refresh()
    _assert_join_view_exact(mv)
