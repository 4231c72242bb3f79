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
    orig = ManagedTable.read_pruned_multi

    def spy(self, ranges, eq_values=None, version=None):
        calls.append((self.path, dict(ranges)))
        return orig(self, ranges, eq_values, version=version)

    with mock.patch.object(ManagedTable, "read_pruned_multi", spy):
        mv.refresh()
    assert any(
        p.endswith("/dim") and ranges.get("k") == (100, 104)
        for p, ranges in calls
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


# --- NULL group keys (r4 VERDICT #1) -----------------------------------------
#
# groupBy treats NULL as a group of its own; every refresh-side join
# must therefore match NULL keys null-safely or the NULL group splits
# into duplicate state rows / gets NULL extrema. These tests pin
# refresh == full recompute with NULLs present on both tiers.


def _assert_val_view_exact(mv):
    got, want = mv.read().drop("avg_val"), _recompute(mv)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def _null_base(spark, d):
    rows = [
        (1, "A", 10),
        (2, "A", 20),
        (3, None, 5),
        (4, None, 50),
        (5, None, 30),
        (6, "B", 7),
    ]
    base = ManagedTable(spark, f"{d}/base")
    base.create(
        spark.createDataFrame(rows, "id long, grp string, val long")
    )
    return base


def test_null_group_key_insert_refresh(spark):
    d = tempfile.mkdtemp(prefix="dlp_mvnull_")
    base = _null_base(spark, d)
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["grp"], sum_cols=["val"],
        minmax_cols=["val"],
    )
    mv.create()
    base.append(
        spark.createDataFrame([(7, None, 100), (8, "A", 1)],
                              "id long, grp string, val long")
    )
    mv.refresh()
    _assert_val_view_exact(mv)
    # Exactly ONE state row for the NULL group — no duplicate split.
    assert mv.read().filter(F.col("grp").isNull()).count() == 1
    row = mv.read().filter(F.col("grp").isNull()).first()
    assert row.n_rows == 4 and row.max_val == 100 and row.min_val == 5


def test_null_group_key_extremum_delete(spark):
    """Deleting the NULL group's max dirties it; the recompute join
    must reach the NULL group (null-safe semi-join) — a dropped group
    would come back with NULL extrema."""
    d = tempfile.mkdtemp(prefix="dlp_mvnull_")
    base = _null_base(spark, d)
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["grp"], sum_cols=["val"],
        minmax_cols=["val"],
    )
    mv.create()
    base.delete("grp IS NULL AND val = 50", rewrite=False)
    mv.refresh()
    assert _dirty_groups(mv) == 1
    _assert_val_view_exact(mv)
    row = mv.read().filter(F.col("grp").isNull()).first()
    assert row.min_val == 5 and row.max_val == 30 and row.n_rows == 2


def test_null_group_key_extremum_delete_semijoin_path(spark):
    """Same NULL-group extremum delete, with the literal recompute
    disabled — pins the null-safe SEMI-JOIN recompute path, which the
    default config no longer exercises for small dirty sets."""
    d = tempfile.mkdtemp(prefix="dlp_mvnull_")
    base = _null_base(spark, d)
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["grp"], sum_cols=["val"],
        minmax_cols=["val"], literal_dirty_max=0,
    )
    mv.create()
    base.delete("grp IS NULL AND val = 50", rewrite=False)
    mv.refresh()
    assert _dirty_groups(mv) == 1
    _assert_val_view_exact(mv)
    row = mv.read().filter(F.col("grp").isNull()).first()
    assert row.min_val == 5 and row.max_val == 30 and row.n_rows == 2


def test_literal_recompute_plan_has_no_join_and_prunes(spark):
    """The small-dirty-set recompute is a literal-predicate scan: no
    join anywhere in its plan, and the base read is file-pruned by the
    dirty keys' range — the property that keeps a one-group refresh
    O(files containing that group) at any table size."""
    d = tempfile.mkdtemp(prefix="dlp_mvlit_")
    base = ManagedTable(spark, f"{d}/base")
    # Range layout on grp: each file covers a narrow grp range, so a
    # single dirty group prunes to a strict subset of files.
    base.create(
        spark.range(400)
        .select(
            (F.col("id") % 20).alias("grp"),
            (F.col("id") * 3).alias("val"),
        )
        .repartitionByRange(4, "grp")
    )
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["grp"], sum_cols=["val"],
        minmax_cols=["val"],
    )
    mv.create()
    top = base.read().filter("grp = 2").agg(F.max("val")).first()[0]
    base.delete(f"grp = 2 AND val = {top}", rewrite=False)
    rows = [{"grp": 2}]
    plan = (
        mv._recompute_dirty_literal(base.latest_version(), rows)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
        .lower()
    )
    # No key join: the only join allowed is the DV anti-join a MOR
    # read always carries; membership is a literal predicate.
    assert "leftsemi" not in plan and "broadcasthint" not in plan
    kept, total = base.prune_files_multi({"grp": (2, 2)})
    assert total == 4 and len(kept) < total
    mv.refresh()
    got, want = mv.read().drop("avg_val"), mv._aggregate(base.read())
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_null_group_key_group_vanishes_and_returns(spark):
    d = tempfile.mkdtemp(prefix="dlp_mvnull_")
    base = _null_base(spark, d)
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["grp"], sum_cols=["val"],
        minmax_cols=["val"],
    )
    mv.create()
    base.delete("grp IS NULL", rewrite=False)
    mv.refresh()
    _assert_val_view_exact(mv)
    assert mv.read().filter(F.col("grp").isNull()).count() == 0
    base.append(
        spark.createDataFrame([(9, None, 42)], "id long, grp string, val long")
    )
    mv.refresh()
    _assert_val_view_exact(mv)
    row = mv.read().filter(F.col("grp").isNull()).first()
    assert row.n_rows == 1 and row.min_val == 42 and row.max_val == 42


def test_null_group_key_join_view_group_move(spark):
    """Join-tier NULL keys: a dimension update moving rows INTO and a
    delete removing the extremum OF the NULL group must both land on a
    single null-keyed state row equal to a full recompute."""
    from delta_lake_platform_spark.sources.materialized_view import (
        MaterializedJoinAggView,
    )

    d = tempfile.mkdtemp(prefix="dlp_mvjnull_")
    left = ManagedTable(spark, f"{d}/fact")
    left.create(
        spark.createDataFrame(
            [(1, 100, 10), (2, 100, 20), (3, 200, 30), (4, 300, 40)],
            "id long, k long, val long",
        )
    )
    right = ManagedTable(spark, f"{d}/dim")
    right.create(
        spark.createDataFrame(
            [(100, None), (200, "X"), (300, None)], "k long, grp string"
        )
    )
    mv = MaterializedJoinAggView(
        left, right, f"{d}/mv", on=["k"], group_cols=["grp"],
        sum_cols=["val"], minmax_cols=["val"],
    )
    mv.create()
    _assert_join_view_exact_nullsafe(mv)
    # Move k=200 into the NULL group, delete the NULL group's max row.
    right.update({"grp": "NULL"}, "k = 200", rewrite=False)
    left.delete("id = 4", rewrite=False)
    mv.refresh()
    _assert_join_view_exact_nullsafe(mv)
    assert mv.read().filter(F.col("grp").isNull()).count() == 1
    row = mv.read().filter(F.col("grp").isNull()).first()
    assert row.n_rows == 3 and row.min_val == 10 and row.max_val == 30


def test_null_group_key_join_view_semijoin_path(spark):
    """Join-tier twin with the literal recompute disabled — pins the
    null-safe SEMI-JOIN restrict path the default config no longer
    exercises for small dirty sets."""
    from delta_lake_platform_spark.sources.materialized_view import (
        MaterializedJoinAggView,
    )

    d = tempfile.mkdtemp(prefix="dlp_mvjnull_")
    left = ManagedTable(spark, f"{d}/fact")
    left.create(
        spark.createDataFrame(
            [(1, 100, 10), (2, 100, 20), (3, 200, 30), (4, 300, 40)],
            "id long, k long, val long",
        )
    )
    right = ManagedTable(spark, f"{d}/dim")
    right.create(
        spark.createDataFrame(
            [(100, None), (200, "X"), (300, None)], "k long, grp string"
        )
    )
    mv = MaterializedJoinAggView(
        left, right, f"{d}/mv", on=["k"], group_cols=["grp"],
        sum_cols=["val"], minmax_cols=["val"], literal_dirty_max=0,
    )
    mv.create()
    right.update({"grp": "NULL"}, "k = 200", rewrite=False)
    left.delete("id = 4", rewrite=False)
    mv.refresh()
    _assert_join_view_exact_nullsafe(mv)
    row = mv.read().filter(F.col("grp").isNull()).first()
    assert row.n_rows == 3 and row.min_val == 10 and row.max_val == 30


def test_join_view_literal_recompute_prunes_dim(spark):
    """Join-tier literal recompute: the dimension side (the base that
    carries the group column) is file-pruned by the dirty keys — a
    one-group refresh reads the dim files that can contain that group,
    not the dim table."""
    from delta_lake_platform_spark.sources.materialized_view import (
        MaterializedJoinAggView,
    )

    d = tempfile.mkdtemp(prefix="dlp_mvjlit_")
    left = ManagedTable(spark, f"{d}/fact")
    left.create(
        spark.range(200).select(
            F.col("id"),
            (F.col("id") % 40).alias("k"),
            (F.col("id") * 3).alias("val"),
        )
    )
    right = ManagedTable(spark, f"{d}/dim")
    right.create(
        spark.range(40)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("g"), (F.col("id") % 8).cast("string")).alias(
                "grp"
            ),
        )
        .repartitionByRange(4, "grp")
    )
    mv = MaterializedJoinAggView(
        left, right, f"{d}/mv", on=["k"], group_cols=["grp"],
        sum_cols=["val"], minmax_cols=["val"],
    )
    mv.create()
    # Delete the max-val fact row of one group to dirty exactly it.
    top = (
        left.read()
        .join(right.read().filter("grp = 'g3'"), on=["k"])
        .agg(F.max("val"))
        .first()[0]
    )
    left.delete(f"val = {top}", rewrite=False)
    plan = (
        mv._recompute_dirty_literal(
            left.latest_version(), right.latest_version(), [{"grp": "g3"}]
        )
        ._jdf.queryExecution()
        .analyzed()
        .toString()
        .lower()
    )
    assert "leftsemi" not in plan  # no key semi-join on the dim side
    kept, total = right.prune_files_multi({"grp": ("g3", "g3")})
    assert total == 4 and len(kept) < total
    mv.refresh()
    want = mv._aggregate(left.read().join(right.read(), on=["k"]))
    got = mv.read().drop("avg_val")
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def _assert_join_view_exact_nullsafe(mv):
    got = mv.read().drop("avg_val")
    want = mv._aggregate(mv.left.read().join(mv.right.read(), on=mv.on))
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


# --- dirty-group recompute past the broadcast threshold (r4 VERDICT #8) ------


def test_dirty_recompute_past_broadcast_threshold(spark):
    """With more dirty groups than ``broadcast_dirty_max`` the
    recompute must drop the broadcast hint (shuffle semi-join) and
    still land exactly on the full recompute."""
    d = tempfile.mkdtemp(prefix="dlp_mvthr_")
    base = ManagedTable(spark, f"{d}/base")
    # 50 groups; each group's minimum is val = grp (deleted below).
    base.create(
        spark.range(500).select(
            (F.col("id") % 50).alias("grp"),
            (F.col("id") % 50 + (F.col("id") / 50).cast("long") * 100).alias(
                "val"
            ),
        )
    )
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["grp"], sum_cols=["val"],
        minmax_cols=["val"], broadcast_dirty_max=10,
        literal_dirty_max=0,  # force the semi-join path this test pins
    )
    mv.create()
    base.delete("val < 50", rewrite=False)  # every group loses its min
    mv.refresh()
    assert _dirty_groups(mv) == 50
    got, want = mv.read().drop("avg_val"), mv._aggregate(base.read())
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_dirty_recompute_hint_presence_tracks_threshold(spark):
    """The broadcast hint is present under the threshold and absent
    above it (the hint, not AQE's final choice, is what we control)."""
    d = tempfile.mkdtemp(prefix="dlp_mvhint_")
    base = ManagedTable(spark, f"{d}/base")
    base.create(
        spark.range(100).select(
            (F.col("id") % 10).alias("grp"), F.col("id").alias("val")
        )
    )
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["grp"], sum_cols=["val"],
        minmax_cols=["val"], broadcast_dirty_max=5,
    )
    mv.create()
    keys = base.read().select("grp").distinct()
    plan_small = mv._recompute_dirty(
        base.latest_version(), keys, n_dirty=3
    )._jdf.queryExecution().analyzed().toString()
    plan_big = mv._recompute_dirty(
        base.latest_version(), keys, n_dirty=50
    )._jdf.queryExecution().analyzed().toString()
    assert "broadcast" in plan_small.lower()
    assert "broadcast" not in plan_big.lower()


def test_pruned_base_probes_blooms_on_every_join_key(spark):
    """The delta-join base prune probes blooms on EVERY join key from
    one distinct-tuple job (r4 #7's remainder was first-key-only
    probing): the spy sees both keys' value sets, and the composite
    probe keeps strictly fewer files than the first key alone on an
    interleaved layout where only k2's bloom discriminates."""
    from delta_lake_platform_spark.sources.materialized_view import (
        MaterializedJoinAggView,
    )

    d = tempfile.mkdtemp(prefix="dlp_mvbloom2_")
    left = ManagedTable(spark, f"{d}/fact")
    left.create(
        spark.range(40).select(
            (F.col("id") % 3).alias("k1"),
            F.col("id").alias("k2"),
            F.lit(1).alias("val"),
        )
    )
    right = ManagedTable(spark, f"{d}/dim")
    # k1 interleaves identically across every file (range prune and k1
    # bloom keep everything); k2 values are file-disjoint mod buckets.
    right.create(
        spark.range(4000)
        .select(
            # id%3 cycles WITHIN every id%8 bucket, so k1 interleaves
            # across all files and neither range nor bloom prunes it.
            (F.col("id") % 3).alias("k1"),
            F.col("id").alias("k2"),
            (F.col("id") % 8).alias("bucket"),
            F.lit("g").alias("grp"),
        )
        .repartition(8, "bucket")
        .drop("bucket")
    )
    right.build_bloom_index(["k1", "k2"])
    mv = MaterializedJoinAggView(
        left, right, f"{d}/mv", on=["k1", "k2"], group_cols=["grp"],
        sum_cols=["val"],
    )
    delta = spark.createDataFrame([(1, 16, 1)], "k1 long, k2 long, w int")

    captured = {}
    orig = right.read_pruned_multi

    def spy(ranges, eq_values=None, version=None):
        captured["ranges"] = ranges
        captured["eq"] = eq_values
        return orig(ranges, eq_values, version=version)

    right.read_pruned_multi = spy
    out = mv._pruned_base(right, right.latest_version(), delta)
    assert out is not None
    assert set(captured["ranges"]) == {"k1", "k2"}
    assert captured["eq"] is not None and set(captured["eq"]) == {"k1", "k2"}

    # Functional: k2's bloom prunes where k1 alone cannot.
    v = right.latest_version()
    kept_k1, total = right.prune_files_multi(
        {"k1": (1, 1)}, eq_values={"k1": [1]}, version=v
    )
    kept_both, _ = right.prune_files_multi(
        {"k1": (1, 1), "k2": (16, 16)},
        eq_values={"k1": [1], "k2": [16]},
        version=v,
    )
    assert total >= 2 and len(kept_k1) == total  # k1 discriminates nothing
    assert len(kept_both) < len(kept_k1)
    assert [r.k2 for r in out.collect()] == [16]


# --- refresh_from_changes exactly-once on misaligned windows ------------------

@pytest.fixture()
def small_base_and_view(spark):
    d = tempfile.mkdtemp(prefix="dlp_mv_straddle_")
    base = ManagedTable(spark, f"{d}/base")
    base.create(spark.createDataFrame(
        [("a", 10), ("b", 20)], "g string, x long"))        # v0
    base.append(spark.createDataFrame([("a", 5)], "g string, x long"))   # v1
    base.append(spark.createDataFrame([("b", 7)], "g string, x long"))   # v2
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["g"], sum_cols=["x"])
    return base, mv


def test_refresh_from_changes_straddling_batch_trims(small_base_and_view):
    """A multi-commit batch whose window STRADDLES the view's recorded
    base (from_v < base < to_v — a stale/foreign checkpoint with
    max_versions_per_batch > 1) must fold only the unapplied commits.
    Pre-fix, the whole batch was folded, double-applying commit 1."""
    base, mv = small_base_and_view
    # View created at v0, then folded exactly commit 1 -> baseVersion 1.
    hist = base.latest_version()
    mv_state_at_v0 = mv._aggregate(base.read(0))
    mv.state._commit(mv_state_at_v0, "MV_CREATE", {"baseVersion": 0})
    feed1 = base.table_changes_per_commit(1, 1)
    mv.refresh_from_changes(feed1, 1, from_version=0)
    assert mv._base_version() == 1

    # Replayed straddling window (0, 2]: commit 1 already folded.
    feed02 = base.table_changes_per_commit(1, 2)
    mv.refresh_from_changes(feed02, 2, from_version=0)
    assert mv._base_version() == 2
    got = {(r.g, r.sum_x) for r in mv.read().select("g", "sum_x").collect()}
    want = {
        (r.g, r.sum_x)
        for r in mv._aggregate(base.read(hist))
        .select("g", "sum_x").collect()
    }
    assert got == want, (got, want)


def test_refresh_from_changes_rejects_gap(small_base_and_view):
    """A batch claiming to start BEYOND the recorded base would skip
    commits — reject instead of silently corrupting the view."""
    base, mv = small_base_and_view
    mv.state._commit(
        mv._aggregate(base.read(0)), "MV_CREATE", {"baseVersion": 0})
    feed = base.table_changes_per_commit(2, 2)
    with pytest.raises(ValueError, match="would be skipped"):
        mv.refresh_from_changes(feed, 2, from_version=1)


def test_refresh_from_changes_straddle_without_versions_rejected(
    small_base_and_view,
):
    """A straddling batch whose rows carry no _commit_version cannot
    be trimmed — reject rather than double-apply."""
    base, mv = small_base_and_view
    mv.state._commit(
        mv._aggregate(base.read(1)), "MV_CREATE", {"baseVersion": 1})
    feed = base.table_changes_per_commit(1, 2).drop("_commit_version")
    with pytest.raises(ValueError, match="straddling"):
        mv.refresh_from_changes(feed, 2, from_version=0)


def test_refresh_from_changes_replay_still_skipped(small_base_and_view):
    """The original exactly-once guard is unchanged: a batch wholly at
    or behind the recorded base is a no-op without a commit."""
    base, mv = small_base_and_view
    mv.state._commit(
        mv._aggregate(base.read(2)), "MV_CREATE", {"baseVersion": 2})
    v_before = mv.state.latest_version()
    feed = base.table_changes_per_commit(1, 2)
    mv.refresh_from_changes(feed, 2, from_version=0)
    assert mv.state.latest_version() == v_before


def test_refresh_from_changes_net_straddle_rejected(small_base_and_view):
    """A NET batch (constant window-end _commit_version stamp) whose
    window straddles the base cannot be trimmed row-wise — it must be
    rejected, not silently double-applied."""
    base, mv = small_base_and_view
    mv.state._commit(
        mv._aggregate(base.read(1)), "MV_CREATE", {"baseVersion": 1})
    from pyspark.sql import functions as F

    net = base.change_feed(0, 2).withColumn(
        "_commit_version", F.lit(2).cast("long"))
    with pytest.raises(ValueError, match="NET batch"):
        mv.refresh_from_changes(net, 2, from_version=0)


def test_refresh_from_changes_straddle_over_nochange_commits_folds(spark):
    """A per-commit straddling feed whose pre-base window holds ONLY
    no-change commits (OPTIMIZE) legitimately has zero rows at or
    below the base — the guard must consult the log and fold, not
    misread the silence as a NET batch and wedge the stream."""
    d = tempfile.mkdtemp(prefix="dlp_mv_nochange_")
    base = ManagedTable(spark, f"{d}/base")
    base.create(spark.createDataFrame(
        [("a", 10), ("b", 20)], "g string, x long"))                 # v0
    base.append(spark.createDataFrame([("a", 5)], "g string, x long"))  # v1
    base.compact(target_partitions=1)                                 # v2 OPTIMIZE
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["g"], sum_cols=["x"])
    mv.state._commit(
        mv._aggregate(base.read(2)), "MV_CREATE", {"baseVersion": 2})
    base.append(spark.createDataFrame([("b", 7)], "g string, x long"))  # v3
    # Stale checkpoint: per-commit window (1, 3] — commits 2 (OPTIMIZE,
    # zero rows) and 3 (append). min(_commit_version)=3 > base=2, but
    # the pre-base window [2, 2] is provably no-change.
    feed = base.table_changes_per_commit(2, 3)
    mv.refresh_from_changes(feed, 3, from_version=1)
    assert mv._base_version() == 3
    got = {(r.g, r.sum_x) for r in mv.read().select("g", "sum_x").collect()}
    want = {(r.g, r.sum_x)
            for r in mv._aggregate(base.read(3)).select("g", "sum_x").collect()}
    assert got == want, (got, want)


# --- approx-distinct (HLL sketch) maintenance ---------------------------------

@pytest.fixture()
def hll_view(spark):
    d = tempfile.mkdtemp(prefix="dlp_mv_hll_")
    base = ManagedTable(spark, f"{d}/base")
    rows = [("a", i % 7, i) for i in range(40)] + [
        ("b", i % 11, i + 100) for i in range(40)
    ]
    base.create(spark.createDataFrame(rows, "g string, u long, id long"))
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["g"], sum_cols=["id"],
        approx_distinct_cols=["u"], hll_lg_k=20,   # exact regime
    )
    mv.create()
    return base, mv


def _distinct_exact(mv):
    return {
        (r.g, r.approx_distinct_u)
        for r in mv.read().select("g", "approx_distinct_u").collect()
    }


def _want(base, mv):
    got = (
        base.read()
        .groupBy("g")
        .agg(F.countDistinct("u").alias("n"))
        .collect()
    )
    return {(r.g, r.n) for r in got}


def test_hll_view_create_and_insert_only_fold(hll_view):
    """Inserts fold monotonically through sketch union: zero dirty
    groups, estimates stay exact (lg_k=20 set-mode)."""
    base, mv = hll_view
    assert _distinct_exact(mv) == _want(base, mv)
    base.append(base.spark.createDataFrame(
        [("a", 99, 1000), ("b", 5, 1001), ("c", 1, 1002)],
        "g string, u long, id long",
    ))
    mv.refresh()
    assert _distinct_exact(mv) == _want(base, mv)
    assert mv.state.history(1)[0]["operationMetrics"]["numDirtyGroups"] == 0


def test_hll_view_delete_dirties_and_recomputes(hll_view):
    """A delete dirties only the touched groups (a sketch cannot
    subtract) and the recompute restores exactness — including the
    value-still-present-elsewhere case (u=3 appears at several ids in
    group 'a'; deleting one row must NOT drop u=3 from the count)."""
    base, mv = hll_view
    base.delete("g = 'a' AND id = 3")        # u=3 survives at id 10, 17...
    mv.refresh()
    m = mv.state.history(1)[0]["operationMetrics"]
    assert m["numDirtyGroups"] == 1
    assert _distinct_exact(mv) == _want(base, mv)
    # Remove EVERY row of u=6 in group 'b' -> distinct count drops.
    base.delete("g = 'b' AND u = 6")
    mv.refresh()
    assert _distinct_exact(mv) == _want(base, mv)


def test_hll_view_update_via_merge_stays_exact(hll_view):
    base, mv = hll_view
    base.update({"u": "u + 50"}, "g = 'a' AND u = 2")
    mv.refresh()
    assert _distinct_exact(mv) == _want(base, mv)


def test_hll_view_composes_with_minmax(spark):
    """approx-distinct + min/max + sums on one view: shared dirty
    machinery, one merge."""
    d = tempfile.mkdtemp(prefix="dlp_mv_hllmm_")
    base = ManagedTable(spark, f"{d}/base")
    base.create(spark.createDataFrame(
        [("x", i % 5, i) for i in range(30)], "g string, u long, v long"))
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["g"], sum_cols=["v"],
        minmax_cols=["v"], approx_distinct_cols=["u"], hll_lg_k=20,
    )
    mv.create()
    base.delete("v = 29")   # deletes the max AND a u value
    base.append(spark.createDataFrame(
        [("x", 9, 99)], "g string, u long, v long"))
    mv.refresh()
    row = mv.read().first()
    want = base.read().groupBy("g").agg(
        F.countDistinct("u").alias("n"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.sum("v").alias("s"),
    ).first()
    assert (row.approx_distinct_u, row.min_v, row.max_v, row.sum_v) == (
        want.n, want.lo, want.hi, want.s)
