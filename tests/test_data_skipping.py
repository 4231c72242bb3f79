"""File-level data skipping on ManagedTable (Delta min/max stats
analogue): commits record per-file column ranges from the parquet
footers, and range reads open only the files the predicate can touch."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.catalog import load_table
from delta_lake_platform_spark.sources.managed_table import ManagedTable


def _range_layout_table(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="dlp_skip_")
    cust = load_table(spark, sf_dir, "customer").repartitionByRange(
        8, "c_custkey"
    )
    t = ManagedTable(spark, f"{d}/customer_ranged")
    t.create(cust)
    return t


def test_commit_records_file_stats(spark, sf_dir):
    t = _range_layout_table(spark, sf_dir)
    stats = t.history(1)[0]["fileStats"]
    assert len(stats) >= 2  # range layout -> multiple files
    for cols in stats.values():
        assert "c_custkey" in cols
        mn, mx = cols["c_custkey"]
        assert mn <= mx


def test_range_read_prunes_files(spark, sf_dir):
    t = _range_layout_table(spark, sf_dir)
    full = t.read()
    n_total = full.count()
    lo = 1
    hi = max(n_total // 8, 2)  # a slice that lives in ~1 of 8 range files
    kept, total = t.prune_files("c_custkey", lo, hi)
    assert total >= 2
    assert len(kept) < total  # skipping actually skipped files

    pruned = t.read_pruned("c_custkey", lo, hi)
    expected = full.filter(
        (F.col("c_custkey") >= lo) & (F.col("c_custkey") <= hi)
    )
    assert pruned.exceptAll(expected).isEmpty()
    assert expected.exceptAll(pruned).isEmpty()
    assert pruned.count() == expected.count() > 0


def test_pruning_on_non_layout_column_stays_correct(spark, sf_dir):
    t = _range_layout_table(spark, sf_dir)
    # Layout is by c_custkey, so c_nationkey ranges straddle the files:
    # skipping rarely fires, but whatever it keeps must be exact.
    got = t.read_pruned("c_nationkey", 3, 3).count()
    want = t.read().filter(F.col("c_nationkey") == 3).count()
    assert got == want > 0

    kept, total = t.prune_files("c_nationkey", -5, -1)  # below domain
    assert kept == []
    assert total >= 2


def test_empty_range_reads_zero_rows(spark, sf_dir):
    t = _range_layout_table(spark, sf_dir)
    kept, _ = t.prune_files("c_custkey", 10**12, None)
    assert kept == []
    assert t.read_pruned("c_custkey", 10**12, None).count() == 0


def test_optimize_zorder_enables_multi_column_skipping(spark, sf_dir):
    """After OPTIMIZE ZORDER BY (o_custkey, o_orderkey), a narrow range
    on EITHER column must skip most files — single-column sort layouts
    only ever prune on their one sort key."""
    import tempfile

    d = tempfile.mkdtemp(prefix="dlp_zorder_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = ManagedTable(spark, f"{d}/orders_z")
    t.create(orders.repartition(8))  # hash layout: no column clusters
    bounds = orders.agg(
        F.max("o_orderkey").alias("mk"), F.max("o_custkey").alias("mc")
    ).first()

    v_before = t.latest_version()
    t.optimize_zorder(["o_custkey", "o_orderkey"], n_files=8)

    for col, mx in (("o_custkey", bounds["mc"]), ("o_orderkey", bounds["mk"])):
        lo, hi = 1, max(mx // 8, 2)
        kept_before, total_b = t.prune_files(col, lo, hi, version=v_before)
        kept_after, total_a = t.prune_files(col, lo, hi)
        assert len(kept_before) == total_b  # hash layout: nothing skipped
        assert len(kept_after) <= total_a // 2, (col, len(kept_after), total_a)
        got = t.read_pruned(col, lo, hi)
        want = t.read().filter(F.col(col).between(lo, hi))
        assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()

    # Same rows, different layout; old version still readable.
    assert t.read().count() == t.read(v_before).count()


def test_multi_column_prune_intersects_ranges(spark):
    """prune_files_multi keeps only files surviving EVERY column's
    range prune — strictly tighter than any single column (r4 VERDICT
    #7: composite-key MV delta pruning)."""
    d = tempfile.mkdtemp(prefix="dlp_multi_")
    # a ascending, b descending: a file that can hold a≈10 holds b≈990.
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(1000)
        .select(F.col("id").alias("a"), (999 - F.col("id")).alias("b"))
        .repartitionByRange(8, "a")
    )
    kept_a, total = t.prune_files("a", 10, 12)
    kept_multi, _ = t.prune_files_multi({"a": (10, 12), "b": (10, 12)})
    assert total == 8 and len(kept_a) >= 1
    assert len(kept_multi) < len(kept_a)  # the intersection is empty
    got = t.read_pruned_multi({"a": (10, 12), "b": (10, 12)})
    assert got.count() == 0
    # A satisfiable conjunction returns exactly the filtered rows.
    got2 = t.read_pruned_multi({"a": (10, 12), "b": (987, 989)})
    assert sorted(r.a for r in got2.collect()) == [10, 11, 12]


def test_multi_prune_consults_bloom_values(spark):
    """With a bloom index present and a complete probe-value set,
    prune_files_multi drops range-surviving files whose bloom rules
    out every value; unindexed columns stay conservative."""
    d = tempfile.mkdtemp(prefix="dlp_multibloom_")
    t = ManagedTable(spark, f"{d}/t")
    # Interleaved ids: every file's [min,max] spans any probe, so range
    # pruning keeps all files and only the bloom can discriminate.
    t.create(
        spark.range(4000)
        .select((F.col("id") % 8).alias("bucket"), F.col("id").alias("k"))
        .repartition(8, "bucket")
        .drop("bucket")
    )
    t.build_bloom_index(["k"])
    probe = [17]
    kept_range, total = t.prune_files("k", min(probe), max(probe))
    kept_multi, _ = t.prune_files_multi(
        {"k": (min(probe), max(probe))}, eq_values={"k": probe}
    )
    assert len(kept_multi) <= len(kept_range)
    assert len(kept_multi) >= 1  # never a false negative
    got = t.read_pruned_multi(
        {"k": (min(probe), max(probe))}, eq_values={"k": probe}
    )
    assert [r.k for r in got.collect()] == [17]
