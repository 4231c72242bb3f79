"""Read-side dynamic file pruning for joins (relational.
dynamic_pruned_join): the dim key domain prunes fact FILES before the
join — range prune on footer stats, exact-key bloom probe when the
dim is small and a bloom index exists."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.operators.relational import dynamic_pruned_join
from delta_lake_platform_spark.sources.managed_table import ManagedTable


@pytest.fixture()
def fact(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "fact"))
    df = (
        spark.range(4000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 7 % 100).alias("payload"),
        )
        .repartitionByRange(4, "k")  # 4 files with disjoint k ranges
    )
    t.create(df)
    return t


def test_range_prunes_files_and_result_matches_plain_join(spark, fact):
    dim = spark.createDataFrame(
        [(10, "a"), (20, "b"), (30, "c")], "k long, name string"
    )
    kept, total = fact.prune_files_multi({"k": (10, 30)})
    assert total == 4 and len(kept) < total, "range should drop files"
    out = dynamic_pruned_join(fact, dim, "k").orderBy("k")
    plain = fact.read().join(dim, "k").orderBy("k")
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in plain.collect()
    ]


def test_bloom_probe_drops_straddling_files(spark, fact):
    """A dim key INSIDE a file's [min,max] range but absent from the
    data: the range prune keeps the file, the bloom probe drops it."""
    fact.delete("k = 500")  # 500 stays inside the file's range
    fact.build_bloom_index(["k"])
    dim = spark.createDataFrame([(500,)], "k long")
    range_kept, _ = fact.prune_files_multi({"k": (500, 500)})
    bloom_kept, _ = fact.prune_files_multi(
        {"k": (500, 500)}, eq_values={"k": [500]}
    )
    assert len(bloom_kept) < len(range_kept), (
        "bloom must out-prune the straddling range"
    )
    assert dynamic_pruned_join(fact, dim, "k").count() == 0


def test_semi_join_and_outer_refusal(spark, fact):
    dim = spark.createDataFrame([(1,), (2,)], "k long")
    semi = dynamic_pruned_join(fact, dim, "k", how="semi")
    assert semi.count() == 2
    with pytest.raises(ValueError, match="unmatched fact rows"):
        dynamic_pruned_join(fact, dim, "k", how="left")


def test_empty_dim_yields_empty_join(spark, fact):
    dim = spark.createDataFrame([], "k long, name string")
    assert dynamic_pruned_join(fact, dim, "k").count() == 0


def test_large_dim_skips_probe_but_still_range_prunes(spark, fact):
    dim = spark.range(50).select(F.col("id").alias("k"))
    out = dynamic_pruned_join(fact, dim, "k", max_probe_values=10)
    assert out.count() == 50  # correctness unaffected by skipping probe


def test_empty_dim_schema_matches_nonempty_path(spark, fact):
    """Review finding: the empty-dim branch must produce the SAME
    schema as the normal path (one merged key column), so downstream
    selects/aggregations never hit AMBIGUOUS_REFERENCE."""
    full = spark.createDataFrame([(10, "a")], "k long, name string")
    empty = full.filter(F.lit(False))
    out_full = dynamic_pruned_join(fact, full, "k")
    out_empty = dynamic_pruned_join(fact, empty, "k")
    assert out_empty.columns == out_full.columns
    assert out_empty.count() == 0
    # the regression shape: aggregating on the join key must not raise
    assert out_empty.groupBy("k").count().count() == 0
    semi_empty = dynamic_pruned_join(fact, empty, "k", how="semi")
    semi_full = dynamic_pruned_join(fact, full, "k", how="semi")
    assert semi_empty.columns == semi_full.columns
