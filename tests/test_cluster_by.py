"""Liquid-clustering-style CLUSTER BY: a declared clustering spec
(`clusterBy` table property) that OPTIMIZE honors — the maintenance
command rewrites into Z-ordered files covering compact
hyper-rectangles of the declared columns, so footer-stats pruning
turns selective on EVERY clustered column, not just a sort prefix.
Delta's CLUSTER BY contract re-expressed over the existing z-order +
stats-pruning machinery."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.sql import PlatformSQL


def _mk(spark, n=4000):
    d = tempfile.mkdtemp(prefix="clusterby_")
    t = ManagedTable(spark, f"{d}/t")
    # Two independent uniform dimensions, shuffled so pre-cluster
    # files span both full domains (no accidental pruning).
    df = (
        spark.range(n)
        .select(
            (F.hash("id") % 1000).alias("x"),
            (F.hash(F.col("id") + 7) % 1000).alias("y"),
            F.col("id").alias("payload"),
        )
        .repartition(8)
    )
    t.create(df)
    return t


def test_optimize_clusters_and_prunes_both_dimensions(spark):
    t = _mk(spark)
    t.set_cluster_by(["x", "y"])
    assert t.cluster_by() == ["x", "y"]
    before = t.read().orderBy("payload").collect()
    v = t.compact()  # OPTIMIZE on a clustered table clusters
    assert t.history(1)[0]["operation"] == "OPTIMIZE_ZORDER"
    assert t.read().orderBy("payload").collect() == before
    # Narrow slices on EACH dimension now skip most files.
    for col in ("x", "y"):
        kept, total = t.prune_files(col, -1000, -900)
        assert total > 1
        assert len(kept) < total, f"no pruning on clustered column {col}"


def test_sql_create_alter_optimize_roundtrip(spark):
    d = tempfile.mkdtemp(prefix="clusterby_sql_")
    sql = PlatformSQL(spark)
    sql.sql(
        f"CREATE TABLE ct LOCATION '{d}/ct' CLUSTER BY (x) AS "
        "SELECT id % 100 AS x, id AS payload FROM range(1000)"
    )
    t = sql.tables["ct"]
    assert t.cluster_by() == ["x"]
    sql.sql("OPTIMIZE ct")
    assert t.history(1)[0]["operation"] == "OPTIMIZE_ZORDER"
    # NONE clears the spec; OPTIMIZE reverts to plain compaction.
    sql.sql("ALTER TABLE ct CLUSTER BY NONE")
    assert t.cluster_by() == []
    sql.sql("OPTIMIZE ct")
    assert t.history(1)[0]["operation"] == "OPTIMIZE"
    sql.sql("ALTER TABLE ct CLUSTER BY (x)")
    assert t.cluster_by() == ["x"]


def test_cluster_by_validation(spark):
    t = _mk(spark, n=100)
    with pytest.raises(ValueError, match="no such column"):
        t.set_cluster_by(["nope"])
    d = tempfile.mkdtemp(prefix="clusterby_str_")
    ts = ManagedTable(spark, f"{d}/t")
    ts.create(
        spark.range(5).select(
            F.col("id"),
            F.lit("a").alias("s"),
            F.array(F.lit(1)).alias("arr"),
        )
    )
    ts.set_cluster_by(["s"])  # strings cluster via the UTF-8 surrogate
    with pytest.raises(ValueError, match="orderable"):
        ts.set_cluster_by(["arr"])


def test_string_clustering_prunes(spark):
    """CLUSTER BY on a string column: the Z-order surrogate (first
    UTF-8 bytes) makes footer stats selective on string prefixes."""
    d = tempfile.mkdtemp(prefix="clusterby_strz_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(4000)
        .select(
            F.concat(
                F.lit("user_"),
                F.lpad((F.col("id") % 500).cast("string"), 4, "0"),
            ).alias("name"),
            F.col("id").alias("payload"),
        )
        .repartition(8)
    )
    t.set_cluster_by(["name"])
    before = t.read().orderBy("payload").collect()
    t.compact()
    assert t.read().orderBy("payload").collect() == before
    kept, total = t.prune_files("name", "user_0000", "user_0049")
    assert total > 1
    assert len(kept) < total, "no pruning on the clustered string column"


def test_clustering_preserves_row_ids(spark):
    t = _mk(spark, n=500)
    t.enable_row_tracking()
    ids = {
        r["payload"]: r["_row_id"] for r in t.read_row_ids().collect()
    }
    t.set_cluster_by(["x", "y"])
    t.compact()
    after = {
        r["payload"]: r["_row_id"] for r in t.read_row_ids().collect()
    }
    assert after == ids


def test_sql_optimize_full_reclusters(spark):
    """OPTIMIZE FULL: re-cluster EVERYTHING (bare OPTIMIZE on a
    clustered table is incremental — only small files join the
    layout)."""
    d = tempfile.mkdtemp(prefix="clusterby_full_")
    sql = PlatformSQL(spark)
    sql.sql(
        f"CREATE TABLE cf LOCATION '{d}/cf' CLUSTER BY (x) AS "
        "SELECT id % 100 AS x, id AS payload FROM range(2000)"
    )
    t = sql.tables["cf"]
    before = {r.payload for r in t.read().collect()}
    out = sql.sql("OPTIMIZE cf FULL")
    assert t.history(1)[0]["operation"] == "OPTIMIZE_ZORDER"
    assert {r.payload for r in t.read().collect()} == before
    import pytest as _pytest

    sql.sql("ALTER TABLE cf CLUSTER BY NONE")
    with _pytest.raises(ValueError, match="CLUSTER BY"):
        sql.sql("OPTIMIZE cf FULL")
