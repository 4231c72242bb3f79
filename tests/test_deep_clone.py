"""DEEP CLONE: an independent copy of the snapshot — clean files are
byte-copied (stats, row-id spans, and materialized id columns carry
verbatim, zero Spark jobs), DV-bearing files are the only rewrites
(deletes materialized, clone starts vector-free), and table-local
metadata travels. Shallow-clone metadata carry (schema / column
mapping / protocol / stats) is pinned here too — a clone of a renamed
source must expose LOGICAL names.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable


def _mk(spark, prefix="deepclone_"):
    d = tempfile.mkdtemp(prefix=prefix)
    return d, ManagedTable(spark, os.path.join(d, "src"))


def test_deep_clone_is_independent(spark):
    d, t = _mk(spark)
    t.create(spark.range(100).selectExpr("id", "id * 2 AS v"))
    c = t.deep_clone(f"{d}/clone")
    assert c.read().count() == 100
    assert c.history(1)[0]["operation"] == "DEEP CLONE"
    # Independence: vaporize the source entirely; the clone still reads.
    import shutil

    shutil.rmtree(t.path)
    assert c.read().count() == 100
    # Stats carried verbatim: pruning works with zero footer reads.
    kept, total = c.prune_files("id", 0, 5)
    assert total > 1 and len(kept) < total


def test_deep_clone_materializes_dv(spark):
    d, t = _mk(spark)
    t.create(spark.range(100).selectExpr("id", "id * 2 AS v"))
    # spark.range splits contiguously: ids < 5 live in the first file
    # only, so later files stay DV-free (copied, not rewritten).
    t.delete("id < 5", rewrite=False)
    before = {r["id"] for r in t.read().collect()}
    c = t.deep_clone(f"{d}/clone")
    assert c._state(0)["dv"] is None  # starts vector-free
    assert {r["id"] for r in c.read().collect()} == before
    met = c._entry(0)["operationMetrics"]
    assert met["numRewrittenFiles"] >= 1
    assert met["numCopiedFiles"] >= 1  # clean files copied, not rewritten
    assert c.row_count(0) == len(before)


def test_deep_clone_partitioned_layout(spark):
    d, t = _mk(spark)
    t.create(
        spark.range(200).select("id", (F.col("id") % 4).alias("p")),
        partition_by=["p"],
    )
    c = t.deep_clone(f"{d}/clone")
    got = {r["p"]: r["n"] for r in c.read().groupBy("p").agg(F.count("*").alias("n")).collect()}
    assert got == {0: 50, 1: 50, 2: 50, 3: 50}
    # Partition values still path-encoded under the clone's root.
    kept, total = c.prune_files("p", 2, 2)
    assert len(kept) < total


def test_deep_clone_preserves_row_ids_and_properties(spark):
    d, t = _mk(spark)
    t.create(spark.range(100).selectExpr("id", "id * 2 AS v"))
    t.enable_row_tracking()
    t.delete("id % 7 = 0", rewrite=False)  # DV over span files
    ids = {r["id"]: r["_row_id"] for r in t.read_row_ids().collect()}
    c = t.deep_clone(f"{d}/clone")
    assert c.row_tracking_enabled()  # properties travelled
    got = {r["id"]: r["_row_id"] for r in c.read_row_ids().collect()}
    assert got == ids  # copied spans + rewrite materialization
    # New appends to the clone mint ABOVE the carried high-water mark.
    c.append(spark.range(1000, 1010).selectExpr("id", "id * 2 AS v"))
    all_ids = [r["_row_id"] for r in c.read_row_ids().collect()]
    assert len(all_ids) == len(set(all_ids))


def test_shallow_clone_carries_snapshot_metadata(spark):
    d, t = _mk(spark)
    t.create(spark.range(20).selectExpr("id", "id * 2 AS a"))
    t.alter_rename_column("a", "b")
    c = t.clone(f"{d}/clone")
    # Logical names, not the stale physical ones.
    assert c.read().columns == ["id", "b"]
    assert c._state(0).get("columnMapping") == {"id": "id", "b": "a"}
    assert c._state(0).get("schema") is not None
    # Stats carried: pruning without footer reads.
    kept, total = c.prune_files("id", 0, 0)
    assert len(kept) < total


def test_deep_clone_sql_and_divergence(spark):
    from delta_lake_platform_spark.sql import PlatformSQL

    d = tempfile.mkdtemp(prefix="deepclone_sql_")
    sql = PlatformSQL(spark)
    sql.sql(
        f"CREATE TABLE src LOCATION '{d}/src' AS "
        "SELECT id, id * 2 AS v FROM range(50)"
    )
    sql.sql(f"CREATE TABLE dc DEEP CLONE src LOCATION '{d}/dc'")
    assert sql.sql("SELECT count(*) AS n FROM dc").first().n == 50
    sql.sql("DELETE FROM dc WHERE id < 10")
    assert sql.sql("SELECT count(*) AS n FROM dc").first().n == 40
    assert sql.sql("SELECT count(*) AS n FROM src").first().n == 50
    with pytest.raises(FileExistsError):
        sql.sql(f"CREATE TABLE dc2 DEEP CLONE src LOCATION '{d}/dc'")


def test_clone_version_as_of(spark):
    from delta_lake_platform_spark.sql import PlatformSQL

    d = tempfile.mkdtemp(prefix="clone_vao_")
    sql = PlatformSQL(spark)
    sql.sql(
        f"CREATE TABLE src2 LOCATION '{d}/src' AS "
        "SELECT id FROM range(30)"
    )
    sql.sql("DELETE FROM src2 WHERE id >= 10")  # v1
    t = sql.tables["src2"]
    # Python API: both clone kinds accept a version.
    c_old = t.clone(f"{d}/shallow0", version=0)
    assert c_old.read().count() == 30
    dc_old = t.deep_clone(f"{d}/deep0", version=0)
    assert dc_old.read().count() == 30
    # SQL form.
    sql.sql(
        f"CREATE TABLE dvao DEEP CLONE src2 VERSION AS OF 0 "
        f"LOCATION '{d}/dvao'"
    )
    assert sql.sql("SELECT count(*) AS n FROM dvao").first().n == 30
    sql.sql(
        f"CREATE TABLE svao SHALLOW CLONE src2 VERSION AS OF 1 "
        f"LOCATION '{d}/svao'"
    )
    assert sql.sql("SELECT count(*) AS n FROM svao").first().n == 10


def test_clone_carries_burned_row_id_mark(spark):
    """Ids burned on the source ONLY via log entries (a COW delete of
    the peak-id row leaves the mark in the source log the clone drops)
    must stay burned on the clone: the clone's v0 entry carries
    rowIdHighWaterMark, so appends never re-mint a source-burned id."""
    d, t = _mk(spark, "burnmark_")
    t.create(spark.range(100).selectExpr("id", "id * 2 AS v"))
    t.enable_row_tracking()
    all_ids = {r["_row_id"] for r in t.read_row_ids().collect()}
    peak_owner = next(
        r["id"]
        for r in t.read_row_ids().collect()
        if r["_row_id"] == max(all_ids)
    )
    t.delete(f"id = {peak_owner}", rewrite=True)  # COW: burns the peak id
    survivors = {r["_row_id"] for r in t.read_row_ids().collect()}
    assert max(survivors) < max(all_ids)
    for c in (
        t.deep_clone(f"{d}/deep"),
        t.clone(f"{d}/shallow"),
    ):
        assert c._entry(0).get("rowIdHighWaterMark") is not None
        assert c.row_tracking_enabled()  # properties sidecar travelled
        c.append(spark.range(500, 505).selectExpr("id", "id * 2 AS v"))
        minted = {
            r["_row_id"] for r in c.read_row_ids().collect()
        } - survivors
        assert max(all_ids) not in minted, "burned peak id re-minted"
        assert min(minted) > max(all_ids)


def test_clone_carries_identity_high_water_mark(spark):
    d, t = _mk(spark, "identmark_")
    t.create(
        spark.range(10).selectExpr("id", "CAST(NULL AS BIGINT) AS acct")
        .limit(0)
    )
    t.set_identity_column("acct", start=1)
    t.append(spark.range(10).selectExpr("id"))
    peak = max(r["acct"] for r in t.read().collect())
    owner = next(r["id"] for r in t.read().collect() if r["acct"] == peak)
    t.delete(f"id = {owner}", rewrite=True)  # burn the peak identity id
    assert max(r["acct"] for r in t.read().collect()) < peak
    for c in (
        t.deep_clone(f"{d}/deep"),
        t.clone(f"{d}/shallow"),
    ):
        marks = c._entry(0).get("identityHighWaterMark")
        assert marks and marks["acct"] >= peak
        c.append(spark.range(100, 103).selectExpr("id"))
        vals = [r["acct"] for r in c.read().collect()]
        assert len(vals) == len(set(vals))
        assert sum(1 for v in vals if v == peak) == 0, "peak id re-minted"
