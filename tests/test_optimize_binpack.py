"""Size-aware OPTIMIZE (Delta bin-packing): the maintenance pass must
rewrite ONLY the small-file tier — candidates picked from the commit
log's recorded per-file byte sizes, never a table scan — and reference
every already-well-sized file untouched through the file-level
manifest. At 100 TB, OPTIMIZE that rewrites the whole table is not
maintenance; it's a disaster. (Delta's OPTIMIZE: files below
minFileSize are binned toward maxFileSize; reference substrate of
scd_handler.py:48-55.)
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable


def _mk(spark, prefix="optbp_"):
    d = tempfile.mkdtemp(prefix=prefix)
    return ManagedTable(spark, os.path.join(d, "t"))


def _live_rels(t):
    return set(t._state(t.latest_version())["files"])


def test_optimize_rewrites_only_small_files(spark):
    t = _mk(spark)
    # One "large" file (5k rows) + four small ingest files (10 rows).
    t.create(spark.range(5000).select("id").coalesce(1))
    for i in range(4):
        t.append(spark.range(10000 + i * 10, 10010 + i * 10).select("id"))
    before_rows = t.read().count()
    big = {
        rel
        for rel, st in t._state(t.latest_version())["files"].items()
        if (st or {}).get("__fileBytes", 0) >= 4096
    }
    assert big, "expected the 5k-row file to exceed the test threshold"
    v = t.optimize(target_file_size=128 << 20, min_file_size=4096)
    assert v is not None
    entry = t._entry(v)
    met = entry["operationMetrics"]
    assert met["numRewrittenFiles"] >= 2
    assert met["numKeptFiles"] == len(big)
    # The large file survives by reference — same path still live.
    assert big <= _live_rels(t)
    # The small tier collapsed into one bin.
    small_after = [
        rel
        for rel, st in t._state(v)["files"].items()
        if rel not in big
    ]
    assert len(small_after) == 1
    assert t.read().count() == before_rows
    assert t.history(1)[0]["operation"] == "OPTIMIZE"


def test_optimize_none_when_nothing_to_bin(spark):
    t = _mk(spark)
    t.create(spark.range(100).select("id").coalesce(1))
    v_before = t.latest_version()
    assert t.optimize() is None  # a single file: no gain
    assert t.latest_version() == v_before


def test_optimize_materializes_dv_debt_of_rewritten_files(spark):
    t = _mk(spark)
    t.create(spark.range(100).select("id").coalesce(1))
    for i in range(3):
        t.append(spark.range(1000 + i * 10, 1010 + i * 10).select("id"))
    t.delete("id = 1005", rewrite=False)  # DV on a small file
    assert t._state(t.latest_version())["dv"] is not None
    before = {r["id"] for r in t.read().collect()}
    v = t.optimize(min_file_size=1 << 30)  # everything is small
    assert v is not None
    after = {r["id"] for r in t.read().collect()}
    assert after == before
    assert 1005 not in after
    # Exact row accounting survived (metadata-only COUNT(*)).
    assert t.row_count(v) == len(before)


def test_optimize_preserves_row_ids(spark):
    t = _mk(spark)
    t.create(spark.range(200).select("id"))
    t.enable_row_tracking()
    t.append(spark.range(500, 520).select("id"))
    ids = {r["id"]: r["_row_id"] for r in t.read_row_ids().collect()}
    v = t.optimize(min_file_size=1 << 30)
    assert v is not None
    after = {r["id"]: r["_row_id"] for r in t.read_row_ids().collect()}
    assert after == ids


def test_optimize_partitioned_keeps_layout_and_pruning(spark):
    t = _mk(spark)
    df = spark.range(400).select(
        "id", (F.col("id") % 4).alias("p")
    )
    t.create(df, partition_by=["p"])
    for i in range(3):
        t.append(
            spark.range(1000 + i, 1001 + i).select(
                "id", F.lit(2).alias("p")
            )
        )
    before = {r["p"]: r["count"] for r in t.read().groupBy("p").count().collect()}
    v = t.optimize(min_file_size=1 << 30)
    assert v is not None
    after = {r["p"]: r["count"] for r in t.read().groupBy("p").count().collect()}
    assert after == before
    # Partition pruning still works off the compacted files' stats.
    kept, total = t.prune_files("p", 3, 3)
    assert len(kept) < total


def test_optimize_clustered_zorders_the_bin(spark):
    t = _mk(spark)
    t.create(
        spark.range(2000)
        .select(
            (F.col("id") % 101).alias("x"),
            ((F.col("id") * 17) % 103).alias("y"),
            F.col("id").alias("payload"),
        )
        .repartition(8)
    )
    t.set_cluster_by(["x", "y"])
    before = t.read().orderBy("payload").collect()
    v = t.optimize(target_file_size=1, min_file_size=1 << 30)
    assert v is not None
    assert t.history(1)[0]["operation"] == "OPTIMIZE_ZORDER"
    assert t.read().orderBy("payload").collect() == before


def test_footer_stats_record_bytes_and_rows(spark):
    t = _mk(spark)
    t.create(spark.range(100).select("id").coalesce(1))
    stats = t._state(t.latest_version())["files"]
    for rel, st in stats.items():
        assert st["__fileBytes"] == os.path.getsize(t._abs(rel))
        assert st["__numRows"] == 100


def test_column_max_skips_zero_row_files(spark):
    t = _mk(spark)
    t.create(spark.range(50).select("id"))
    # An empty append produces a zero-row schema-anchor file.
    t.append(spark.range(0).select("id"))
    assert t.column_max("id") == 49


def test_sql_optimize_binpacks(spark):
    from delta_lake_platform_spark.sql import PlatformSQL

    d = tempfile.mkdtemp(prefix="optbp_sql_")
    sql = PlatformSQL(spark)
    sql.sql(
        f"CREATE TABLE ob LOCATION '{d}/ob' AS "
        "SELECT id FROM range(1000)"
    )
    out = sql.sql("OPTIMIZE ob").first()
    assert out.operation == "OPTIMIZE"
    t = sql.tables["ob"]
    assert len(t._state(t.latest_version())["files"]) == 1
    # A second OPTIMIZE finds a single file: still commits (full path).
    out2 = sql.sql("OPTIMIZE ob").first()
    assert out2.operation == "OPTIMIZE"


def test_maintain_composite_pass(spark):
    """maintain(): the nightly job in one call — bin-pack, purge DV
    debt past the threshold, expire old log entries, vacuum dead data.
    Each step O(its own debt); a quiet table is a no-op summary."""
    t = _mk(spark, prefix="maintain_")
    t.create(spark.range(100).select("id").coalesce(1))
    for i in range(3):
        t.append(spark.range(1000 + i * 10, 1010 + i * 10).select("id"))
    t.delete("id % 3 = 0", rewrite=False)
    before = {r["id"] for r in t.read().collect()}
    out = t.maintain(max_dv_rows=5, vacuum_older_than_s=0.0)
    assert out["optimized"] is not None
    # Optimize already materialized every candidate file's DV debt and
    # the kept base file's vector may remain under the threshold logic;
    # content is what matters:
    assert {r["id"] for r in t.read().collect()} == before
    # Quiet second pass: nothing left to do.
    out2 = t.maintain(max_dv_rows=5, vacuum_older_than_s=0.0)
    assert out2["optimized"] is None
    assert out2["purged"] is None
    assert {r["id"] for r in t.read().collect()} == before
