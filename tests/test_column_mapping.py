"""Column mapping (Delta name mode): RENAME/DROP COLUMN are
metadata-only schema commits — data files keep their physical column
names forever and scans re-alias — so a rename on a 100 TB table never
rewrites a byte of data. Pinned here: zero-file-touch renames, reads
and DML through the mapping, stats/bloom pruning by logical name,
time travel across the rename, stale-column non-resurrection after
DROP + re-ADD, and the full-rewrite mapping reset."""

from __future__ import annotations

import glob
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="cmap_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(20).selectExpr(
            "id", "id * 2 as v", "concat('s', id) as s"
        ).repartition(2)
    )
    return t


def _data_files(t):
    return sorted(glob.glob(f"{t.path}/data/**/*.parquet", recursive=True))


def test_rename_touches_zero_data_files(table):
    before = _data_files(table)
    v = table.alter_rename_column("v", "value")
    assert _data_files(table) == before  # not one byte rewritten
    entry = table._entry(v)
    assert entry["operationMetrics"]["metadataOnly"] is True
    assert not entry.get("add") and not entry.get("remove")
    assert table.read().columns == ["id", "value", "s"]
    assert table.read().agg(F.sum("value")).first()[0] == sum(
        2 * i for i in range(20)
    )


def test_time_travel_across_rename(table):
    table.alter_rename_column("v", "value")
    assert table.read(0).columns == ["id", "v", "s"]
    assert table.read(0).agg(F.sum("v")).first()[0] == sum(
        2 * i for i in range(20)
    )


def test_append_and_dml_after_rename(table):
    table.alter_rename_column("v", "value")
    table.append(
        table.spark.range(20, 25).selectExpr(
            "id", "id * 2 as value", "concat('s', id) as s"
        )
    )
    assert table.read().count() == 25
    table.delete("value >= 40", rewrite=False)  # MOR through the mapping
    assert table.read().count() == 20
    table.update({"value": "value + 100"}, "id = 1", rewrite=False)
    assert table.read().filter("id = 1").first().value == 102
    # The incremental batches landed with the PHYSICAL name.
    import pyarrow.parquet as pq

    batch_files = [f for f in _data_files(table) if "batch-" in f]
    assert batch_files
    for f in batch_files:
        assert "v" in pq.read_schema(f).names
        assert "value" not in pq.read_schema(f).names


def test_stats_pruning_by_logical_name(spark):
    d = tempfile.mkdtemp(prefix="cmap_prune_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(1000)
        .selectExpr("id", "id as k")
        .repartitionByRange(8, "k")
    )
    t.alter_rename_column("k", "key")
    kept, total = t.prune_files("key", 10, 12)
    assert total == 8 and len(kept) <= 2
    got = t.read_pruned("key", 10, 12)
    assert sorted(r.key for r in got.collect()) == [10, 11, 12]
    assert t.column_max("key") == 999


def test_bloom_lookup_by_logical_name(spark):
    d = tempfile.mkdtemp(prefix="cmap_bloom_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(4000)
        .select((F.col("id") % 8).alias("bucket"), F.col("id").alias("k"))
        .repartition(8, "bucket")
        .drop("bucket")
    )
    t.alter_rename_column("k", "key")
    t.build_bloom_index(["key"])
    kept, total = t.prune_files_eq("key", 17)
    assert len(kept) < total  # bloom discriminated through the mapping
    assert [r.key for r in t.read_pruned_eq("key", 17).collect()] == [17]


def test_drop_then_add_same_name_is_null(table):
    """The re-added column must NOT surface the dropped column's stale
    physical values from old files (Delta's uuid physical names)."""
    table.alter_rename_column("v", "value")  # activates the mapping
    table.alter_drop_column("s")
    assert table.read().columns == ["id", "value"]
    table.alter_add_column("s", "string")
    assert table.read().filter("s IS NOT NULL").count() == 0
    # and it is writable under its fresh physical name
    table.append(
        table.spark.range(100, 102).selectExpr(
            "id", "id * 2 as value", "concat('x', id) as s"
        )
    )
    assert table.read().filter("s IS NOT NULL").count() == 2


def test_full_rewrite_resets_mapping(table):
    table.alter_rename_column("v", "value")
    assert table._state(table.latest_version())["columnMapping"]
    table.compact()
    st = table._state(table.latest_version())
    assert st.get("columnMapping") is None  # materialized away
    import pyarrow.parquet as pq

    for f in _data_files(table)[-1:]:
        assert "value" in pq.read_schema(f).names
    assert table.read().agg(F.sum("value")).first()[0] == sum(
        2 * i for i in range(20)
    )


def test_rename_survives_checkpoint_replay(spark):
    """The mapping must flow through checkpoints: commit past the
    checkpoint interval and re-open the table cold."""
    d = tempfile.mkdtemp(prefix="cmap_ckpt_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(10).selectExpr("id", "id * 2 as v"))
    t.alter_rename_column("v", "value")
    for i in range(12):  # crosses the checkpoint interval
        t.append(
            spark.range(100 + i, 101 + i).selectExpr("id", "id * 2 as value")
        )
    cold = ManagedTable(spark, t.path)  # fresh handle, no cached state
    assert cold.read().columns == ["id", "value"]
    assert cold.read().count() == 22
    assert cold._state(cold.latest_version())["columnMapping"] is not None


def test_change_feed_after_rename_span(table):
    """A feed spanning only post-rename DML reads mapped files and
    reports logical columns."""
    v_renamed = table.alter_rename_column("v", "value")
    table.delete("id = 3", rewrite=False)
    feed = table.change_feed(v_renamed)
    rows = feed.collect()
    assert [r.id for r in rows] == [3]
    assert rows[0]["_change_type"] == "delete"
    assert "value" in feed.columns


def test_rename_rejected_on_partitioned_table(spark):
    d = tempfile.mkdtemp(prefix="cmap_part_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.range(10).selectExpr("id", "id % 2 as p"),
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partitioned"):
        t.alter_rename_column("id", "ident")
    with pytest.raises(ValueError, match="partitioned"):
        t.alter_drop_column("id")


def test_datasource_reads_through_mapping(table, spark):
    from delta_lake_platform_spark.sources import datasource

    datasource.register(spark)
    table.alter_rename_column("v", "value")
    table.append(
        spark.range(20, 23).selectExpr(
            "id", "id * 2 as value", "concat('s', id) as s"
        )
    )
    df = (
        spark.read.format("managed_table").option("path", table.path).load()
    )
    assert df.columns == ["id", "value", "s"]
    assert df.count() == 23
    assert df.agg(F.sum("value")).first()[0] == sum(2 * i for i in range(23))


def test_datasource_sink_appends_to_mapped_table(table, spark):
    """The sink captures the mapping at write-plan time, so executor
    partitions land with PHYSICAL column names and the append stays
    consistent with the table's naming scheme."""
    import pyarrow.parquet as pq

    from delta_lake_platform_spark.sources import datasource

    datasource.register(spark)
    table.alter_rename_column("v", "value")
    (
        spark.range(40, 43)
        .selectExpr("id", "id * 2 as value", "concat('s', id) as s")
        .write.format("managed_table")
        .option("path", table.path)
        .mode("append")
        .save()
    )
    got = table.read()
    assert got.count() == 23
    assert got.filter("id >= 40").count() == 3
    assert got.columns == ["id", "value", "s"]
    # The sink's file carries the PHYSICAL name.
    state = table._state(table.latest_version())
    new_files = [
        table._abs(rel) for rel in state["files"] if "/v=1/" not in rel
    ]
    sink_files = [f for f in new_files if "data/v=" in f and "/v=0/" not in f]
    assert sink_files
    for f in sink_files:
        names = pq.read_schema(f).names
        assert "v" in names and "value" not in names


def test_change_feed_spanning_rename_uses_current_names(spark):
    """A feed whose span CONTAINS the rename commit: physical identity
    (same on-file columns) keeps the manifest-pruned path, and the feed
    reports the CURRENT logical names — Delta CDF's contract."""
    d = tempfile.mkdtemp(prefix="cmap_feed_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(10).selectExpr("id", "id * 2 as v"))
    t.delete("id = 1", rewrite=False)          # pre-rename delete
    t.alter_rename_column("v", "value")        # schema-only commit
    t.delete("id = 2", rewrite=False)          # post-rename delete
    t.append(spark.range(50, 52).selectExpr("id", "id * 2 as value"))
    feed = t.change_feed(0)
    assert feed.columns[:2] == ["id", "value"]  # current logical names
    rows = {(r.id, r["_change_type"]) for r in feed.collect()}
    assert rows == {
        (1, "delete"), (2, "delete"), (50, "insert"), (51, "insert"),
    }


@pytest.mark.parametrize("seed", [7, 23])
def test_random_evolution_sequence_matches_model(spark, seed):
    """Model-based randomized sequence: appends, MOR deletes, renames,
    drops, and adds interleave; after every step the table must equal a
    driver-side pandas model — the strongest single guard against
    mapping/schema bookkeeping drift."""
    import random

    import pandas as pd

    rng = random.Random(seed)
    d = tempfile.mkdtemp(prefix=f"cmap_rand{seed}_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(8).selectExpr("id", "id * 10 as c0"))
    model = pd.DataFrame(
        {"id": range(8), "c0": [i * 10 for i in range(8)]}
    ).astype("int64")
    next_id, next_col = 100, 1

    def check():
        got = (
            t.read()
            .toPandas()
            .sort_values("id")
            .reset_index(drop=True)[list(model.columns)]
        )
        want = model.sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype(object).where(got.notna(), None),
            want.astype(object).where(want.notna(), None),
            check_dtype=False,
        )

    for _ in range(14):
        op = rng.choice(
            ["append", "delete", "rename", "drop", "add", "optimize"]
        )
        cols = [c for c in model.columns if c != "id"]
        if op == "append":
            rows = pd.DataFrame(
                {
                    "id": [next_id, next_id + 1],
                    **{c: [rng.randrange(1000), rng.randrange(1000)] for c in cols},
                }
            )
            next_id += 2
            sdf = spark.createDataFrame(
                rows[list(model.columns)].astype(object).where(
                    rows[list(model.columns)].notna(), None
                )
                .values.tolist(),
                schema=t.read().schema,
            )
            t.append(sdf)
            model = pd.concat([model, rows], ignore_index=True)
        elif op == "delete":
            pivot = rng.randrange(0, next_id)
            t.delete(f"id >= {pivot}", rewrite=False)
            model = model[model["id"] < pivot]
            if model.empty:  # keep the table non-degenerate
                t.append(
                    spark.createDataFrame(
                        [[next_id] + [0] * len(cols)], schema=t.read().schema
                    )
                )
                model = pd.DataFrame(
                    [[next_id] + [0] * len(cols)], columns=list(model.columns)
                )
                next_id += 1
        elif op == "rename" and cols:
            old = rng.choice(cols)
            new = f"c{next_col}"
            next_col += 1
            t.alter_rename_column(old, new)
            model = model.rename(columns={old: new})
        elif op == "drop" and len(cols) >= 2:
            victim = rng.choice(cols)
            t.alter_drop_column(victim)
            model = model.drop(columns=[victim])
        elif op == "add":
            new = f"c{next_col}"
            next_col += 1
            t.alter_add_column(new, "bigint")
            model[new] = None
        elif op == "optimize":
            # Size-aware bin-packing is content-neutral: it must hold
            # the model equality through any interleaving of schema
            # evolution, column mapping, and DV debt.
            t.optimize(min_file_size=1 << 30)
        else:
            continue
        check()


def test_mv_refresh_after_base_group_rename_fails_loudly(spark):
    """Renaming a column the MV groups on makes refresh impossible
    (state columns keep the old name) — the error must say so, not
    surface a deep AnalysisException."""
    from delta_lake_platform_spark.sources.materialized_view import (
        MaterializedAggView,
    )

    d = tempfile.mkdtemp(prefix="cmap_mv_")
    base = ManagedTable(spark, f"{d}/base")
    base.create(spark.range(20).selectExpr("id", "id % 3 as grp", "id as val"))
    mv = MaterializedAggView(
        base, f"{d}/mv", group_cols=["grp"], sum_cols=["val"]
    )
    mv.create()
    base.alter_rename_column("grp", "bucket")
    base.append(spark.range(50, 52).selectExpr("id", "id % 3 as bucket", "id as val"))
    with pytest.raises(ValueError, match="recreate the view"):
        mv.refresh()
