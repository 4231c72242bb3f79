"""ManagedTable platform ops: reference-parity merge API, compaction,
vacuum, schema evolution, change feed, merge multi-match error."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

import pytest

from delta_lake_platform_spark.scd.api import apply_scd, delta_merge
from delta_lake_platform_spark.scd.engine import ScdConfig, create_scd_target
from delta_lake_platform_spark.sources.managed_table import (
    ManagedTable,
    MergeClauses,
    MergeError,
)

CLK = lambda: datetime(2026, 3, 1)  # noqa: E731


@pytest.fixture
def tmp_table(spark):
    d = tempfile.mkdtemp(prefix="mt_")
    yield ManagedTable(spark, f"{d}/t")
    shutil.rmtree(d, ignore_errors=True)


def _seed(spark, table):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long"
    )
    cfg = ScdConfig(pk_cols=["id"], scd_cols=["v"], clock=CLK)
    create_scd_target(table, df, cfg)
    apply_scd(df, ["v"], ["id"], table, clock=CLK)
    return df


def test_reference_api_roundtrip(spark, tmp_table):
    """delta_merge + apply_scd signatures from scd_handler.py:7,58."""
    _seed(spark, tmp_table)
    state = tmp_table.read().collect()
    assert len(state) == 3
    assert all(r.record_status == "A" for r in state)
    # SCD2 change through the reference signature
    batch = spark.createDataFrame([(1, "a", 99)], "id long, name string, v long")
    apply_scd(batch, ["v"], ["id"], tmp_table, clock=lambda: datetime(2026, 3, 2))
    rows = sorted(tmp_table.read().collect(), key=lambda r: (r.id, str(r.effective_from)))
    one = [r for r in rows if r.id == 1]
    assert len(one) == 2
    assert {r.record_status for r in one} == {"A", "I"}


def test_merge_multi_match_raises(spark, tmp_table):
    _seed(spark, tmp_table)
    dup_source = spark.createDataFrame(
        [(1, "x"), (1, "y")], "id long, name string"
    )
    with pytest.raises(MergeError):
        tmp_table.merge(
            dup_source,
            MergeClauses(
                condition="target.id = updates.id",
                matched_update={"name": "updates.name"},
            ),
        )


def test_compact_and_vacuum(spark, tmp_table):
    _seed(spark, tmp_table)
    v_before = tmp_table.latest_version()
    tmp_table.compact()
    assert tmp_table.read().count() == 3
    h = tmp_table.history(1)[0]
    assert h["operation"] == "OPTIMIZE"
    removed = tmp_table.vacuum(keep_last=1)
    assert v_before in removed
    assert tmp_table.read().count() == 3  # latest still readable
    with pytest.raises(Exception):
        tmp_table.read(version=0).collect()  # vacuumed data is gone


def test_schema_evolution_append(spark, tmp_table):
    tmp_table.create(
        spark.createDataFrame([(1, "a")], "id long, name string")
    )
    tmp_table.append(
        spark.createDataFrame([(2, "b", 5.0)], "id long, name string, score double"),
        merge_schema=True,
    )
    df = tmp_table.read()
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None and rows[2].score == 5.0


def test_merge_auto_schema_evolution(spark, tmp_table):
    """Delta schema.autoMerge analogue: a source column the target has
    never seen widens the schema; matched rows take its value, untouched
    rows read NULL."""
    tmp_table.create(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    )
    src = spark.createDataFrame(
        [(1, "a2", 0.9), (3, "c", 0.1)], "id long, name string, score double"
    )
    tmp_table.merge(
        src,
        MergeClauses(
            condition="target.id = updates.id",
            matched_update={"name": "updates.name", "score": "updates.score"},
            not_matched_insert={
                "id": "updates.id",
                "name": "updates.name",
                "score": "updates.score",
            },
        ),
        auto_schema_evolution=True,
    )
    rows = {r.id: r for r in tmp_table.read().collect()}
    assert set(tmp_table.read().columns) == {"id", "name", "score"}
    assert rows[1].name == "a2" and rows[1].score == 0.9
    assert rows[2].score is None
    assert rows[3].name == "c" and rows[3].score == 0.1
    # without the flag, the same merge must fail (unknown column)
    with pytest.raises(Exception):
        tmp_table.merge(
            spark.createDataFrame([(9, "z", 1, 1.0)], "id long, name string, extra long, score double"),
            MergeClauses(
                condition="target.id = updates.id",
                not_matched_insert={"id": "updates.id", "extra": "updates.extra"},
            ),
        )


def test_alter_column_ops(spark, tmp_table):
    tmp_table.create(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    )
    tmp_table.alter_add_column("score", "double")
    assert [r.score for r in tmp_table.read().collect()] == [None, None]
    tmp_table.alter_rename_column("score", "quality")
    assert "quality" in tmp_table.read().columns
    with pytest.raises(ValueError):
        tmp_table.alter_rename_column("nope", "x")
    with pytest.raises(ValueError):
        tmp_table.alter_add_column("id", "long")
    tmp_table.alter_drop_column("quality")
    assert set(tmp_table.read().columns) == {"id", "name"}
    # every ALTER is a versioned commit — time travel sees the old shape
    ops = [h["operation"] for h in tmp_table.history()]
    assert {"ADD COLUMN", "RENAME COLUMN", "DROP COLUMN"} <= set(ops)


def test_overwrite_where_replaces_only_matching_slice(spark, tmp_table):
    tmp_table.create(
        spark.createDataFrame(
            [(1, "US", 10), (2, "US", 20), (3, "DE", 30)],
            "id long, country string, v long",
        )
    )
    tmp_table.overwrite_where(
        spark.createDataFrame([(9, "US", 99)], "id long, country string, v long"),
        "country = 'US'",
    )
    rows = {(r.id, r.country, r.v) for r in tmp_table.read().collect()}
    assert rows == {(9, "US", 99), (3, "DE", 30)}
    # validation: rows outside the predicate are rejected
    with pytest.raises(ValueError):
        tmp_table.overwrite_where(
            spark.createDataFrame([(5, "FR", 1)], "id long, country string, v long"),
            "country = 'US'",
        )
    assert tmp_table.history(1)[0]["operation"] == "REPLACE WHERE"


def test_describe_detail(spark, tmp_table):
    tmp_table.create(spark.createDataFrame([(1, "a")], "id long, v string"))
    d = tmp_table.detail()
    assert d["version"] == 0 and d["numFiles"] >= 1
    assert d["sizeInBytes"] > 0
    assert d["lastOperation"].startswith("CREATE")


def test_change_feed_keys(spark, tmp_table):
    tmp_table.create(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    )
    v0 = tmp_table.latest_version()
    tmp_table.overwrite(
        spark.createDataFrame([(1, "a2"), (3, "c")], "id long, name string")
    )
    feed = tmp_table.change_feed(v0, key_cols=["id"]).collect()
    types = {(r.id, r._change_type) for r in feed}
    assert (3, "insert") in types
    assert (2, "delete") in types
    assert (1, "update_preimage") in types and (1, "update_postimage") in types


def test_update_and_delete(spark, tmp_table):
    from pyspark.sql import functions as F

    tmp_table.create(
        spark.range(10).withColumn("val", F.col("id") * 10)
    )
    v1 = tmp_table.update({"val": "val + 1"}, condition="id % 2 = 0")
    got = {r.id: r.val for r in tmp_table.read().collect()}
    assert got[0] == 1 and got[1] == 10 and got[2] == 21
    h = tmp_table.history(1)[0]
    assert h["operation"] == "UPDATE" and h["operationMetrics"]["numUpdatedRows"] == 5

    tmp_table.delete("id >= 8")
    assert tmp_table.read().count() == 8
    h = tmp_table.history(1)[0]
    assert h["operation"] == "DELETE" and h["operationMetrics"]["numDeletedRows"] == 2
    # time travel still sees the pre-delete state
    assert tmp_table.read(version=v1).count() == 10


def test_merge_with_delete_clause(spark, tmp_table):
    from pyspark.sql import functions as F

    from delta_lake_platform_spark.sources.managed_table import MergeClauses

    tmp_table.create(spark.range(6).withColumn("val", F.lit(0)))
    src = spark.range(4).withColumn("flag", F.when(F.col("id") < 2, "del").otherwise("upd"))
    v = tmp_table.merge(
        src,
        MergeClauses(
            condition="target.id = updates.id",
            matched_delete_condition="updates.flag = 'del'",
            matched_update={"val": "99"},
        ),
    )
    got = {r.id: r.val for r in tmp_table.read().collect()}
    assert set(got) == {2, 3, 4, 5}          # 0,1 deleted
    assert got[2] == 99 and got[3] == 99     # matched, updated
    assert got[4] == 0 and got[5] == 0       # untouched
    m = tmp_table.history(1)[0]["operationMetrics"]
    assert m["numTargetRowsDeleted"] == 2 and m["numTargetRowsUpdated"] == 2


def test_restore_past_version(spark, tmp_table):
    from pyspark.sql import functions as F

    tmp_table.create(spark.range(5))
    tmp_table.overwrite(spark.range(3))
    v = tmp_table.restore(0)
    assert tmp_table.read().count() == 5
    h = tmp_table.history(1)[0]
    assert h["operation"] == "RESTORE"
    assert h["operationMetrics"]["restoredVersion"] == 0
    # restore is itself a commit: the pre-restore state is still there
    assert tmp_table.read(version=v - 1).count() == 3


def test_check_constraints(spark, tmp_table):
    import pytest as _pytest
    from pyspark.sql import functions as F

    tmp_table.create(spark.range(5).withColumn("val", F.col("id") * 10))
    tmp_table.add_constraint("val_nonneg", "val >= 0")
    # conforming write passes
    tmp_table.append(spark.range(5, 7).withColumn("val", F.lit(1)))
    # violating write is rejected and commits nothing
    before = tmp_table.latest_version()
    with _pytest.raises(ValueError, match="val_nonneg"):
        tmp_table.append(spark.range(7, 8).withColumn("val", F.lit(-5)))
    assert tmp_table.latest_version() == before
    # adding a constraint the existing data violates is rejected
    with _pytest.raises(ValueError):
        tmp_table.add_constraint("impossible", "val > 100")
    assert "impossible" not in tmp_table.constraints()


def test_optimistic_retry_on_conflict(spark, tmp_table):
    import json as _json
    import os as _os

    from delta_lake_platform_spark.sources.managed_table import (
        ConcurrentWriteError,
    )

    tmp_table.create(spark.range(5))
    attempts = []

    def op(t):
        # First attempt: another writer lands the next version just
        # before our commit -> O_EXCL create fails -> retried op sees
        # the winner's table and succeeds on the next version number.
        if not attempts:
            attempts.append(1)
            nxt = t.latest_version() + 1
            with open(_os.path.join(t._log_dir, f"{nxt}.json"), "w") as f:
                _json.dump({"version": nxt, "timestamp": 0,
                            "operation": "WRITE", "operationMetrics": {}}, f)
            _os.makedirs(t._data_dir(nxt), exist_ok=True)
            spark.range(99).write.mode("overwrite").parquet(t._data_dir(nxt))
        return t.append(spark.range(5, 6))

    v = tmp_table.retry(op)
    assert v == tmp_table.latest_version()
    # the winner's 99 rows + our appended row
    assert tmp_table.read().count() == 100


def test_shallow_clone(spark, tmp_table, tmp_path):
    import os as _os

    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    tmp_table.create(spark.range(10))
    clone = tmp_table.clone(str(tmp_path / "clone"))
    # zero data copied: the clone has no local data dir for v0
    assert not _os.path.isdir(clone._local_data_dir(0))
    assert clone.read().count() == 10
    assert clone.history(1)[0]["operation"] == "CLONE"

    # copy-on-write divergence: writes to the clone don't touch source
    clone.append(spark.range(10, 15))
    assert clone.read().count() == 15
    assert tmp_table.read().count() == 10

    # clone vacuum never deletes the source's files
    removed = clone.vacuum(keep_last=1, older_than_s=0)
    assert 0 not in removed
    assert tmp_table.read().count() == 10


def test_overwrite_schema_change_requires_opt_in(spark):
    import tempfile

    import pytest

    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="ow_schema_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(2).selectExpr("id", "id * 2 as v"))
    with pytest.raises(ValueError, match="overwrite_schema=True"):
        t.overwrite(spark.range(2).selectExpr("id", "id as renamed"))
    assert t.read().columns == ["id", "v"]
    t.overwrite(
        spark.range(2).selectExpr("id", "id as renamed"), overwrite_schema=True
    )
    assert t.read().columns == ["id", "renamed"]


def test_overwrite_type_change_requires_opt_in(spark):
    """Same column NAMES but a changed type must also hit the gate
    (Delta's overwriteSchema blocks type changes, not just renames)."""
    import tempfile

    import pytest

    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="ow_type_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(2).selectExpr("id", "id * 2 as v"))
    with pytest.raises(ValueError, match="type changed"):
        t.overwrite(
            spark.range(2).selectExpr("id", "cast(id as string) as v")
        )
    assert dict(t.read().dtypes)["v"] == "bigint"
    t.overwrite(
        spark.range(2).selectExpr("id", "cast(id as string) as v"),
        overwrite_schema=True,
    )
    assert dict(t.read().dtypes)["v"] == "string"


def test_update_set_null_keeps_column_type(spark):
    """UPDATE SET col = NULL must store-assign to the column's declared
    type on every DML path — a void-typed batch corrupts the parquet
    schema (found via the MV NULL-group-key work, r5)."""
    import tempfile

    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    for rewrite in (False, True):
        d = tempfile.mkdtemp(prefix="upd_null_")
        t = ManagedTable(spark, f"{d}/t")
        t.create(
            spark.range(10).selectExpr(
                "id", "cast(concat('s', id) as string) as s"
            )
        )
        t.append(  # second file so rewrite=True takes the file-level path
            spark.range(10, 20).selectExpr(
                "id", "cast(concat('s', id) as string) as s"
            )
        )
        t.update({"s": "NULL"}, "id % 2 = 0", rewrite=rewrite)
        got = t.read()
        assert dict(got.dtypes)["s"] == "string"
        assert got.filter("s IS NULL").count() == 10
        assert got.filter("s IS NOT NULL").count() == 10


def test_append_only_property_blocks_mutations(spark):
    import tempfile

    import pytest as _pytest

    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="appendonly_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(10).selectExpr("id", "id * 2 as v"))
    t.set_property("appendOnly", "true")
    t.append(spark.range(10, 15).selectExpr("id", "id * 2 as v"))  # allowed
    assert t.read().count() == 15
    for op in (
        lambda: t.delete("id < 3"),
        lambda: t.update({"v": "v + 1"}, "id = 1"),
        lambda: t.overwrite(t.read()),
        lambda: t.restore(0),
    ):
        with _pytest.raises(ValueError, match="appendOnly"):
            op()
    # compact (layout-only) stays allowed; so does dropping the gate.
    t.set_property("appendOnly", "false")
    t.delete("id < 3")
    assert t.read().count() == 12


def test_checkpoint_interval_property(spark):
    import os as _os
    import tempfile

    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="ckptint_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(5).selectExpr("id", "id * 2 as v"))
    t.set_property("checkpointInterval", "3")
    for i in range(6):
        t.append(spark.range(i, i + 2).selectExpr("id", "id * 2 as v"))
    ckpt_dir = _os.path.join(t.path, "_log", "_checkpoints")
    ckpts = sorted(_os.listdir(ckpt_dir)) if _os.path.isdir(ckpt_dir) else []
    # Commits 3 and 6 checkpointed under the property (default is 10,
    # which would have produced none by version 6).
    assert len(ckpts) == 2
    assert t._last_checkpoint_version() == 6


# --- commitInfo.userMetadata -------------------------------------------------

def test_user_metadata_one_shot_on_next_commit(spark, tmp_path):
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    t = ManagedTable(spark, str(tmp_path / "um"))
    t.create(spark.createDataFrame([(1,)], "k long"))
    t.set_commit_metadata("nightly load 2026-08-16")
    t.append(spark.createDataFrame([(2,)], "k long"))
    t.append(spark.createDataFrame([(3,)], "k long"))
    h = t.history()
    assert h[1]["userMetadata"] == "nightly load 2026-08-16"  # the tagged append
    assert "userMetadata" not in h[0]  # next commit untagged
    assert "userMetadata" not in h[2]  # create untagged


def test_user_metadata_rides_metadata_only_commits_and_sql_history(spark, tmp_path):
    from delta_lake_platform_spark.sources.managed_table import ManagedTable
    from delta_lake_platform_spark.sql import PlatformSQL

    t = ManagedTable(spark, str(tmp_path / "um2"))
    t.create(spark.createDataFrame([(1,), (2,)], "k long"))
    t.append(spark.createDataFrame([(3,)], "k long"))
    t.set_commit_metadata("rollback after bad load")
    t.restore(0)  # metadata-only commit carries the tag
    assert t.history(1)[0]["userMetadata"] == "rollback after bad load"
    p = PlatformSQL(spark)
    p.register("um2", t)
    rows = p.sql("DESCRIBE HISTORY um2").collect()
    assert rows[0].userMetadata == "rollback after bad load"
    assert rows[1].userMetadata == ""  # untagged commits render empty
