"""GENERATED ALWAYS AS IDENTITY columns (the reference's own DDL:
``account_key BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10)``,
test_scd_handler.py:41): engine-assigned on append/COPY INTO, writer
may never supply values, high-water mark is monotone (deleted peak ids
stay burned), allocation is footer-stats + log metadata — no scan."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.sql import PlatformSQL


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="ident_table_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity_column("id", start=10)
    return t


def _batch(spark, names):
    return spark.createDataFrame([(n,) for n in names], "name string")


def test_identity_fill_on_append(spark, table):
    table.append(_batch(spark, ["a", "b", "c"]))
    rows = {r["name"]: r["id"] for r in table.read().collect()}
    assert sorted(rows.values()) == [10, 11, 12]

    # Second append continues from the high-water mark.
    table.append(_batch(spark, ["d", "e"]))
    ids = sorted(r["id"] for r in table.read().collect())
    assert ids == [10, 11, 12, 13, 14]
    marks = table.history(1)[0]["identityHighWaterMark"]
    assert marks == {"id": 14}


def test_identity_rejects_supplied_values(spark, table):
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        table.append(
            spark.createDataFrame([(99, "x")], "id bigint, name string")
        )


def test_identity_never_reuses_deleted_peak(spark, table):
    table.append(_batch(spark, ["a", "b", "c"]))  # ids 10..12
    table.delete("id >= 11")  # burn the peak
    assert table.read().count() == 1
    table.append(_batch(spark, ["d"]))
    ids = sorted(r["id"] for r in table.read().collect())
    # 13, not 11: the recorded mark keeps deleted ids burned.
    assert ids == [10, 13]


def test_identity_step_and_existing_values_seed_hwm(spark):
    d = tempfile.mkdtemp(prefix="ident_seed_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.createDataFrame([(100, "pre")], "id bigint, name string")
    )
    t.set_identity_column("id", start=10, step=5)
    t.append(_batch(spark, ["a", "b"]))
    ids = sorted(r["id"] for r in t.read().collect())
    assert ids == [100, 105, 110]  # continues past existing data


def test_identity_declaration_validates(spark):
    d = tempfile.mkdtemp(prefix="ident_bad_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.createDataFrame([], "id int, name string"))
    with pytest.raises(ValueError, match="BIGINT"):
        t.set_identity_column("id")
    with pytest.raises(ValueError, match="no column"):
        t.set_identity_column("nope")
    with pytest.raises(ValueError, match="step"):
        ManagedTable(spark, f"{d}/t2")  # path unused before the raise
        t.set_identity_column("id", step=0)


def test_identity_concurrent_allocation_conflicts(spark, table):
    """Two appends drawing from the same high-water mark must NOT both
    commit: the identity-aware commute rejects an intervening identity
    allocation (plain blind-append commute would let it through)."""
    table.append(_batch(spark, ["a"]))  # v1, allocates id 10
    assert table._append_commutes_with(1, 1) is True
    assert table._identity_append_commutes(["id"])(1, 1) is False
    assert table._identity_append_commutes(["other"])(1, 1) is True


def test_identity_copy_into(spark, table):
    src = tempfile.mkdtemp(prefix="ident_src_")
    _batch(spark, ["a", "b"]).coalesce(1).write.parquet(f"{src}/f1")
    # copy_into lists files directly under src_dir
    import glob
    import shutil

    for i, f in enumerate(glob.glob(f"{src}/f1/*.parquet")):
        shutil.move(f, f"{src}/part{i}.parquet")
    shutil.rmtree(f"{src}/f1")
    table.copy_into(src)
    ids = sorted(r["id"] for r in table.read().collect())
    assert ids == [10, 11]


def test_sql_create_table_with_identity(spark):
    d = tempfile.mkdtemp(prefix="ident_sql_")
    sess = PlatformSQL(spark)
    sess.sql(
        f"""CREATE TABLE accounts (
              account_key BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10),
              name STRING,
              balance DOUBLE
            ) LOCATION '{d}/accounts'"""
    )
    t = sess.tables["accounts"]
    assert t.identity_columns() == {
        "account_key": {"start": 10, "step": 1, "always": True}
    }
    sess.sql(
        "INSERT INTO accounts (name, balance) VALUES ('ann', 1.5), ('bob', 2.5)"
    )
    got = {
        r["name"]: r["account_key"]
        for r in sess.sql(
            "SELECT name, account_key FROM accounts"
        ).collect()
    }
    assert sorted(got.values()) == [10, 11]

    # GENERATED ALWAYS: supplying the key is refused.
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        sess.sql(
            "INSERT INTO accounts (account_key, name, balance) "
            "VALUES (99, 'eve', 0.0)"
        )


def test_sql_create_table_plain_schema(spark):
    d = tempfile.mkdtemp(prefix="plain_sql_")
    sess = PlatformSQL(spark)
    sess.sql(
        f"CREATE TABLE pt (k BIGINT, v STRING) LOCATION '{d}/pt' "
        "PARTITIONED BY (v)"
    )
    t = sess.tables["pt"]
    assert t.partition_spec() == ["v"]
    sess.sql("INSERT INTO pt (k, v) VALUES (1, 'x'), (2, 'y')")
    assert sess.sql("SELECT COUNT(*) AS n FROM pt").first()["n"] == 2


def test_identity_with_idempotent_txn_append(spark, table):
    """Streaming micro-batch shape: identity keys mint exactly once
    under txn-idempotent appends — a replayed (app, version) batch is a
    NO-OP and does not re-draw from the high-water mark."""
    b = _batch(spark, ["a", "b"])
    table.append(b, txn_app="q1", txn_version=0)
    table.append(b, txn_app="q1", txn_version=0)  # replay: no-op
    ids = sorted(r["id"] for r in table.read().collect())
    assert ids == [10, 11]
    table.append(_batch(spark, ["c"]), txn_app="q1", txn_version=1)
    ids = sorted(r["id"] for r in table.read().collect())
    assert ids == [10, 11, 12]


def test_sink_refuses_identity_table(spark, table):
    """The executor-side DataSource sink cannot coordinate identity
    allocation; it must fail at plan time with a pointer to the
    foreachBatch/append path."""
    from delta_lake_platform_spark.sources import datasource

    datasource.register(spark)
    table.append(_batch(spark, ["a"]))
    df = _batch(spark, ["x"]).withColumn("id", F.lit(None).cast("long"))
    with pytest.raises(Exception, match="IDENTITY"):
        try:
            df.write.format("managed_table").option(
                "path", table.path
            ).mode("append").save()
        except Exception as e:  # py4j wraps the planner error
            raise RuntimeError(str(e)) from e


def test_identity_hwm_survives_log_retention(spark, table, monkeypatch):
    """Expiring the log entries that recorded the high-water mark must
    not resurrect deleted peak ids: expire_log_entries folds the marks
    into a persistent floor in the identity metadata."""
    from delta_lake_platform_spark.sources import managed_table as mt

    monkeypatch.setattr(mt, "_CKPT_INTERVAL", 2)
    table.append(_batch(spark, ["a", "b", "c"]))  # ids 10..12, v1
    table.delete("id >= 11")  # burn the peak, v2 (checkpoint at v2)
    for n in ("d", "e"):  # v3, v4 (checkpoint at v4)
        table.append(_batch(spark, [n]))
    removed = table.expire_log_entries(older_than_s=0.0)
    assert removed, "test needs at least one expired entry"
    # The mark for ids<=14 lives on even if its entries are gone.
    assert table.identity_columns()["id"].get("floor", -1) >= 12
    table.append(_batch(spark, ["f"]))
    ids = sorted(r["id"] for r in table.read().collect())
    assert len(ids) == len(set(ids)), f"duplicate identity ids: {ids}"
    assert max(ids) >= 15


def test_identity_unique_under_mixed_ops(spark):
    """Randomized (seeded) op sequence — appends, deletes, a purge, a
    compact — must never mint a duplicate identity value, and every
    append's ids must stay above everything ever seen."""
    import random

    rng = random.Random(7)
    d = tempfile.mkdtemp(prefix="ident_fuzz_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity_column("id", start=1)
    seen: set[int] = set()
    hwm = 0
    for step in range(10):
        op = rng.choice(
            ["append", "append", "delete", "purge", "compact", "optimize"]
        )
        if op == "append":
            n = rng.randint(1, 5)
            t.append(_batch(spark, [f"s{step}_{i}" for i in range(n)]))
            ids = {r["id"] for r in t.read().collect()}
            fresh = ids - seen
            assert len(fresh) == n, f"step {step}: expected {n} new ids"
            assert min(fresh) > hwm, f"step {step}: reused id below hwm"
            seen |= fresh
            hwm = max(seen)
        elif op == "delete" and t.read().count() > 0:
            t.delete(f"id % 3 = {rng.randint(0, 2)}", rewrite=False)
        elif op == "purge":
            t.reorg_purge()  # None when no DV — fine
        elif op == "compact" and t.read().count() > 0:
            t.compact()
        elif op == "optimize":
            t.optimize(min_file_size=1 << 30)  # None when <2 files — fine
    live = [r["id"] for r in t.read().collect()]
    assert len(live) == len(set(live))


def _merge_clauses(cond, update=None, insert=None, check=True):
    from delta_lake_platform_spark.sources.managed_table import MergeClauses

    return MergeClauses(
        condition=cond,
        matched_update=update,
        not_matched_insert=insert,
        check_multi_match=check,
    )


@pytest.mark.parametrize("rewrite", [True, False])
def test_merge_insert_mints_identity(spark, table, rewrite):
    """MERGE inserts draw fresh identity values from the high-water
    mark (both COW and MOR paths); matched rows keep their keys."""
    table.append(_batch(spark, ["a", "b"]))  # ids 10, 11
    src = spark.createDataFrame(
        [("a", "A2"), ("c", "C1")], "name string, newname string"
    )
    src.createOrReplaceTempView("ident_src")
    table.merge(
        src,
        _merge_clauses(
            "target.name = updates.name",
            update={"name": "updates.newname"},
            insert={"name": "updates.newname"},
        ),
        rewrite=rewrite,
    )
    rows = {r["name"]: r["id"] for r in table.read().collect()}
    assert rows["A2"] in (10, 11)  # matched row kept its key
    assert rows["b"] in (10, 11)
    assert rows["C1"] == 12  # insert drew from the mark
    marks = table.history(1)[0]["identityHighWaterMark"]
    assert marks == {"id": 12}
    # Next append continues above the merge's allocation.
    table.append(_batch(spark, ["d"]))
    assert max(r["id"] for r in table.read().collect()) == 13


def test_merge_cannot_assign_identity(spark, table):
    from delta_lake_platform_spark.sources.managed_table import MergeError

    table.append(_batch(spark, ["a"]))
    src = spark.createDataFrame([("z",)], "name string")
    with pytest.raises(MergeError, match="IDENTITY"):
        table.merge(
            src,
            _merge_clauses(
                "target.name = updates.name",
                insert={"name": "updates.name", "id": "99"},
            ),
        )

def test_merge_matched_update_cannot_assign_identity(spark, table):
    """WHEN MATCHED UPDATE SET on an identity column must be refused
    exactly like the insert clause — otherwise matched rows could all
    be reassigned the same id, breaking table-lifetime uniqueness."""
    from delta_lake_platform_spark.sources.managed_table import MergeError

    table.append(_batch(spark, ["a", "b"]))
    src = spark.createDataFrame([("a",)], "name string")
    with pytest.raises(MergeError, match="IDENTITY"):
        table.merge(
            src,
            _merge_clauses(
                "target.name = updates.name",
                update={"id": "0"},
            ),
        )


@pytest.mark.parametrize("rewrite", [True, False])
def test_update_cannot_assign_identity(spark, table, rewrite):
    table.append(_batch(spark, ["a", "b"]))
    with pytest.raises(ValueError, match="IDENTITY"):
        table.update({"id": "0"}, condition="name = 'a'", rewrite=rewrite)
    # Non-identity columns still update fine.
    table.update({"name": "'z'"}, condition="name = 'a'", rewrite=rewrite)
    ids = sorted(r["id"] for r in table.read().collect())
    assert ids == [10, 11]


def test_merge_noop_insert_records_no_hwm(spark, table):
    """A MERGE whose insert clause matched nothing allocated no ids —
    the commit must NOT carry identityHighWaterMark (which would flip
    concurrent blind appends into spurious conflicts)."""
    table.append(_batch(spark, ["a", "b"]))  # ids 10, 11
    src = spark.createDataFrame([("a", "A2")], "name string, newname string")
    table.merge(
        src,
        _merge_clauses(
            "target.name = updates.name",
            update={"name": "updates.newname"},
            insert={"name": "updates.newname"},  # every source row matches
        ),
    )
    entry = table.history(1)[0]
    assert entry["operationMetrics"]["numTargetRowsInserted"] == 0
    assert not entry.get("identityHighWaterMark")
    # And the mark itself is unchanged: next append mints 12.
    table.append(_batch(spark, ["c"]))
    assert max(r["id"] for r in table.read().collect()) == 12


def test_negative_identity_floor_survives_log_retention(
    spark, monkeypatch
):
    """Negative sequences: a zero/negative high-water mark is just as
    burned as a positive one — the expiry floor must persist it (a -1
    sentinel would drop it and re-mint deleted ids)."""
    from delta_lake_platform_spark.sources import managed_table as mt

    monkeypatch.setattr(mt, "_CKPT_INTERVAL", 2)
    d = tempfile.mkdtemp(prefix="ident_neg_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity_column("id", start=-100)
    t.append(_batch(spark, ["a", "b", "c"]))  # ids -100..-98, v1
    t.delete("id >= -99")  # burn -99/-98; only -100 lives, v2 (ckpt)
    t.compact()  # v3: mark-free commits push v1 below the horizon
    t.compact()  # v4 (ckpt)
    removed = t.expire_log_entries(older_than_s=0.0)
    assert removed, "test needs at least one expired entry"
    # The only mark-bearing entry (v1, mark -98) is gone; the floor
    # must carry it. Footer stats alone would say max=-100 and re-mint
    # the burned -99.
    assert t.identity_columns()["id"].get("floor") == -98
    t.append(_batch(spark, ["f"]))
    ids = sorted(r["id"] for r in t.read().collect())
    assert ids == [-100, -97], f"burned ids re-minted: {ids}"


# --- GENERATED BY DEFAULT AS IDENTITY (r11) ----------------------------------
#
# Delta's second identity mode: supplied values pass through, NULLs
# draw generated ids. Because _identity_hwm folds in the snapshot's
# footer-stats column max, user-supplied values advance the mark on
# the next allocation automatically — the realignment Delta needs an
# explicit ALTER TABLE ... SYNC IDENTITY for is inherent here.


@pytest.fixture()
def bydefault_table(spark):
    d = tempfile.mkdtemp(prefix="ident_bydef_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.createDataFrame([], "id bigint, name string"))
    t.set_identity_column("id", start=10, always=False)
    return t


def test_by_default_fills_nulls_and_passes_values(spark, bydefault_table):
    t = bydefault_table
    t.append(
        spark.createDataFrame(
            [(None, "a"), (500, "b"), (None, "c")], "id bigint, name string"
        )
    )
    rows = {r["name"]: r["id"] for r in t.read().collect()}
    assert rows["b"] == 500  # supplied value passed through
    # NULLs drew generated ids from the start mark
    assert {rows["a"], rows["c"]} <= {10, 11, 12}
    assert rows["a"] != rows["c"]


def test_by_default_supplied_peak_advances_mark(spark, bydefault_table):
    """A user-supplied peak enters the footer stats, so the NEXT
    allocation starts above it — no SYNC IDENTITY step needed."""
    t = bydefault_table
    t.append(
        spark.createDataFrame([(500, "big")], "id bigint, name string")
    )
    # batch without the column at all: plain generated path
    t.append(spark.createDataFrame([("x",)], "name string"))
    ids = {r["name"]: r["id"] for r in t.read().collect()}
    assert ids["big"] == 500
    assert ids["x"] > 500


def test_by_default_sql_roundtrip(spark):
    d = tempfile.mkdtemp(prefix="ident_bydef_sql_")
    sess = PlatformSQL(spark)
    sess.sql(
        f"""CREATE TABLE bd_accounts (
              account_key BIGINT GENERATED BY DEFAULT AS IDENTITY
                (START WITH 10 INCREMENT BY 2),
              name STRING
            ) LOCATION '{d}/t'"""
    )
    t = sess.tables["bd_accounts"]
    assert t.identity_columns() == {
        "account_key": {"start": 10, "step": 2, "always": False}
    }
    # supplying the key is ALLOWED in by-default mode
    sess.sql(
        "INSERT INTO bd_accounts (account_key, name) VALUES (1000, 'eve')"
    )
    sess.sql("INSERT INTO bd_accounts (name) VALUES ('gen')")
    got = {
        r["name"]: r["account_key"]
        for r in sess.sql("SELECT * FROM bd_accounts").collect()
    }
    assert got["eve"] == 1000
    assert got["gen"] > 1000 and (got["gen"] - 1000) % 2 == 0
    # SHOW CREATE round-trips the mode
    ddl = sess.sql("SHOW CREATE TABLE bd_accounts").collect()[0][0]
    assert "GENERATED BY DEFAULT AS IDENTITY (START WITH 10" in ddl


@pytest.mark.parametrize("rewrite", [True, False])
def test_merge_insert_by_default_respects_expression(
    spark, bydefault_table, rewrite
):
    """MERGE inserts into a BY DEFAULT identity column keep the insert
    expression's values and fill only its NULLs."""
    t = bydefault_table
    t.append(spark.createDataFrame([(None, "a")], "id bigint, name string"))
    src = spark.createDataFrame(
        [(700, "c"), (None, "d")], "want_id bigint, name string"
    )
    t.merge(
        src,
        _merge_clauses(
            "target.name = updates.name",
            insert={"id": "updates.want_id", "name": "updates.name"},
        ),
        rewrite=rewrite,
    )
    rows = {r["name"]: r["id"] for r in t.read().collect()}
    assert rows["c"] == 700
    assert rows["d"] is not None and rows["d"] != 700
    # next allocation clears the supplied peak via footer stats
    t.append(spark.createDataFrame([("e",)], "name string"))
    got = {r["name"]: r["id"] for r in t.read().collect()}
    assert got["e"] > 700
