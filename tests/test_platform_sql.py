"""PlatformSQL: the SQL surface over ManagedTable (MERGE/UPDATE/DELETE
DML, DESCRIBE HISTORY/DETAIL, VACUUM, OPTIMIZE, RESTORE, VERSION/
TIMESTAMP AS OF time travel), reference entry point #3 (SURVEY.md §3:
spark.sql strings at scd_handler.py:71)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sql import PlatformSQL
from delta_lake_platform_spark.sources.managed_table import ManagedTable


@pytest.fixture()
def psql(spark):
    d = tempfile.mkdtemp(prefix="platform_sql_")
    t = ManagedTable(spark, f"{d}/accounts")
    t.create(
        spark.createDataFrame(
            [(1, "alice", 100), (2, "bob", 200), (3, "carol", 300)],
            "id long, name string, balance long",
        )
    )
    p = PlatformSQL(spark)
    p.register("accounts", t)
    return p


def test_select_and_time_travel(psql, spark):
    assert psql.sql("SELECT count(*) AS n FROM accounts").first().n == 3
    psql.sql("DELETE FROM accounts WHERE id = 2")
    assert psql.sql("SELECT count(*) AS n FROM accounts").first().n == 2
    got = psql.sql(
        "SELECT name FROM accounts VERSION AS OF 0 ORDER BY id"
    ).collect()
    assert [r.name for r in got] == ["alice", "bob", "carol"]


def test_timestamp_as_of(psql):
    import datetime

    psql.sql("DELETE FROM accounts WHERE id = 1")
    # A timestamp far in the future resolves to the latest commit.
    future = (
        datetime.datetime.now() + datetime.timedelta(days=1)
    ).isoformat()
    n = psql.sql(
        f"SELECT count(*) AS n FROM accounts TIMESTAMP AS OF '{future}'"
    ).first().n
    assert n == 2


def test_update_and_history(psql):
    out = psql.sql("UPDATE accounts SET balance = balance + 10 WHERE id <= 2")
    assert out.first().numUpdatedRows == 2
    got = psql.sql("SELECT balance FROM accounts ORDER BY id").collect()
    assert [r.balance for r in got] == [110, 210, 300]
    h = psql.sql("DESCRIBE HISTORY accounts").collect()
    assert [r.operation for r in h][0] == "UPDATE"
    assert len(h) == 2


def test_merge_update_delete_insert(psql, spark):
    spark.createDataFrame(
        [(2, "bob2", 999), (3, "carol", -1), (4, "dave", 400)],
        "id long, name string, balance long",
    ).createOrReplaceTempView("changes")
    out = psql.sql(
        """
        MERGE INTO accounts AS a USING changes AS c
        ON a.id = c.id
        WHEN MATCHED AND c.balance < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET name = c.name, balance = c.balance
        WHEN NOT MATCHED THEN INSERT (id, name, balance) VALUES (c.id, c.name, c.balance)
        """
    ).first()
    assert (out.numTargetRowsUpdated, out.numTargetRowsDeleted,
            out.numTargetRowsInserted) == (1, 1, 1)
    got = psql.sql("SELECT * FROM accounts ORDER BY id").collect()
    assert [(r.id, r.name, r.balance) for r in got] == [
        (1, "alice", 100), (2, "bob2", 999), (4, "dave", 400),
    ]


def test_merge_star_clauses(psql, spark):
    spark.createDataFrame(
        [(3, "carol3", 333), (5, "eve", 500)],
        "id long, name string, balance long",
    ).createOrReplaceTempView("changes2")
    psql.sql(
        "MERGE INTO accounts t USING changes2 s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = psql.sql("SELECT name FROM accounts ORDER BY id").collect()
    assert [r.name for r in got] == ["alice", "bob", "carol3", "eve"]


def test_optimize_restore_vacuum_detail(psql):
    # `id < 2` (not a bare equality/IN) bypasses the metadata-only
    # delete shortcut, so v1 is a genuine COW rewrite — the dead data
    # this test wants VACUUM to reclaim.
    psql.sql("DELETE FROM accounts WHERE id < 2")        # v1
    psql.sql("OPTIMIZE accounts")                        # v2
    assert psql.sql("SELECT count(*) AS n FROM accounts").first().n == 2
    psql.sql("RESTORE accounts TO VERSION AS OF 0")      # v3
    assert psql.sql("SELECT count(*) AS n FROM accounts").first().n == 3
    d = psql.sql("DESCRIBE DETAIL accounts").first()
    assert d.version == 3 and d.lastOperation == "RESTORE"
    # RESTORE is metadata-only: v3 re-references v0's files, so VACUUM
    # must NOT reclaim v0's data even though its version is past the
    # retention horizon (Delta's live-file rule). Only v1's rewrite is
    # actually dead.
    removed = psql.sql("VACUUM accounts KEEP LAST 2").first().removedVersions
    assert removed == "[1]"
    # v0's snapshot is still readable — its files are the live head.
    assert psql.sql("SELECT count(*) AS n FROM accounts VERSION AS OF 0").first().n == 3
    assert psql.sql("SELECT count(*) AS n FROM accounts VERSION AS OF 2").first().n == 2


def test_zorder_via_sql(psql, spark):
    big = spark.range(0, 512).select(
        F.col("id"), (F.col("id") % 16).alias("name"),
        (F.col("id") % 7).alias("balance"),
    ).select("id", F.col("name").cast("string").alias("name"), "balance")
    psql.tables["accounts"].overwrite(big)
    out = psql.sql("OPTIMIZE accounts ZORDER BY (id, balance)").first()
    assert out.operation == "OPTIMIZE_ZORDER"
    assert psql.sql("SELECT count(*) AS n FROM accounts").first().n == 512


def test_optimize_where_via_sql(psql, spark):
    big = spark.range(0, 512).select(
        "id",
        F.col("id").cast("string").alias("name"),
        (F.col("id") % 7).alias("balance"),
    ).repartitionByRange(8, "id")
    psql.tables["accounts"].overwrite(big, overwrite_schema=True)
    before = psql.sql("SELECT count(*) AS n FROM accounts").first().n
    out = psql.sql("OPTIMIZE accounts WHERE id < 64").first()
    assert out.operation == "OPTIMIZE WHERE"
    t = psql.tables["accounts"]
    m = t.history(1)[0]["operationMetrics"]
    assert m["numRewrittenFiles"] <= 2
    assert m["numKeptFiles"] >= 6
    assert psql.sql("SELECT count(*) AS n FROM accounts").first().n == before


def test_plain_sql_passthrough(psql, spark):
    spark.createDataFrame([(1, "x")], "id long, tag string").createOrReplaceTempView(
        "tags"
    )
    got = psql.sql(
        "SELECT a.name, t.tag FROM accounts a JOIN tags t ON a.id = t.id"
    ).collect()
    assert [(r.name, r.tag) for r in got] == [("alice", "x")]


def test_create_table_as_insert_into_show_partitions(psql, spark):
    import tempfile as _tf

    d = _tf.mkdtemp(prefix="psql_ctas_")
    out = psql.sql(
        f"CREATE TABLE rich LOCATION '{d}/rich' PARTITIONED BY (name) AS "
        "SELECT id, name, balance FROM accounts WHERE balance >= 200"
    ).first()
    assert out.version == 0
    assert psql.sql("SELECT count(*) AS n FROM rich").first().n == 2

    psql.sql("INSERT INTO rich (id, name, balance) VALUES (9, 'zed', 900)")
    psql.sql(
        "INSERT INTO rich (id, name, balance) "
        "SELECT id, name, balance FROM accounts WHERE id = 1"
    )
    got = psql.sql("SELECT name FROM rich ORDER BY id").collect()
    assert [r.name for r in got] == ["alice", "bob", "carol", "zed"]

    parts = psql.sql("SHOW PARTITIONS rich").collect()
    assert [r.name for r in parts] == ["alice", "bob", "carol", "zed"]


def test_tblproperties_enable_dv_via_sql(psql):
    psql.sql(
        "ALTER TABLE accounts SET TBLPROPERTIES "
        "('enableDeletionVectors' = 'true')"
    )
    # A range predicate bypasses the metadata-only shortcut (which
    # would legitimately preempt the DV on a whole-file equality
    # delete), so the property's DV routing is what's exercised.
    psql.sql("DELETE FROM accounts WHERE id > 2")
    h = psql.sql("DESCRIBE HISTORY accounts").first()
    assert h.operation == "DELETE (DV)"
    assert psql.sql("SELECT count(*) AS n FROM accounts").first().n == 2


def test_metadata_delete_preempts_dv_on_whole_file_equality(psql):
    """With DVs enabled, a bare-equality delete whose files are all
    provably pure or excluded is STILL metadata-only (pure REMOVE
    actions beat a DV sidecar: zero data read or written)."""
    psql.sql(
        "ALTER TABLE accounts SET TBLPROPERTIES "
        "('enableDeletionVectors' = 'true')"
    )
    psql.sql("DELETE FROM accounts WHERE id = 2")
    h = psql.sql("DESCRIBE HISTORY accounts").first()
    assert h.operation == "DELETE"
    assert '"numDeletedRows": 1' in h.operationMetrics
    assert psql.sql("SELECT count(*) AS n FROM accounts").first().n == 2


def test_sql_alter_column_and_copy_into(spark):
    import os
    import tempfile

    from delta_lake_platform_spark.sql import PlatformSQL
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="sql_ddl_")
    psql = PlatformSQL(spark)
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(3).selectExpr("id", "id * 2 as v"))
    psql.register("t", t)

    psql.sql("ALTER TABLE t ADD COLUMN (w string)")
    assert t.read().columns == ["id", "v", "w"]
    psql.sql("ALTER TABLE t RENAME COLUMN w TO label")
    assert "label" in t.read().columns
    psql.sql("ALTER TABLE t DROP COLUMN label")
    assert t.read().columns == ["id", "v"]

    src = os.path.join(d, "incoming")
    os.makedirs(src)
    spark.range(2).selectExpr("id + 100 as id", "id as v").write.parquet(
        os.path.join(src, "b1.parquet")
    )
    out = psql.sql(f"COPY INTO t FROM '{src}'").collect()[0]
    assert t.read().count() == 5
    # idempotent: second run loads nothing
    psql.sql(f"COPY INTO t FROM '{src}'")
    assert t.read().count() == 5


def test_materialized_view_via_sql(psql, spark):
    big = spark.range(0, 400).select(
        "id",
        F.col("id").cast("string").alias("name"),
        (F.col("id") % 5).alias("balance"),
    )
    psql.tables["accounts"].overwrite(big, overwrite_schema=True)
    out = psql.sql(
        "CREATE MATERIALIZED VIEW acct_mv LOCATION "
        f"'{psql.tables['accounts'].path}_mv' AS "
        "SELECT balance, COUNT(*) AS n_rows, SUM(id) AS sum_id "
        "FROM accounts GROUP BY balance"
    ).first()
    assert out.version == 0
    psql.sql("DELETE FROM accounts WHERE id % 7 = 0")
    psql.sql("REFRESH MATERIALIZED VIEW acct_mv")
    got = {
        r.balance: (r.n_rows, r.sum_id)
        for r in psql.sql(
            "SELECT balance, n_rows, sum_id FROM acct_mv ORDER BY balance"
        ).collect()
    }
    want = {
        r.balance: (r.n, r.s)
        for r in psql.sql(
            "SELECT balance, count(*) AS n, sum(id) AS s "
            "FROM accounts GROUP BY balance ORDER BY balance"
        ).collect()
    }
    assert got == want

    with pytest.raises(ValueError, match="supports group cols"):
        psql.sql(
            "CREATE MATERIALIZED VIEW bad LOCATION '/tmp/x' AS "
            "SELECT balance, MAX(id) AS m FROM accounts GROUP BY balance"
        )


def test_refresh_unknown_view_and_reattach(psql, spark):
    """ADVICE r3: REFRESH of an unknown view gives a descriptive error
    (not a bare KeyError), and a view created by one session can be
    re-attached by another from the `_mv.json` persisted beside its
    state table."""
    with pytest.raises(ValueError, match="unknown materialized view"):
        psql.sql("REFRESH MATERIALIZED VIEW nope")

    big = spark.range(0, 100).select(
        "id",
        F.col("id").cast("string").alias("name"),
        (F.col("id") % 3).alias("balance"),
    )
    psql.tables["accounts"].overwrite(big, overwrite_schema=True)
    loc = f"{psql.tables['accounts'].path}_mv2"
    psql.sql(
        f"CREATE MATERIALIZED VIEW mv2 LOCATION '{loc}' AS "
        "SELECT balance, COUNT(*) AS n_rows, SUM(id) AS sum_id "
        "FROM accounts GROUP BY balance"
    )
    psql.sql("DELETE FROM accounts WHERE id % 10 = 0")

    # Fresh session: registry is empty; re-attach from disk + refresh.
    p2 = PlatformSQL(spark)
    p2.register("accounts", psql.tables["accounts"])
    p2.sql(f"ATTACH MATERIALIZED VIEW mv2 LOCATION '{loc}'")
    p2.sql("REFRESH MATERIALIZED VIEW mv2")
    got = {
        r.balance: (r.n_rows, r.sum_id)
        for r in p2.sql("SELECT balance, n_rows, sum_id FROM mv2").collect()
    }
    want = {
        r.balance: (r.n, r.s)
        for r in p2.sql(
            "SELECT balance, count(*) AS n, sum(id) AS s "
            "FROM accounts GROUP BY balance"
        ).collect()
    }
    assert got == want


def test_count_star_is_metadata_only(psql, spark, monkeypatch):
    """A bare COUNT(*) on a managed table is answered from the commit
    log's row accounting — proven by poisoning the scan path: the
    count still returns correctly with reads disabled, tracks DML
    arithmetically, and supports time travel. Any WHERE falls through
    to the real scan."""
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    t = psql.tables["accounts"]
    t.append(
        spark.createDataFrame([(7, "dora", 50)], "id long, name string, balance long"),
        fast=True,
    )
    psql.sql("DELETE FROM accounts WHERE id = 1")
    expect = t.read().count()

    def poisoned(self, version=None):
        raise AssertionError("COUNT(*) fell back to a scan")

    monkeypatch.setattr(ManagedTable, "read", poisoned)
    assert psql.sql("SELECT COUNT(*) FROM accounts").first()[0] == expect
    assert psql.sql("SELECT COUNT(*) AS n FROM accounts").first().n == expect
    # Time travel: the pre-delete version's count, still scan-free.
    v = t.latest_version() - 1
    assert (
        psql.sql(f"SELECT COUNT(*) AS n FROM accounts VERSION AS OF {v}").first().n
        == expect + 1
    )
    monkeypatch.undo()
    # Predicated counts use the real engine.
    assert (
        psql.sql("SELECT COUNT(*) AS n FROM accounts WHERE balance > 100").first().n
        == t.read().filter("balance > 100").count()
    )


def test_minmax_materialized_view_via_sql(psql, spark):
    """r5: MIN/MAX aggregates in the SQL MV shape — maintained with the
    dirty-group rule, persisted (minmaxCols) for re-attach."""
    big = spark.range(0, 300).select(
        "id",
        F.col("id").cast("string").alias("name"),
        (F.col("id") % 4).alias("balance"),
    )
    psql.tables["accounts"].overwrite(big, overwrite_schema=True)
    path = f"{psql.tables['accounts'].path}_mmv"
    psql.sql(
        "CREATE MATERIALIZED VIEW acct_mm LOCATION "
        f"'{path}' AS "
        "SELECT balance, COUNT(*) AS n_rows, MIN(id) AS min_id, "
        "MAX(id) AS max_id FROM accounts GROUP BY balance"
    )
    # Delete every group's maximum (ids 296..299) -> dirty recompute.
    psql.sql("DELETE FROM accounts WHERE id >= 296")
    psql.sql("REFRESH MATERIALIZED VIEW acct_mm")
    got = {
        r.balance: (r.n_rows, r.min_id, r.max_id)
        for r in psql.sql(
            "SELECT balance, n_rows, min_id, max_id FROM acct_mm"
        ).collect()
    }
    want = {
        r.balance: (r.n, r.lo, r.hi)
        for r in psql.sql(
            "SELECT balance, count(*) AS n, min(id) AS lo, max(id) AS hi "
            "FROM accounts GROUP BY balance"
        ).collect()
    }
    assert got == want
    # Re-attach from the persisted definition restores minmax support.
    from delta_lake_platform_spark.sql import PlatformSQL

    fresh = PlatformSQL(spark)
    fresh.register("accounts", psql.tables["accounts"])
    fresh.attach_materialized_view("acct_mm", path)
    assert fresh._views["acct_mm"].minmax_cols == ["id"]


def test_constraint_ddl_via_sql(psql, spark):
    """r5: ALTER TABLE ADD/DROP CONSTRAINT in the dialect — routed to
    the same CHECK machinery the Python API uses."""
    t = psql.tables["accounts"]
    psql.sql("ALTER TABLE accounts ADD CONSTRAINT bal_nonneg CHECK (balance >= 0)")
    assert "bal_nonneg" in t.constraints()
    with pytest.raises(Exception):  # violating batch rejected
        t.append(
            spark.createDataFrame(
                [(999, "x", -5)], "id long, name string, balance long"
            )
        )
    # Adding a constraint the CURRENT data violates must fail upfront.
    with pytest.raises(Exception):
        psql.sql(
            "ALTER TABLE accounts ADD CONSTRAINT impossible CHECK (balance > 1000000)"
        )
    assert "impossible" not in t.constraints()
    psql.sql("ALTER TABLE accounts DROP CONSTRAINT bal_nonneg")
    assert "bal_nonneg" not in t.constraints()
    with pytest.raises(ValueError, match="no constraint"):
        psql.sql("ALTER TABLE accounts DROP CONSTRAINT nope")


def test_show_tblproperties_and_create_table(spark):
    import tempfile

    from delta_lake_platform_spark.sql import PlatformSQL

    d = tempfile.mkdtemp(prefix="show_sql_")
    p = PlatformSQL(spark)
    p.sql(
        f"""CREATE TABLE acct (
              account_key BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10),
              cents BIGINT,
              dollars DOUBLE GENERATED ALWAYS AS (cents / 100.0)
            ) LOCATION '{d}/acct'"""
    )
    p.sql("ALTER TABLE acct SET TBLPROPERTIES (enableDeletionVectors = true)")
    # A value with commas/spaces MUST survive the round trip — exactly
    # the shape bloomFilterColumns takes for a multi-column index.
    p.sql(
        "ALTER TABLE acct SET TBLPROPERTIES "
        "(bloomFilterColumns = 'account_key,cents')"
    )
    p.sql("ALTER TABLE acct ADD CONSTRAINT nonneg CHECK (cents >= 0)")

    props = {r["key"]: r["value"] for r in p.sql("SHOW TBLPROPERTIES acct").collect()}
    assert props == {
        "enableDeletionVectors": "true",
        "bloomFilterColumns": "account_key,cents",
    }

    ddl = p.sql("SHOW CREATE TABLE acct").first()["createtab_stmt"]
    assert "account_key BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 1)" in ddl
    assert "dollars DOUBLE GENERATED ALWAYS AS (cents / 100.0)" in ddl
    assert f"LOCATION '{d}/acct'" in ddl
    assert "ADD CONSTRAINT nonneg CHECK (cents >= 0)" in ddl
    assert "SET TBLPROPERTIES (enableDeletionVectors = 'true')" in ddl
    assert "SET TBLPROPERTIES (bloomFilterColumns = 'account_key,cents')" in ddl

    # Round-trip: replaying the DDL (new name/location) yields the same
    # contract surfaces.
    replay = ddl.replace("acct", "acct2").replace(f"{d}/acct", f"{d}/acct2")
    for stmt in replay.split(";\n"):
        p.sql(stmt)
    t2 = p.tables["acct2"]
    assert t2.identity_columns() == {
        "account_key": {"start": 10, "step": 1, "always": True}
    }
    assert t2.generated_columns() == {"dollars": "cents / 100.0"}
    assert t2.constraints() == {"nonneg": "cents >= 0"}
    assert t2.properties() == {
        "enableDeletionVectors": "true",
        "bloomFilterColumns": "account_key,cents",
    }


def test_vacuum_dry_run(spark):
    import json as _json
    import tempfile

    from delta_lake_platform_spark.sql import PlatformSQL
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="vac_dry_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(10).selectExpr("id", "id * 2 as v"))
    for i in range(3):
        t.append(spark.range(i * 10, i * 10 + 5).selectExpr("id", "id * 2 as v"))
    p = PlatformSQL(spark)
    p.register("t", t)
    row = p.sql("VACUUM t KEEP LAST 2 DRY RUN").first()
    assert row["dryRun"] is True
    would = _json.loads(row["removedVersions"])
    # Fast-append chain: every old batch dir is still referenced by the
    # retained head, so a real run would reclaim nothing — and the dry
    # run must say so (it applies the same reference analysis).
    assert would == []
    for v in range(4):
        assert t.read(v).count() > 0

    # A full-snapshot OVERWRITE makes the old dirs reclaimable; the dry
    # run now predicts exactly what the real vacuum then removes — and
    # still deletes nothing itself.
    t.overwrite(t.read())
    row = p.sql("VACUUM t KEEP LAST 1 DRY RUN").first()
    would = _json.loads(row["removedVersions"])
    assert would != []
    for v in range(5):
        assert t.read(v).count() > 0  # dry run deleted nothing
    row2 = p.sql("VACUUM t KEEP LAST 1").first()
    assert _json.loads(row2["removedVersions"]) == would


def test_show_tblproperties_empty(spark):
    import tempfile

    from delta_lake_platform_spark.sql import PlatformSQL
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="show_empty_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(3).selectExpr("id"))
    p = PlatformSQL(spark)
    p.register("t", t)
    out = p.sql("SHOW TBLPROPERTIES t")
    assert out.columns == ["key", "value"] and out.count() == 0


def test_sql_shallow_clone(spark):
    import tempfile

    from delta_lake_platform_spark.sql import PlatformSQL

    d = tempfile.mkdtemp(prefix="sql_clone_")
    p = PlatformSQL(spark)
    p.sql(
        f"CREATE TABLE src LOCATION '{d}/src' AS "
        "SELECT * FROM VALUES (1, 'a'), (2, 'b') AS t(k, s)"
    )
    p.sql(f"CREATE TABLE dst SHALLOW CLONE src LOCATION '{d}/dst'")
    assert p.sql("SELECT COUNT(*) AS n FROM dst").first()["n"] == 2
    # Copy-on-write divergence: writes to the clone never touch src.
    p.sql("DELETE FROM dst WHERE k = 1")
    assert p.sql("SELECT COUNT(*) AS n FROM dst").first()["n"] == 1
    assert p.sql("SELECT COUNT(*) AS n FROM src").first()["n"] == 2


def test_sql_table_changes_and_history_limit(spark):
    import tempfile

    from delta_lake_platform_spark.sql import PlatformSQL
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="sql_tc_")
    p = PlatformSQL(spark)
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, s string"
    ))
    p.register("t", t)
    p.sql("DELETE FROM t WHERE k = 2")              # v1
    p.sql("INSERT INTO t (k, s) VALUES (4, 'd')")   # v2

    # Delta semantics: the start version is INCLUSIVE — commit 1's own
    # delete is part of table_changes('t', 1, ...).
    rows = p.sql(
        "SELECT _change_type, k FROM table_changes('t', 1, 2) ORDER BY k"
    ).collect()
    assert [(r._change_type, r.k) for r in rows] == [
        ("delete", 2), ("insert", 4),
    ]
    # Open-ended form runs to the head; aggregation over it works.
    n = p.sql(
        "SELECT COUNT(*) AS n FROM table_changes('t', 2)"
    ).first()["n"]
    assert n == 1  # just commit 2's insert of k=4
    # Version 0 is the initial snapshot, not a change.
    with pytest.raises(ValueError, match="start version"):
        p.sql("SELECT * FROM table_changes('t', 0)")

    h = p.sql("DESCRIBE HISTORY t LIMIT 2").collect()
    assert len(h) == 2
    assert h[0]["operation"] in ("APPEND", "WRITE")  # newest first


def test_restore_timestamp_as_of(psql):
    import datetime

    psql.sql("DELETE FROM accounts WHERE id = 1")  # v1
    future = (
        datetime.datetime.now() + datetime.timedelta(days=1)
    ).isoformat()
    # Future timestamp resolves to the latest commit (v1) — restoring
    # to it is a no-op content-wise but still a real commit.
    psql.sql(f"RESTORE accounts TO TIMESTAMP AS OF '{future}'")
    assert psql.sql("SELECT count(*) AS n FROM accounts").first().n == 2
    # Restore to before the delete via a pre-delete timestamp: use the
    # v0 commit's own timestamp.
    h = psql.tables["accounts"].history()
    t0, t1 = h[-1]["timestamp"], h[-2]["timestamp"]  # v0 (create), v1
    # Midpoint between the two commits: strictly after v0 regardless of
    # isoformat truncation, strictly before the delete regardless of
    # how fast the commits landed.
    ts0 = datetime.datetime.utcfromtimestamp((t0 + t1) / 2).isoformat()
    psql.sql(f"RESTORE accounts TO TIMESTAMP AS OF '{ts0}'")
    assert psql.sql("SELECT count(*) AS n FROM accounts").first().n == 3


def test_table_changes_timestamp_forms(psql):
    import datetime

    psql.sql("DELETE FROM accounts WHERE id = 1")        # v1
    psql.sql("INSERT INTO accounts VALUES (4, 'dave', 400)")  # v2
    h = psql.tables["accounts"].history()
    ts = {e["version"]: e["timestamp"] for e in h}
    mid01 = datetime.datetime.utcfromtimestamp(
        (ts[0] + ts[1]) / 2
    ).isoformat()
    mid12 = datetime.datetime.utcfromtimestamp(
        (ts[1] + ts[2]) / 2
    ).isoformat()
    # Start timestamp -> earliest commit at-or-after it (v1..head).
    got = psql.sql(
        f"SELECT _change_type, id FROM table_changes('accounts', '{mid01}') "
        "ORDER BY id"
    ).collect()
    assert [(r._change_type, r.id) for r in got] == [
        ("delete", 1),
        ("insert", 4),
    ]
    # Two timestamps: inclusive window v1..v1.
    got = psql.sql(
        "SELECT _change_type, id FROM "
        f"table_changes('accounts', '{mid01}', '{mid12}') ORDER BY id"
    ).collect()
    assert [(r._change_type, r.id) for r in got] == [("delete", 1)]
    # A start past the head raises with a clear message.
    future = (
        datetime.datetime.now() + datetime.timedelta(days=1)
    ).isoformat()
    with pytest.raises(ValueError, match="at or after"):
        psql.sql(f"SELECT * FROM table_changes('accounts', '{future}')")


def test_describe_table(psql, spark):
    rows = {r.col_name: r for r in psql.sql("DESCRIBE TABLE accounts").collect()}
    assert set(rows) == {"id", "name", "balance"}
    assert rows["id"].data_type == "bigint"
    # Partition / cluster tags surface in the comment column.
    import tempfile

    d = tempfile.mkdtemp(prefix="desc_sql_")
    psql.sql(
        f"CREATE TABLE dt LOCATION '{d}/dt' PARTITIONED BY (p) AS "
        "SELECT id, id % 4 AS p FROM range(40)"
    )
    psql.sql("ALTER TABLE dt CLUSTER BY (id)")
    rows = {r.col_name: r for r in psql.sql("DESCRIBE dt").collect()}
    assert rows["p"].comment == "partition"
    assert rows["id"].comment == "cluster"


def test_create_or_replace_and_truncate(psql):
    import tempfile

    d = tempfile.mkdtemp(prefix="cor_sql_")
    psql.sql(
        f"CREATE TABLE rep LOCATION '{d}/rep' AS "
        "SELECT id, id * 2 AS v FROM range(10)"
    )
    # REPLACE: new shape, forward-written — version 0 still readable.
    psql.sql(
        f"CREATE OR REPLACE TABLE rep LOCATION '{d}/rep' AS "
        "SELECT id, CAST(id AS STRING) AS s FROM range(4)"
    )
    assert psql.sql("SELECT count(*) AS n FROM rep").first().n == 4
    assert psql.tables["rep"].read().columns == ["id", "s"]
    assert psql.sql(
        "SELECT count(*) AS n FROM rep VERSION AS OF 0"
    ).first().n == 10
    out = psql.sql("TRUNCATE TABLE rep").first()
    assert out.numRemovedRows == 4
    assert psql.sql("SELECT count(*) AS n FROM rep").first().n == 0
    # History intact: the pre-truncate snapshot still reads.
    assert psql.sql(
        "SELECT count(*) AS n FROM rep VERSION AS OF 1"
    ).first().n == 4


def test_not_null_constraint_sugar(psql, spark):
    psql.sql("ALTER TABLE accounts ALTER COLUMN name SET NOT NULL")
    t = psql.tables["accounts"]
    assert t.constraints()["name_not_null"] == "name IS NOT NULL"
    with pytest.raises(Exception):
        t.append(
            spark.createDataFrame(
                [(9, None, 0)], "id long, name string, balance long"
            )
        )
    psql.sql("ALTER TABLE accounts ALTER COLUMN name DROP NOT NULL")
    assert "name_not_null" not in t.constraints()
    # Setting NOT NULL on a column with existing NULLs fails upfront.
    t.append(
        spark.createDataFrame(
            [(9, None, 0)], "id long, name string, balance long"
        )
    )
    with pytest.raises(Exception):
        psql.sql("ALTER TABLE accounts ALTER COLUMN name SET NOT NULL")


def test_create_table_not_null_coldef(psql, spark):
    import tempfile

    d = tempfile.mkdtemp(prefix="nn_sql_")
    psql.sql(
        f"CREATE TABLE nn (id BIGINT NOT NULL, v STRING) "
        f"LOCATION '{d}/nn'"
    )
    t = psql.tables["nn"]
    assert t.constraints()["id_not_null"] == "id IS NOT NULL"
    psql.sql("INSERT INTO nn VALUES (1, 'a')")
    with pytest.raises(Exception):
        t.append(
            spark.createDataFrame([(None, "x")], "id bigint, v string")
        )
    assert psql.sql("SELECT count(*) AS n FROM nn").first().n == 1


def test_create_or_replace_resets_table_metadata(psql, spark):
    """Delta's CREATE OR REPLACE resets table metadata to the NEW
    definition: an omitted CLUSTER BY clears the old clustering spec,
    and constraints / identity / generated specs not re-declared do
    not survive the replace."""
    import tempfile

    d = tempfile.mkdtemp(prefix="cor_reset_")
    psql.sql(
        f"CREATE TABLE rmeta LOCATION '{d}/rmeta' "
        "CLUSTER BY (id) AS SELECT id, id * 2 AS v FROM range(10)"
    )
    t = psql.tables["rmeta"]
    t.add_constraint("v_pos", "v >= 0")
    t.set_generated_column("v", "id * 2")
    assert t.properties().get("clusterBy") == "id"
    psql.sql(
        f"CREATE OR REPLACE TABLE rmeta LOCATION '{d}/rmeta' AS "
        "SELECT id, CAST(-1 AS BIGINT) AS v FROM range(3)"
    )
    assert t.properties().get("clusterBy") is None
    assert t.constraints() == {}
    assert t.generated_columns() == {}
    assert t.identity_columns() == {}
    # The old specs are really gone: rows violating them now commit.
    t.append(spark.createDataFrame([(99, -5)], "id long, v long"))
    assert t.read().filter("v = -5").count() == 1
    # A re-declared CLUSTER BY survives the reset.
    psql.sql(
        f"CREATE OR REPLACE TABLE rmeta LOCATION '{d}/rmeta' "
        "CLUSTER BY (id) AS SELECT id, id * 2 AS v FROM range(3)"
    )
    assert t.properties().get("clusterBy") == "id"


def test_timestamp_as_of_honors_explicit_offset(psql):
    """A tz-aware TIMESTAMP AS OF must be interpreted at its OWN
    offset: '...T10:00+02:00' is 08:00 UTC. Overwriting the offset
    with UTC resolves a version 2 hours off."""
    from delta_lake_platform_spark.sources.managed_table import (
        iso_to_epoch_utc,
    )

    assert iso_to_epoch_utc("2026-08-15T10:00:00+02:00") == iso_to_epoch_utc(
        "2026-08-15T08:00:00"
    )
    assert iso_to_epoch_utc("2026-08-15T08:00:00") == iso_to_epoch_utc(
        "2026-08-15T08:00:00+00:00"
    )
    # End to end: pick the cutoff between v0 and v1 expressed at +02:00;
    # naive-as-UTC parsing of the same instant must agree.
    import datetime as dt

    t = psql.tables["accounts"]
    v0_ts = t.history()[-1]["timestamp"]
    t.append(
        psql.spark.createDataFrame([(7, "g", 5)],
                                   "id long, name string, balance long")
    )
    v1_ts = t.history(1)[0]["timestamp"]
    cutoff = (v0_ts + v1_ts) / 2
    aware = dt.datetime.fromtimestamp(
        cutoff, dt.timezone(dt.timedelta(hours=2))
    ).isoformat()
    assert "+02:00" in aware
    assert psql._version_at_timestamp("accounts", aware) == 0
    assert psql._earliest_version_at_or_after("accounts", aware) == 1


def test_approx_distinct_materialized_view_via_sql(psql, spark):
    """r9: APPROX_COUNT_DISTINCT in the SQL MV shape — stored HLL
    sketch maintained through the dirty-group rule, persisted
    (approxDistinctCols) for re-attach."""
    big = spark.range(0, 300).select(
        "id",
        F.col("id").cast("string").alias("name"),
        (F.col("id") % 4).alias("balance"),
    ).withColumn("owner", F.col("id") % 37)
    psql.tables["accounts"].overwrite(big, overwrite_schema=True)
    path = f"{psql.tables['accounts'].path}_hllv"
    psql.sql(
        "CREATE MATERIALIZED VIEW acct_hll LOCATION "
        f"'{path}' AS "
        "SELECT balance, COUNT(*) AS n_rows, "
        "APPROX_COUNT_DISTINCT(owner) AS approx_distinct_owner "
        "FROM accounts GROUP BY balance"
    )
    psql.sql("DELETE FROM accounts WHERE id % 37 = 5")  # drops owner 5
    psql.sql("REFRESH MATERIALIZED VIEW acct_hll")
    got = {
        r.balance: (r.n_rows, r.approx_distinct_owner)
        for r in psql.sql(
            "SELECT balance, n_rows, approx_distinct_owner FROM acct_hll"
        ).collect()
    }
    want = {
        r.balance: (r.n, r.d)
        for r in psql.sql(
            "SELECT balance, count(*) AS n, "
            "count(DISTINCT owner) AS d "
            "FROM accounts GROUP BY balance"
        ).collect()
    }
    assert got == want  # lg_k default is exact at 37 distinct owners
    from delta_lake_platform_spark.sql import PlatformSQL

    fresh = PlatformSQL(spark)
    fresh.register("accounts", psql.tables["accounts"])
    fresh.attach_materialized_view("acct_hll", path)
    assert fresh._views["acct_hll"].approx_distinct_cols == ["owner"]


# --- INSERT OVERWRITE / INSERT INTO ... REPLACE WHERE (r9) -------------------

def test_insert_overwrite_and_replace_where(spark, tmp_path):
    from delta_lake_platform_spark.sources.managed_table import ManagedTable
    from delta_lake_platform_spark.sql import PlatformSQL

    p = PlatformSQL(spark)
    t = ManagedTable(spark, str(tmp_path / "iow"))
    t.create(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
            "k long, part string, v long",
        )
    )
    p.register("iow", t)
    # slice reload: replace only part='a' rows, keep part='b'
    p.sql(
        "INSERT INTO iow REPLACE WHERE part = 'a' "
        "VALUES (10, 'a', 100), (11, 'a', 110)"
    )
    rows = {r.k: (r.part, r.v) for r in t.read().collect()}
    assert rows == {3: ("b", 30), 10: ("a", 100), 11: ("a", 110)}
    # validation: a row NOT matching the predicate is refused
    import pytest as _pytest

    with _pytest.raises(Exception, match="(?i)match|predicate|replace"):
        p.sql(
            "INSERT INTO iow REPLACE WHERE part = 'a' "
            "VALUES (12, 'b', 120)"
        )
    # full overwrite: new snapshot, history keeps the old one
    v = t.latest_version()
    p.sql("INSERT OVERWRITE iow VALUES (99, 'z', 999)")
    assert [tuple(r) for r in t.read().collect()] == [(99, "z", 999)]
    assert t.read(v).count() == 3  # time travel intact
