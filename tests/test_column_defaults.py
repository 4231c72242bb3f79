"""Column DEFAULT values (Delta's defaultColumns writer feature):
batches that OMIT a defaulted column get the expression evaluated per
row at write time; supplied values always win; defaults never rewrite
existing data. DDL: CREATE coldef ``DEFAULT expr``, ``ALTER COLUMN c
SET/DROP DEFAULT``."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable


def _mk(spark, prefix="coldef_"):
    d = tempfile.mkdtemp(prefix=prefix)
    t = ManagedTable(spark, os.path.join(d, "t"))
    t.create(
        spark.createDataFrame(
            [(1, 10, "x")], "id long, v long, tag string"
        )
    )
    return d, t


def test_append_fills_omitted_default_supplied_wins(spark):
    d, t = _mk(spark)
    t.set_column_default("tag", "'pending'")
    t.set_column_default("v", "id * 2")  # row-level expr over the batch
    t.append(spark.createDataFrame([(5,)], "id long"))  # omits v, tag
    t.append(
        spark.createDataFrame([(6, 600, "own")], "id long, v long, tag string")
    )  # supplies everything: defaults must not touch it
    rows = {r.id: (r.v, r.tag) for r in t.read().collect()}
    assert rows[5] == (10, "pending")
    assert rows[6] == (600, "own")
    assert rows[1] == (10, "x")  # pre-default data untouched


def test_insert_into_partial_column_list_uses_default(spark):
    from delta_lake_platform_spark.sql import PlatformSQL

    d, t = _mk(spark)
    t.set_column_default("tag", "'filled'")
    sql = PlatformSQL(spark)
    sql.register("dft", t)
    sql.sql("INSERT INTO dft (id, v) VALUES (7, 70)")
    row = sql.sql("SELECT tag FROM dft WHERE id = 7").first()
    assert row.tag == "filled"


def test_default_ddl_roundtrip(spark):
    from delta_lake_platform_spark.sql import PlatformSQL

    d = tempfile.mkdtemp(prefix="coldef_sql_")
    sql = PlatformSQL(spark)
    sql.sql(
        f"CREATE TABLE dd (id BIGINT, status STRING DEFAULT 'new', "
        f"score DOUBLE DEFAULT 0.5 NOT NULL) LOCATION '{d}/dd'"
    )
    t = sql.tables["dd"]
    assert t.column_defaults() == {"status": "'new'", "score": "0.5"}
    sql.sql("INSERT INTO dd (id) VALUES (1)")
    row = sql.sql("SELECT * FROM dd").first()
    assert (row.status, row.score) == ("new", 0.5)
    sql.sql("ALTER TABLE dd ALTER COLUMN status SET DEFAULT 'queued'")
    sql.sql("INSERT INTO dd (id) VALUES (2)")
    assert sql.sql(
        "SELECT status FROM dd WHERE id = 2"
    ).first().status == "queued"
    sql.sql("ALTER TABLE dd ALTER COLUMN status DROP DEFAULT")
    assert "status" not in t.column_defaults()
    # With the default gone, an omitting insert must fail again.
    with pytest.raises(Exception, match="missing"):
        sql.sql("INSERT INTO dd (id) VALUES (3)")


def test_default_validations(spark):
    d, t = _mk(spark)
    with pytest.raises(ValueError, match="no column"):
        t.set_column_default("nope", "1")
    with pytest.raises(Exception):  # analysis failure surfaces at SET time
        t.set_column_default("v", "not_a_column + 1")
    t.set_identity_column("v")
    with pytest.raises(ValueError, match="IDENTITY"):
        t.set_column_default("v", "1")
    t.set_generated_column("tag", "'x'")
    with pytest.raises(ValueError, match="generated"):
        t.set_column_default("tag", "'y'")
    with pytest.raises(ValueError, match="no DEFAULT"):
        t.drop_column_default("id")


def test_create_or_replace_clears_defaults(spark):
    from delta_lake_platform_spark.sql import PlatformSQL

    d = tempfile.mkdtemp(prefix="coldef_cor_")
    sql = PlatformSQL(spark)
    sql.sql(
        f"CREATE TABLE cr LOCATION '{d}/cr' AS SELECT id FROM range(3)"
    )
    sql.tables["cr"].alter_add_column("s", "string")
    sql.tables["cr"].set_column_default("s", "'d'")
    sql.sql(
        f"CREATE OR REPLACE TABLE cr LOCATION '{d}/cr' AS "
        "SELECT id, CAST(NULL AS STRING) AS s FROM range(2)"
    )
    assert sql.tables["cr"].column_defaults() == {}


def test_clones_carry_defaults(spark):
    d, t = _mk(spark)
    t.set_column_default("tag", "'c'")
    for c in (t.deep_clone(f"{d}/deep"), t.clone(f"{d}/shallow")):
        assert c.column_defaults() == {"tag": "'c'"}
        c.append(spark.createDataFrame([(9, 90)], "id long, v long"))
        assert c.read().filter("id = 9").first().tag == "c"
