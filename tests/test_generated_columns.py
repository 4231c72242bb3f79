"""GENERATED ALWAYS AS (expr) columns: computed on append/COPY INTO
when absent, verified as an implicit CHECK when present (same single
constraint job every write path already runs), and RENAME/DROP of a
source column is refused while a generated column depends on it."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.sql import PlatformSQL


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="gen_table_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(
        spark.createDataFrame(
            [(1, 10, 11)], "k bigint, v bigint, v_plus bigint"
        )
    )
    t.set_generated_column("v_plus", "v + k")
    return t


def test_generated_fill_on_append(spark, table):
    table.append(spark.createDataFrame([(2, 20), (3, 30)], "k bigint, v bigint"))
    got = {r["k"]: r["v_plus"] for r in table.read().collect()}
    assert got == {1: 11, 2: 22, 3: 33}


def test_generated_supplied_correct_passes_wrong_fails(spark, table):
    table.append(
        spark.createDataFrame([(4, 40, 44)], "k bigint, v bigint, v_plus bigint")
    )
    assert table.read().filter("k = 4").first()["v_plus"] == 44
    with pytest.raises(ValueError, match="generated"):
        table.append(
            spark.createDataFrame(
                [(5, 50, 999)], "k bigint, v bigint, v_plus bigint"
            )
        )


def test_generated_update_breaking_invariant_fails(spark, table):
    with pytest.raises(ValueError, match="generated"):
        table.update({"v": "v + 1"}, "k = 1")
    # Updating both sides consistently is fine.
    table.update({"v": "v + 1", "v_plus": "v + 1 + k"}, "k = 1")
    assert table.read().filter("k = 1").first()["v_plus"] == 12


def test_generated_declaration_validates_existing_rows(spark):
    d = tempfile.mkdtemp(prefix="gen_bad_")
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.createDataFrame([(1, 10, 999)], "k bigint, v bigint, w bigint"))
    with pytest.raises(ValueError, match="violate"):
        t.set_generated_column("w", "v + k")
    with pytest.raises(ValueError, match="no column"):
        t.set_generated_column("nope", "v")


def test_generated_source_rename_drop_guard(spark, table):
    with pytest.raises(ValueError, match="depends on it"):
        table.alter_drop_column("v")
    with pytest.raises(ValueError, match="depends on it"):
        table.alter_rename_column("v", "value")
    # Unrelated columns still rename fine... but v_plus itself is also
    # protected (it IS the generated column).
    with pytest.raises(ValueError, match="depends on it"):
        table.alter_drop_column("v_plus")


def test_sql_create_table_with_generated_column(spark):
    d = tempfile.mkdtemp(prefix="gen_sql_")
    sess = PlatformSQL(spark)
    sess.sql(
        f"""CREATE TABLE ledger (
              k BIGINT,
              amount_cents BIGINT,
              amount_dollars DOUBLE GENERATED ALWAYS AS (amount_cents / 100.0)
            ) LOCATION '{d}/ledger'"""
    )
    t = sess.tables["ledger"]
    assert t.generated_columns() == {
        "amount_dollars": "amount_cents / 100.0"
    }
    sess.sql("INSERT INTO ledger (k, amount_cents) VALUES (1, 250), (2, 75)")
    got = {
        r["k"]: r["amount_dollars"]
        for r in sess.sql("SELECT k, amount_dollars FROM ledger").collect()
    }
    assert got == {1: 2.5, 2: 0.75}


def test_generated_and_identity_together(spark):
    d = tempfile.mkdtemp(prefix="gen_id_")
    sess = PlatformSQL(spark)
    sess.sql(
        f"""CREATE TABLE tx (
              tx_id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100),
              cents BIGINT,
              dollars DOUBLE GENERATED ALWAYS AS (cents / 100.0)
            ) LOCATION '{d}/tx'"""
    )
    sess.sql("INSERT INTO tx (cents) VALUES (500), (125)")
    rows = sess.sql("SELECT tx_id, cents, dollars FROM tx").collect()
    assert sorted(r["tx_id"] for r in rows) == [100, 101]
    assert {r["cents"]: r["dollars"] for r in rows} == {500: 5.0, 125: 1.25}


def test_sink_refuses_generated_column_table(spark, table):
    """Generated columns are enforced by the CHECK job inside
    ManagedTable.append; the executor-side DataSource sink never runs
    it, so it must refuse these tables at plan time (same rule as
    constrained and identity tables)."""
    from delta_lake_platform_spark.sources import datasource

    datasource.register(spark)
    df = spark.createDataFrame(
        [(9, 90, 999)], "k bigint, v bigint, v_plus bigint"  # wrong v_plus
    )
    with pytest.raises(Exception, match="generated"):
        try:
            df.write.format("managed_table").option(
                "path", table.path
            ).mode("append").save()
        except Exception as e:  # py4j wraps the planner error
            raise RuntimeError(str(e)) from e
    # Nothing landed.
    assert table.read().count() == 1
