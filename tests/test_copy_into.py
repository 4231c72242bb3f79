"""COPY INTO: idempotent file ingest with loaded-file tracking in the
commit log (Delta COPY INTO / Auto Loader dedup contract)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from delta_lake_platform_spark.sources.managed_table import ManagedTable


@pytest.fixture
def tdir():
    d = tempfile.mkdtemp(prefix="copyinto_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _drop_file(spark, path, rows):
    df = spark.createDataFrame(rows, "id long, v string")
    pdf = df.toPandas()
    pdf.to_parquet(path)


def test_copy_into_idempotent_and_incremental(spark, tdir):
    src = os.path.join(tdir, "landing")
    os.makedirs(src)
    _drop_file(spark, f"{src}/a.parquet", [(1, "a"), (2, "b")])
    _drop_file(spark, f"{src}/b.parquet", [(3, "c")])

    t = ManagedTable(spark, f"{tdir}/t")
    t.create(spark.createDataFrame([], "id long, v string"))
    t.copy_into(src)
    assert t.read().count() == 3

    # rerun: nothing new, no commit
    v = t.latest_version()
    assert t.copy_into(src) == v
    assert t.read().count() == 3

    # new file lands: only it is loaded
    _drop_file(spark, f"{src}/c.parquet", [(4, "d")])
    t.copy_into(src)
    assert {r.id for r in t.read().collect()} == {1, 2, 3, 4}
    h = t.history(1)[0]
    assert h["operation"] == "COPY INTO"
    assert h["operationMetrics"]["numFiles"] == 1


def test_copy_into_csv_with_schema(spark, tdir):
    src = os.path.join(tdir, "csv_landing")
    os.makedirs(src)
    with open(f"{src}/part1.csv", "w") as f:
        f.write("10,x\n11,y\n")
    t = ManagedTable(spark, f"{tdir}/t")
    t.create(spark.createDataFrame([], "id long, v string"))
    t.copy_into(src, format="csv", pattern="*.csv", schema="id long, v string")
    assert {(r.id, r.v) for r in t.read().collect()} == {(10, "x"), (11, "y")}


def test_copy_into_rejects_schema_drift(spark):
    """A source file whose schema diverges from the table errors at
    ingest time; no silent column drop, no partial commit."""
    import os
    import tempfile

    import pytest

    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="ci_drift_")
    src = os.path.join(d, "src")
    os.makedirs(src)
    t = ManagedTable(spark, f"{d}/t")
    t.create(spark.range(2).selectExpr("id", "id * 2 as v"))
    spark.createDataFrame([(5, 6, "x")], "id long, v long, w string").write.parquet(
        os.path.join(src, "batch1.parquet")
    )
    with pytest.raises(ValueError, match="extra columns \\['w'\\]"):
        t.copy_into(src)
    assert t.read().count() == 2 and t.latest_version() == 0
