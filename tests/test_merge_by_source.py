"""MERGE ... WHEN NOT MATCHED BY SOURCE (Delta 2.3+): target rows that
match NO source row can be updated or deleted in the same merge — the
canonical "sync target to source" shape.

Pinned here:
- Full sync (update matched + insert new + by-source delete) makes the
  target an exact mirror of the source.
- The same left-outer join serves all clause families (no second scan);
  by-source rows land in the deletion vector under MOR and in the
  changed-file set under file-level COW.
- File-level COW bounds the REWRITE to files containing touched rows
  even though candidate pruning is disabled (every file may hold a
  not-matched row).
- By-source expressions referencing the source alias raise (Delta's
  analysis rule — there is no source row to read).
- Separate metrics: numTargetRowsNotMatchedBySourceUpdated/Deleted;
  row accounting stays exact through by-source deletes.
- SQL dialect: WHEN NOT MATCHED BY SOURCE THEN UPDATE SET ... / DELETE.
- Row tracking: by-source-updated rows keep their stable ids.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import (
    ManagedTable,
    MergeClauses,
    MergeError,
)

# NOTE: the `spark` fixture comes from conftest.py (session-scoped
# local[8]); defining a module-local one would re-create the singleton
# with a different parallelism and shift file layouts for every test
# that runs after this module.


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="merge_bysrc_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, tdir, n=10, files=1):
    t = ManagedTable(spark, f"{tdir}/t")
    df = spark.range(n).selectExpr("id", "id * 10 as v", "'old' as tag")
    t.create(df.repartition(files) if files > 1 else df.coalesce(1))
    return t


def test_full_sync_mirror(spark, tdir):
    """update matched + insert new + delete unmatched == mirror."""
    t = _mk(spark, tdir, n=10)
    src = spark.range(5, 15).selectExpr("id", "id * 100 as v", "'new' as tag")
    t.merge(
        src,
        MergeClauses(
            condition="target.id = updates.id",
            matched_update={"v": "updates.v", "tag": "updates.tag"},
            not_matched_insert={
                "id": "updates.id", "v": "updates.v", "tag": "updates.tag"
            },
            by_source_delete_condition="true",
        ),
    )
    got = {(r.id, r.v, r.tag) for r in t.read().collect()}
    assert got == {(i, i * 100, "new") for i in range(5, 15)}
    m = t.history(1)[0]["operationMetrics"]
    assert m["numTargetRowsUpdated"] == 5
    assert m["numTargetRowsInserted"] == 5
    assert m["numTargetRowsNotMatchedBySourceDeleted"] == 5
    assert m["numTargetRowsDeleted"] == 0
    assert t.row_count() == 10  # exact row accounting through the merge


def test_by_source_update_with_condition(spark, tdir):
    t = _mk(spark, tdir, n=10)
    src = spark.range(0, 5).selectExpr("id", "id as v", "'x' as tag")
    t.merge(
        src,
        MergeClauses(
            condition="target.id = updates.id",
            by_source_update={"tag": "'stale'"},
            by_source_update_condition="target.id < 8",
        ),
    )
    rows = {r.id: r.tag for r in t.read().collect()}
    assert rows[5] == rows[6] == rows[7] == "stale"
    assert rows[8] == rows[9] == "old"      # fails the condition
    assert all(rows[i] == "old" for i in range(5))  # matched: untouched
    m = t.history(1)[0]["operationMetrics"]
    assert m["numTargetRowsNotMatchedBySourceUpdated"] == 3
    assert m["numTargetRowsUpdated"] == 0


def test_by_source_mor_uses_deletion_vector(spark, tdir):
    t = _mk(spark, tdir, n=10)
    src = spark.range(0, 6).selectExpr("id", "id as v", "'x' as tag")
    t.merge(
        src,
        MergeClauses(
            condition="target.id = updates.id",
            by_source_delete_condition="true",
        ),
        rewrite=False,
    )
    assert t.read().count() == 6
    m = t.history(1)[0]["operationMetrics"]
    assert m["numDeletionVectorRows"] == 4
    assert m["numTargetRowsNotMatchedBySourceDeleted"] == 4


def test_by_source_filelevel_bounds_rewrite(spark, tdir):
    """8-file table, by-source delete hits rows in ONE file's range:
    only that file is rewritten, the other 7 stay live untouched."""
    t = ManagedTable(spark, f"{tdir}/t")
    t.create(
        spark.range(800)
        .selectExpr("id", "id * 10 as v", "'old' as tag")
        .repartitionByRange(8, "id")
    )
    # Source covers everything except ids 0..49 — the by-source slice
    # lives entirely in the first range file.
    src = spark.range(50, 800).selectExpr("id")
    t.merge(
        src,
        MergeClauses(
            condition="target.id = updates.id",
            by_source_delete_condition="true",
        ),
    )
    assert t.read().count() == 750
    m = t.history(1)[0]["operationMetrics"]
    assert m["numRewrittenFiles"] == 1
    assert m["numKeptFiles"] == 7


def test_by_source_expr_must_not_reference_source(spark, tdir):
    t = _mk(spark, tdir)
    src = spark.range(5).selectExpr("id", "id as v", "'x' as tag")
    with pytest.raises(MergeError, match="target columns only"):
        t.merge(
            src,
            MergeClauses(
                condition="target.id = updates.id",
                by_source_update={"v": "updates.v"},
            ),
        )


def test_by_source_sql_dialect(spark, tdir):
    from delta_lake_platform_spark.sql import PlatformSQL

    psql = PlatformSQL(spark)
    t = _mk(spark, tdir, n=10)
    psql.register("tgt", t)
    spark.range(0, 7).selectExpr(
        "id", "id * 7 as v", "'s' as tag"
    ).createOrReplaceTempView("src")
    psql.sql(
        """
        MERGE INTO tgt USING src
        ON tgt.id = src.id
        WHEN MATCHED THEN UPDATE SET v = src.v
        WHEN NOT MATCHED BY SOURCE AND tgt.id < 9 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'orphan'
        """
    )
    rows = {r.id: (r.v, r.tag) for r in t.read().collect()}
    assert set(rows) == {0, 1, 2, 3, 4, 5, 6, 9}
    assert rows[0] == (0, "old")
    assert rows[6] == (42, "old")
    assert rows[9] == (90, "orphan")


def test_by_source_row_tracking_preserves_ids(spark, tdir):
    t = _mk(spark, tdir, n=10)
    t.enable_row_tracking()
    before = {r.id: r._row_id for r in t.read_row_ids().collect()}
    src = spark.range(0, 4).selectExpr("id")
    t.merge(
        src,
        MergeClauses(
            condition="target.id = updates.id",
            by_source_update={"tag": "'stale'"},
        ),
    )
    after = {r.id: r._row_id for r in t.read_row_ids().collect()}
    assert after == before, "by-source updates keep stable row ids"


def test_compat_fluent_by_source(spark, tdir):
    from delta_lake_platform_spark.scd.compat import DeltaTable

    t = _mk(spark, tdir, n=8)
    dt = DeltaTable.forPath(spark, t.path)
    src = spark.range(0, 5).selectExpr("id", "id as v", "'m' as tag")
    (
        dt.alias("target")
        .merge(src.alias("updates"), "target.id = updates.id")
        .whenMatchedUpdate(set={"tag": "updates.tag"})
        .whenNotMatchedBySourceDelete(condition="target.id >= 7")
        .whenNotMatchedBySourceUpdate(set={"tag": "'gone'"})
        .execute()
    )
    rows = {r.id: r.tag for r in ManagedTable(spark, t.path).read().collect()}
    assert set(rows) == {0, 1, 2, 3, 4, 5, 6}
    assert rows[0] == "m" and rows[5] == rows[6] == "gone"


# -- multiple WHEN MATCHED clauses (Delta first-match-wins) ---------------


def _multi_setup(spark):
    from delta_lake_platform_spark.sql import PlatformSQL

    d = tempfile.mkdtemp(prefix="multimatch_")
    sql = PlatformSQL(spark)
    sql.sql(
        f"CREATE TABLE mt LOCATION '{d}/mt' AS "
        "SELECT id, CAST(id * 10 AS BIGINT) AS v, "
        "CAST('keep' AS STRING) AS tag FROM range(10)"
    )
    src = spark.range(0, 10).selectExpr(
        "id", "CAST(id % 3 AS BIGINT) AS bucket"
    )
    src.createOrReplaceTempView("mup")
    return sql


def test_multiple_when_matched_first_match_wins(spark):
    sql = _multi_setup(spark)
    sql.sql(
        "MERGE INTO mt USING mup ON mt.id = mup.id "
        "WHEN MATCHED AND mup.bucket = 0 THEN UPDATE SET tag = 'zero' "
        "WHEN MATCHED AND mup.bucket = 1 THEN UPDATE SET tag = 'one', v = mt.v + 1 "
        "WHEN MATCHED THEN DELETE"
    )
    got = {
        r.id: (r.tag, r.v)
        for r in sql.sql("SELECT id, tag, v FROM mt").collect()
    }
    # bucket 2 rows (2, 5, 8) fell through to DELETE.
    assert set(got) == {0, 3, 6, 9, 1, 4, 7}
    for i in (0, 3, 6, 9):
        assert got[i] == ("zero", i * 10)
    for i in (1, 4, 7):
        assert got[i] == ("one", i * 10 + 1)


def test_delete_clause_order_is_respected(spark):
    sql = _multi_setup(spark)
    # DELETE listed FIRST takes priority over the later catch-all
    # update — written order, not a fixed delete-first rule.
    sql.sql(
        "MERGE INTO mt USING mup ON mt.id = mup.id "
        "WHEN MATCHED AND mup.bucket = 2 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET tag = 'upd'"
    )
    got = {r.id: r.tag for r in sql.sql("SELECT id, tag FROM mt").collect()}
    assert set(got) == {0, 1, 3, 4, 6, 7, 9}
    assert all(tag == "upd" for tag in got.values())


def test_update_priority_over_later_delete(spark):
    sql = _multi_setup(spark)
    sql.sql(
        "MERGE INTO mt USING mup ON mt.id = mup.id AND mt.id < 6 "
        "WHEN MATCHED AND mup.bucket = 1 THEN UPDATE SET tag = 'one' "
        "WHEN MATCHED AND mup.bucket <= 1 THEN DELETE"
    )
    got = {r.id: r.tag for r in sql.sql("SELECT id, tag FROM mt").collect()}
    # ids 1, 4 updated (bucket 1 wins before the delete); 0, 3 deleted
    # (bucket 0); 2, 5 (bucket 2) and unmatched ids >= 6 untouched.
    assert set(got) == {1, 4, 2, 5, 6, 7, 8, 9}
    assert got[1] == "one" and got[4] == "one"
    assert got[2] == "keep" and got[8] == "keep"


def test_non_final_unconditional_clause_raises(spark):
    sql = _multi_setup(spark)
    with pytest.raises(ValueError, match="only\\s+the last may omit"):
        sql.sql(
            "MERGE INTO mt USING mup ON mt.id = mup.id "
            "WHEN MATCHED THEN UPDATE SET tag = 'a' "
            "WHEN MATCHED AND mup.bucket = 1 THEN DELETE"
        )


def test_conditional_not_matched_insert(spark):
    sql = _multi_setup(spark)
    big = spark.range(0, 20).selectExpr(
        "id", "CAST(id % 3 AS BIGINT) AS bucket"
    )
    big.createOrReplaceTempView("mups")
    # Only unmatched source rows passing the gate are inserted.
    sql.sql(
        "MERGE INTO mt USING mups ON mt.id = mups.id "
        "WHEN NOT MATCHED AND mups.bucket = 0 THEN "
        "INSERT (id, v, tag) VALUES (mups.id, mups.id * 100, 'new')"
    )
    got = {r.id: r.tag for r in sql.sql("SELECT id, tag FROM mt").collect()}
    inserted = {i for i, tag in got.items() if tag == "new"}
    assert inserted == {12, 15, 18}  # unmatched (>=10) AND bucket 0
    assert len(got) == 13


def test_multiple_not_matched_inserts_first_match_wins(spark):
    sql = _multi_setup(spark)
    big = spark.range(8, 16).selectExpr(
        "id", "CAST(id % 2 AS BIGINT) AS bucket"
    )
    big.createOrReplaceTempView("mupm")
    sql.sql(
        "MERGE INTO mt USING mupm ON mt.id = mupm.id "
        "WHEN NOT MATCHED AND mupm.bucket = 0 THEN "
        "INSERT (id, v, tag) VALUES (mupm.id, 0, 'even') "
        "WHEN NOT MATCHED THEN "
        "INSERT (id, v, tag) VALUES (mupm.id, 1, 'odd')"
    )
    got = {
        r.id: (r.tag, r.v)
        for r in sql.sql("SELECT id, tag, v FROM mt WHERE id >= 10").collect()
    }
    assert got == {
        10: ("even", 0), 12: ("even", 0), 14: ("even", 0),
        11: ("odd", 1), 13: ("odd", 1), 15: ("odd", 1),
    }
    with pytest.raises(ValueError, match="only the last may omit"):
        sql.sql(
            "MERGE INTO mt USING mupm ON mt.id = mupm.id "
            "WHEN NOT MATCHED THEN INSERT (id, v, tag) VALUES (mupm.id, 0, 'a') "
            "WHEN NOT MATCHED AND mupm.bucket = 0 THEN "
            "INSERT (id, v, tag) VALUES (mupm.id, 1, 'b')"
        )


def test_null_condition_falls_through_to_later_clause(spark):
    """A NULL first-clause condition must read as NOT-satisfied (Delta
    falls through to the next clause). A raw NOT(cond) gate turns
    NULL into NULL and poisons every later clause's gate, so the row
    silently matches nothing — this pins the coalesce fix."""
    from delta_lake_platform_spark.sql import PlatformSQL

    d = tempfile.mkdtemp(prefix="nullclause_")
    sql = PlatformSQL(spark)
    sql.sql(
        f"CREATE TABLE nt LOCATION '{d}/nt' AS "
        "SELECT id, CAST('keep' AS STRING) AS tag FROM range(6)"
    )
    spark.sql(
        "SELECT id, CASE WHEN id % 2 = 0 THEN NULL "
        "ELSE CAST(id AS BIGINT) END AS x FROM range(6)"
    ).createOrReplaceTempView("nsrc")
    sql.sql(
        "MERGE INTO nt USING nsrc ON nt.id = nsrc.id "
        "WHEN MATCHED AND nsrc.x > 5 THEN UPDATE SET tag = 'big' "
        "WHEN MATCHED AND nsrc.x > 2 THEN UPDATE SET tag = 'mid' "
        "WHEN MATCHED THEN UPDATE SET tag = 'rest'"
    )
    got = {r.id: r.tag for r in sql.sql("SELECT id, tag FROM nt").collect()}
    # Even ids carry x = NULL: both conditions are NULL -> fall through
    # to the unconditional clause, exactly like Delta.
    assert got == {
        0: "rest", 2: "rest", 4: "rest",
        1: "rest", 3: "mid", 5: "mid",
    }


def test_null_condition_falls_through_on_insert_clauses(spark):
    from delta_lake_platform_spark.sql import PlatformSQL

    d = tempfile.mkdtemp(prefix="nullins_")
    sql = PlatformSQL(spark)
    sql.sql(
        f"CREATE TABLE ni LOCATION '{d}/ni' AS "
        "SELECT id, CAST('seed' AS STRING) AS tag FROM range(2)"
    )
    spark.sql(
        "SELECT id, CASE WHEN id % 2 = 0 THEN NULL "
        "ELSE CAST(id AS BIGINT) END AS x FROM range(6)"
    ).createOrReplaceTempView("nisrc")
    sql.sql(
        "MERGE INTO ni USING nisrc ON ni.id = nisrc.id "
        "WHEN NOT MATCHED AND nisrc.x > 3 THEN "
        "INSERT (id, tag) VALUES (nisrc.id, 'gated') "
        "WHEN NOT MATCHED THEN INSERT (id, tag) VALUES (nisrc.id, 'fall')"
    )
    got = {r.id: r.tag for r in sql.sql("SELECT id, tag FROM ni").collect()}
    # ids 2, 4 carry x = NULL -> must land via the fall-through insert.
    assert got == {
        0: "seed", 1: "seed",
        2: "fall", 4: "fall", 3: "fall", 5: "gated",
    }
