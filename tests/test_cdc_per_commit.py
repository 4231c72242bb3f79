"""Per-commit CDC (Delta's delta.enableChangeDataFeed).

Contract pinned here:
- DML commits on a CDF-enabled table record change files under
  _change_data/ (uuid-named, entry-referenced via cdcPath) holding the
  commit's change ROWS — a 1-row update in a big file costs a 1-row
  cdc file, and CDF readers never re-scan rewritten data files.
- table_changes_per_commit serves one row per change per commit with
  _change_type/_commit_version/_commit_timestamp: cdc files first,
  append-family commits straight from their ADDED files (never a cdc
  write), layout/schema-only commits contribute nothing, and anything
  unrecorded falls back to an exact per-commit snapshot diff (where
  Delta would error).
- Netting: summing the per-commit stream over a span reproduces the
  NET change_feed diff; intra-span churn is visible per-commit and
  invisible net — the distinction debt item (d) called out.
- VACUUM reclaims a vacuumed version's cdc dir; reading it then
  raises, like Delta's vacuumed-CDF contract.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable


def _mk(spark, n=20, cdf=True, prefix="cdc_"):
    d = tempfile.mkdtemp(prefix=prefix)
    t = ManagedTable(spark, os.path.join(d, "t"))
    t.create(
        spark.range(n).selectExpr(
            "id", "id * 10 AS v", "CAST('a' AS STRING) AS tag"
        )
    )
    if cdf:
        t.set_property("enableChangeDataFeed", "true")
    return d, t


def _changes(t, v0, v1=None, **kw):
    rows = t.table_changes_per_commit(v0, v1, **kw).collect()
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"]) for r in rows
    )


def test_cow_delete_writes_and_serves_cdc(spark):
    d, t = _mk(spark)
    t.delete("id < 3", rewrite=True)  # v1
    entry = t._entry(1)
    assert entry.get("cdcPath"), "CDF-enabled DELETE must record a cdc file"
    assert os.path.isdir(t._abs(entry["cdcPath"]))
    assert _changes(t, 1) == [(1, "delete", i) for i in range(3)]
    # _commit_timestamp is populated and matches the entry.
    row = t.table_changes_per_commit(1).first()
    assert row["_commit_timestamp"] is not None


def test_dv_delete_writes_cdc(spark):
    d, t = _mk(spark)
    t.delete("id >= 18", rewrite=False)  # v1, DV
    assert t._entry(1).get("cdcPath")
    assert _changes(t, 1) == [(1, "delete", 18), (1, "delete", 19)]


def test_update_pre_and_postimages_cow_and_mor(spark):
    for rewrite in (True, False):
        d, t = _mk(spark, prefix=f"cdcu_{rewrite}_")
        t.update({"v": "v + 1"}, "id = 7", rewrite=rewrite)  # v1
        got = t.table_changes_per_commit(1).collect()
        by_type = {r["_change_type"]: r for r in got}
        assert set(by_type) == {"update_preimage", "update_postimage"}
        assert by_type["update_preimage"]["v"] == 70
        assert by_type["update_postimage"]["v"] == 71
        assert all(r["id"] == 7 for r in got)


def test_merge_emits_all_change_types(spark):
    from delta_lake_platform_spark.sources.managed_table import MergeClauses

    d, t = _mk(spark, n=10)
    src = spark.range(8, 14).selectExpr(
        "id", "id * 100 AS v", "CAST('m' AS STRING) AS tag"
    )
    clauses = MergeClauses(
        condition="target.id = updates.id",
        matched_update={"v": "updates.v"},
        matched_condition="target.id = 8",
        matched_delete_condition="target.id = 9",
        not_matched_insert={
            "id": "updates.id", "v": "updates.v", "tag": "updates.tag"
        },
    )
    t.merge(src, clauses)  # v1
    got = _changes(t, 1)
    assert got == [
        (1, "delete", 9),
        (1, "insert", 10),
        (1, "insert", 11),
        (1, "insert", 12),
        (1, "insert", 13),
        (1, "update_postimage", 8),
        (1, "update_preimage", 8),
    ]
    pre = [
        r
        for r in t.table_changes_per_commit(1).collect()
        if r["_change_type"] == "update_preimage"
    ][0]
    assert pre["v"] == 80  # original value, not the updated one


def test_replace_where_is_delete_plus_insert(spark):
    for rewrite in (True, False):
        d, t = _mk(spark, n=10, prefix=f"cdcrw_{rewrite}_")
        repl = spark.range(5, 8).selectExpr(
            "id", "id * 1000 AS v", "CAST('r' AS STRING) AS tag"
        )
        t.overwrite_where(repl, "id >= 5", rewrite=rewrite)  # v1
        got = _changes(t, 1)
        assert got == [
            *[(1, "delete", i) for i in range(5, 10)],
            *[(1, "insert", i) for i in range(5, 8)],
        ]


def test_appends_served_from_add_actions_without_cdc_file(spark):
    d, t = _mk(spark)
    t.append(spark.range(100, 103).selectExpr(
        "id", "id * 10 AS v", "CAST('n' AS STRING) AS tag"
    ))  # v1
    assert not (t._entry(1) or {}).get("cdcPath")
    assert _changes(t, 1) == [(1, "insert", i) for i in (100, 101, 102)]
    # Version 0 serves the initial snapshot as inserts, like Delta.
    first = _changes(t, 0, 0)
    assert first == [(0, "insert", i) for i in range(20)]


def test_optimize_contributes_nothing(spark):
    d, t = _mk(spark)
    t.append(spark.range(100, 110).selectExpr(
        "id", "id * 10 AS v", "CAST('n' AS STRING) AS tag"
    ))  # v1
    t.compact()  # v2: OPTIMIZE — layout only
    assert _changes(t, 2) == []


def test_per_commit_nets_to_the_span_diff(spark):
    """Applying the per-commit stream over a span reproduces the NET
    change_feed: inserts minus deletes (update pre/post count as
    delete+insert) — the netting-layer relationship debt (d) asked
    for. Intra-span churn is visible per-commit only."""
    d, t = _mk(spark)
    t.append(spark.range(50, 53).selectExpr(
        "id", "id * 10 AS v", "CAST('c' AS STRING) AS tag"
    ))  # v1: churn rows in
    t.delete("id >= 50", rewrite=True)  # v2: churn rows out
    t.update({"v": "v + 5"}, "id = 1", rewrite=True)  # v3

    pc = t.table_changes_per_commit(1, 3).collect()
    # Churn IS visible per-commit: 50-52 appear as insert AND delete.
    churn = [r for r in pc if r["id"] == 50]
    assert {r["_change_type"] for r in churn} == {"insert", "delete"}

    # Net the stream: +1 for insert/update_postimage, -1 for
    # delete/update_preimage, per full row image.
    net: dict[tuple, int] = {}
    for r in pc:
        key = (r["id"], r["v"], r["tag"])
        w = 1 if r["_change_type"] in ("insert", "update_postimage") else -1
        net[key] = net.get(key, 0) + w
    survived = sorted(k for k, n in net.items() if n > 0)
    removed = sorted(k for k, n in net.items() if n < 0)

    feed = t.change_feed(0, 3).collect()
    feed_ins = sorted(
        (r["id"], r["v"], r["tag"])
        for r in feed
        if r["_change_type"] == "insert"
    )
    feed_del = sorted(
        (r["id"], r["v"], r["tag"])
        for r in feed
        if r["_change_type"] == "delete"
    )
    assert survived == feed_ins
    assert removed == feed_del


def test_cdf_off_falls_back_to_exact_diff(spark):
    d, t = _mk(spark, cdf=False)
    t.delete("id < 2", rewrite=True)  # v1: NO cdc file recorded
    assert not (t._entry(1) or {}).get("cdcPath")
    # Delta raises here; we serve the exact per-commit diff instead.
    assert _changes(t, 1) == [(1, "delete", 0), (1, "delete", 1)]


def test_vacuumed_cdc_raises(spark):
    d, t = _mk(spark)
    t.delete("id < 3", rewrite=True)  # v1
    t.update({"v": "v + 1"}, "id = 10", rewrite=True)  # v2
    t.append(spark.range(200, 201).selectExpr(
        "id", "id * 10 AS v", "CAST('z' AS STRING) AS tag"
    ))  # v3
    cdc_dir = t._abs(t._entry(1)["cdcPath"])
    t.vacuum(keep_last=2)  # reclaims v1 (and its cdc dir)
    assert not os.path.isdir(cdc_dir)
    with pytest.raises(ValueError, match="vacuumed"):
        t.table_changes_per_commit(1, 1).collect()
    # Younger versions still serve.
    assert _changes(t, 3) == [(3, "insert", 200)]


def test_schema_alignment_across_add_column(spark):
    d, t = _mk(spark, n=3)
    t.delete("id = 0", rewrite=True)  # v1: cdc in the OLD schema
    t.alter_add_column("extra", "string")  # v2: schema-only
    t.append(
        spark.createDataFrame(
            [(30, 300, "a", "x")], "id long, v long, tag string, extra string"
        )
    )  # v3
    got = t.table_changes_per_commit(1, 3)
    assert "extra" in got.columns  # end-version schema
    rows = {(r["id"], r["_change_type"]): r for r in got.collect()}
    assert rows[(0, "delete")]["extra"] is None  # pre-column commit
    assert rows[(30, "insert")]["extra"] == "x"
    assert _changes(t, 2, 2) == []  # the ADD COLUMN commit itself


def test_sql_table_changes_per_commit(spark):
    from delta_lake_platform_spark.sql import PlatformSQL

    d, t = _mk(spark, n=6)
    sql = PlatformSQL(spark)
    sql.register("cdct", t)
    sql.sql("DELETE FROM cdct WHERE id < 2")  # v1
    sql.sql("UPDATE cdct SET v = v + 1 WHERE id = 4")  # v2
    out = sql.sql(
        "SELECT _commit_version, _change_type, id "
        "FROM table_changes_per_commit('cdct', 1, 2) "
        "ORDER BY _commit_version, _change_type, id"
    ).collect()
    assert [(r[0], r[1], r[2]) for r in out] == [
        (1, "delete", 0),
        (1, "delete", 1),
        (2, "update_postimage", 4),
        (2, "update_preimage", 4),
    ]


def test_cdc_columns_stay_logical_on_row_tracked_table(spark):
    d, t = _mk(spark)
    t.enable_row_tracking()
    t.delete("id = 5", rewrite=True)
    df = t.table_changes_per_commit(t.latest_version())
    assert [c for c in df.columns if c.startswith("__")] == []
    assert set(df.columns) == {
        "id", "v", "tag", "_change_type", "_commit_version",
        "_commit_timestamp",
    }


def test_change_feed_stream_per_commit_mode(spark):
    """ChangeFeedStream(per_commit=True): Delta's readChangeFeed row
    shape — real per-commit versions, intra-batch churn visible (the
    net mode would cancel an insert-then-delete inside one batch)."""
    from delta_lake_platform_spark.streaming.cdf import ChangeFeedStream

    d, t = _mk(spark, n=4)
    ckpt = os.path.join(d, "ckpt")
    stream = ChangeFeedStream(t, ckpt, per_commit=True)
    seen: list = []
    stream.process_available(
        lambda df, fv, tv: seen.append(
            sorted(
                (r["_commit_version"], r["_change_type"], r["id"])
                for r in df.collect()
            )
        )
    )
    assert seen[0] == [(0, "insert", i) for i in range(4)]

    t.append(spark.range(10, 11).selectExpr(
        "id", "id * 10 AS v", "CAST('x' AS STRING) AS tag"
    ))  # v1: churn in
    t.delete("id = 10", rewrite=True)  # v2: churn out
    stream.process_available(
        lambda df, fv, tv: seen.append(
            sorted(
                (r["_commit_version"], r["_change_type"], r["id"])
                for r in df.collect()
            )
        )
    )
    # One batch covering v1..v2, churn visible with REAL versions.
    assert seen[1] == [(1, "insert", 10), (2, "delete", 10)]
    # Caught up; restart resumes from the durable offset.
    assert stream.process_available(lambda *a: None) == 0


def _register_ds(spark):
    from delta_lake_platform_spark.sources import datasource

    datasource.register(spark)


def test_datasource_batch_read_change_feed(spark):
    """spark.read.format('managed_table').option('readChangeFeed',
    'true'): every partition is ONE parquet file (a cdc file or an
    append's add file) — no executor re-scan of rewritten data files,
    no driver diff jobs."""
    _register_ds(spark)
    d, t = _mk(spark, n=8)
    t.update({"v": "v + 1"}, "id = 2", rewrite=True)  # v1
    t.delete("id = 5", rewrite=False)  # v2
    t.append(spark.range(20, 22).selectExpr(
        "id", "id * 10 AS v", "CAST('n' AS STRING) AS tag"
    ))  # v3
    got = (
        spark.read.format("managed_table")
        .option("path", t.path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load()
    )
    assert set(got.columns) == {
        "id", "v", "tag", "_change_type", "_commit_version",
        "_commit_timestamp",
    }
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in got.collect()
    )
    assert rows == [
        (1, "update_postimage", 2, 21),
        (1, "update_preimage", 2, 20),
        (2, "delete", 5, 50),
        (3, "insert", 20, 200),
        (3, "insert", 21, 210),
    ]
    # endingVersion bounds the span.
    n = (
        spark.read.format("managed_table")
        .option("path", t.path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .option("endingVersion", "2")
        .load()
        .count()
    )
    assert n == 3


def test_datasource_cdf_raises_on_unrecorded_commit(spark):
    _register_ds(spark)
    d, t = _mk(spark, n=4, cdf=False)
    t.update({"v": "v + 1"}, "id = 1", rewrite=True)  # v1: no cdc file
    df = (
        spark.read.format("managed_table")
        .option("path", t.path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load()
    )
    with pytest.raises(Exception, match="recorded no change data"):
        df.collect()


def test_datasource_cdf_logical_names_after_rename(spark):
    """Add-action files carry PHYSICAL column names under column
    mapping; the CDF reader must re-expose logical ones."""
    _register_ds(spark)
    d, t = _mk(spark, n=3)
    t.alter_rename_column("v", "val")  # schema-only commit
    t.append(spark.range(7, 8).selectExpr(
        "id", "id * 10 AS val", "CAST('n' AS STRING) AS tag"
    ))
    head = t.latest_version()
    got = (
        spark.read.format("managed_table")
        .option("path", t.path)
        .option("readChangeFeed", "true")
        .option("startingVersion", str(head))
        .load()
    )
    assert "val" in got.columns and "v" not in got.columns
    r = got.first()
    assert (r["id"], r["val"], r["_change_type"]) == (7, 70, "insert")


def test_datasource_streaming_change_feed(spark, tmp_path):
    _register_ds(spark)
    d, t = _mk(spark, n=3)
    t.delete("id = 0", rewrite=True)  # v1
    q = (
        spark.readStream.format("managed_table")
        .option("path", t.path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load()
        .writeStream.format("memory")
        .queryName("cdc_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in spark.sql("SELECT * FROM cdc_stream_sink").collect()
    )
    assert rows == [
        (0, "insert", 0),
        (0, "insert", 1),
        (0, "insert", 2),
        (1, "delete", 0),
    ]


# -- property: the per-commit stream NETS to the span feed over any
# DML sequence, COW or MoR ------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_PREDS = ["tag = 'a'", "id % 7 = 3", "v > 150", "id < 4"]
_SETS = [{"v": "v + 100"}, {"v": "0 - v"}]

_CDC_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("delete"), st.sampled_from(range(len(_PREDS))),
                  st.booleans()),
        st.tuples(st.just("update"), st.sampled_from(range(len(_SETS))),
                  st.booleans()),
        st.tuples(st.just("append"), st.sampled_from(range(3)),
                  st.booleans()),
        st.tuples(st.just("merge"), st.sampled_from(range(2)),
                  st.booleans()),
        st.tuples(st.just("compact"), st.just(0), st.just(False)),
    ),
    min_size=1,
    max_size=4,
)


def _cdc_base(spark):
    return spark.range(0, 30).selectExpr(
        "id", "id * 10 AS v",
        "CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END AS tag",
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_CDC_OPS)
def test_per_commit_stream_nets_to_span_feed_property(spark, ops):
    """For ANY DML sequence (COW or MoR per op) on a CDF-enabled
    table, netting the per-commit CDC stream reproduces the NET span
    feed exactly — the netting-layer contract of debt item (d), held
    across every capture path at once."""
    from delta_lake_platform_spark.sources.managed_table import MergeClauses

    d = tempfile.mkdtemp(prefix="cdc_prop_")
    t = ManagedTable(spark, os.path.join(d, "t"))
    t.create(_cdc_base(spark))
    t.set_property("enableChangeDataFeed", "true")
    for kind, i, mor in ops:
        if kind == "delete":
            t.delete(_PREDS[i], rewrite=not mor)
        elif kind == "update":
            t.update(_SETS[i], _PREDS[(i + 1) % len(_PREDS)],
                     rewrite=not mor)
        elif kind == "append":
            lo = 100 + 10 * i
            t.append(spark.range(lo, lo + 5).selectExpr(
                "id", "id * 10 AS v", "'b' AS tag"
            ), fast=mor)
        elif kind == "merge":
            src = spark.range(2 * i, 2 * i + 20, 3).selectExpr(
                "id", "id + 1000 AS nv"
            )
            t.merge(
                src,
                MergeClauses(
                    condition="target.id = updates.id",
                    matched_update={"v": "updates.nv"},
                    matched_delete_condition=(
                        "updates.nv % 2 = 1" if i == 1 else None
                    ),
                    not_matched_insert={
                        "id": "updates.id",
                        "v": "updates.nv",
                        "tag": "'m'",
                    },
                ),
                rewrite=not mor,
            )
        else:
            t.compact(target_partitions=2)
    head = t.latest_version()
    net: dict[tuple, int] = {}
    for r in t.table_changes_per_commit(1, head).collect():
        key = (r["id"], r["v"], r["tag"])
        w = 1 if r["_change_type"] in ("insert", "update_postimage") else -1
        net[key] = net.get(key, 0) + w
    got_ins = sorted(
        k for k, n in net.items() for _ in range(n) if n > 0
    )
    got_del = sorted(
        k for k, n in net.items() for _ in range(-n) if n < 0
    )
    feed = t.change_feed(0, head).collect()
    want_ins = sorted(
        (r["id"], r["v"], r["tag"]) for r in feed
        if r["_change_type"] == "insert"
    )
    want_del = sorted(
        (r["id"], r["v"], r["tag"]) for r in feed
        if r["_change_type"] == "delete"
    )
    assert got_ins == want_ins and got_del == want_del, f"after {ops}"


def test_cdc_survives_conflict_retry(spark):
    """A DV delete with CDF on that loses the version race to a blind
    append retries the ENTRY alone — its cdc file (written before the
    race) stays referenced by the re-aimed entry, and the per-commit
    feed serves both commits correctly."""

    def _interleave_on(table, method_name, action):
        orig = getattr(table, method_name)
        state = {"fired": False}

        def wrapper(*args, **kwargs):
            if not state["fired"]:
                state["fired"] = True
                action()
            return orig(*args, **kwargs)

        setattr(table, method_name, wrapper)

    d, t = _mk(spark, n=10)
    b = ManagedTable(spark, t.path)
    _interleave_on(
        t,
        "_write_dv",
        lambda: b.append(
            spark.range(200, 203).selectExpr(
                "id", "id * 10 AS v", "CAST('z' AS STRING) AS tag"
            ),
            fast=True,
        ),
    )
    v = t.delete("id < 2", rewrite=False)
    assert v == 2  # create(0), interloper append(1), delete re-aimed(2)
    assert t._entry(2).get("cdcPath"), "retried entry lost its cdcPath"
    assert _changes(t, 1, 2) == [
        (1, "insert", 200),
        (1, "insert", 201),
        (1, "insert", 202),
        (2, "delete", 0),
        (2, "delete", 1),
    ]


def test_sql_table_changes_per_commit_timestamp_forms(spark):
    import datetime as dt

    from delta_lake_platform_spark.sql import PlatformSQL

    d, t = _mk(spark, n=4)
    sql = PlatformSQL(spark)
    sql.register("cdcts", t)
    sql.sql("DELETE FROM cdcts WHERE id = 0")  # v1
    sql.sql("DELETE FROM cdcts WHERE id = 1")  # v2
    h = {e["version"]: e["timestamp"] for e in t.history()}
    mid = dt.datetime.fromtimestamp(
        (h[1] + h[2]) / 2, dt.timezone.utc
    ).isoformat()
    # Start at the earliest commit at-or-after mid -> v2 only.
    out = sql.sql(
        f"SELECT _commit_version, id FROM "
        f"table_changes_per_commit('cdcts', '{mid}') ORDER BY id"
    ).collect()
    assert [(r[0], r[1]) for r in out] == [(2, 1)]


def test_cdf_stream_max_versions_per_trigger(spark, tmp_path):
    """Bounded CDF catch-up: with maxVersionsPerTrigger=1 a consumer
    starting 3 commits behind drains in 3 one-commit offset steps, not
    one giant wave — and the union of steps equals the uncapped set.
    (Driven through the reader API directly, like the file tail's
    capped-walk tests — availableNow snapshots a single offset.)"""
    from delta_lake_platform_spark.sources.datasource import _CDCTailReader

    d, t = _mk(spark, n=4)
    for i in range(3):
        t.delete(f"id = {i}", rewrite=True)  # v1..v3

    r = _CDCTailReader({
        "path": t.path,
        "startingversion": "1",
        "maxversionspertrigger": "1",
        "assumefresh": "true",
    })
    prev = r.initialOffset()
    steps = []
    for _ in range(10):
        cur = r.latestOffset()
        if cur == prev:
            break
        parts = r.partitions(prev, cur)
        steps.append(
            sorted(
                (p.version, p.file_path) for p in parts
            )
        )
        prev = cur
    assert [sorted({v for v, _ in s}) for s in steps] == [[1], [2], [3]]

    # Uncapped reader over the same span serves the same files.
    r2 = _CDCTailReader({"path": t.path, "startingversion": "1"})
    allparts = r2.partitions({"version": 0}, {"version": 3})
    assert sorted((p.version, p.file_path) for p in allparts) == sorted(
        x for s in steps for x in s
    )


def test_overwrite_served_as_remove_add_actions(spark):
    """Full-snapshot rewrites (OVERWRITE / REPLACE TABLE / RESTORE)
    serve Delta's remove/add rule: EVERY pre-image row is a delete and
    every new row an insert — even rows with equal values — and rows a
    DV had already killed are not re-reported. Works on both reader
    paths; no table-sized cdc file is ever written."""
    _register_ds(spark)
    d, t = _mk(spark, n=5)
    t.delete("id = 4", rewrite=False)  # v1: DV kills id 4 pre-overwrite
    t.overwrite(spark.range(2).selectExpr(
        "id + 100 AS id", "id AS v", "CAST('o' AS STRING) AS tag"
    ))  # v2: full rewrite
    assert not (t._entry(2) or {}).get("cdcPath")
    got = _changes(t, 2)
    assert got == [
        *[(2, "delete", i) for i in range(4)],  # id 4 already dead
        (2, "insert", 100),
        (2, "insert", 101),
    ]
    # DataSource path serves the same rows (one file per partition).
    ds = sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in spark.read.format("managed_table")
        .option("path", t.path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "2")
        .load()
        .collect()
    )
    assert ds == got


def test_restore_served_as_remove_add_actions(spark):
    d, t = _mk(spark, n=3)
    t.delete("id = 0", rewrite=True)  # v1
    t.restore(0)  # v2: full-snapshot restore — id 0 comes back
    rows = _changes(t, 2)
    assert (2, "insert", 0) in rows
    assert {ct for _, ct, _ in rows} == {"delete", "insert"}
    # Net effect of the restore commit == change_feed over it.
    net = {}
    for v, ct, i in rows:
        net[i] = net.get(i, 0) + (1 if ct == "insert" else -1)
    assert {i for i, n in net.items() if n > 0} == {0}
    assert not {i for i, n in net.items() if n < 0}


# --- r7 cross-hardening: CDC x column-mapping x schema evolution -------------
#
# The interaction matrix VERDICT r6 #6 called out: a RENAME between two
# DMLs, a type-widening mid-window, and a per-commit stream across a
# REPLACE — each read back value-exact through the CDF surfaces.


def test_cdf_across_rename_between_two_dmls(spark):
    """DML -> RENAME -> DML, then one readChangeFeed window across
    both: every change row (incl. the PRE-rename commit's, whose cdc
    file and data files carry the old physical name) must surface
    under the POST-rename logical name with exact values."""
    import tests.test_datasource  # noqa: F401  (datasource registered below)
    from delta_lake_platform_spark.sources import datasource as _ds

    _ds.register(spark)
    d, t = _mk(spark, n=5)
    t.delete("id = 1", rewrite=True)          # v1: pre-rename DML
    t.alter_rename_column("v", "val")         # v2: schema-only
    t.update({"val": "val + 1"}, "id = 2")    # v3: post-rename DML
    got = (
        spark.read.format("managed_table")
        .option("path", t.path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load()
    )
    assert "val" in got.columns and "v" not in got.columns
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["val"])
        for r in got.collect()
    )
    assert rows == [
        (1, "delete", 1, 10),
        (3, "update_postimage", 2, 21),
        (3, "update_preimage", 2, 20),
    ]


def test_cdf_across_type_widening_mid_window(spark):
    """DML -> widen v int->bigint -> DML: one CDF window across the
    widening serves every row at the WIDENED type with exact values
    (pre-widening cdc/data files are physically INT32)."""
    from delta_lake_platform_spark.sources import datasource as _ds

    _ds.register(spark)
    d = tempfile.mkdtemp(prefix="cdc_widen_")
    t = ManagedTable(spark, os.path.join(d, "t"))
    t.create(spark.range(4).selectExpr("id", "CAST(id * 10 AS INT) AS v"))
    t.set_property("enableChangeDataFeed", "true")
    t.delete("id = 0", rewrite=True)          # v1: narrow-typed cdc file
    t.alter_widen_column("v", "bigint")       # v2: metadata-only
    t.append(
        spark.createDataFrame([(9, 3_000_000_000)], "id long, v long")
    )                                          # v3: value needs 64 bits
    got = (
        spark.read.format("managed_table")
        .option("path", t.path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load()
    )
    assert dict(got.dtypes)["v"] == "bigint"
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in got.collect()
    )
    assert rows == [(1, "delete", 0, 0), (3, "insert", 9, 3_000_000_000)]
    # The per-commit table API agrees.
    api_rows = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in t.table_changes_per_commit(1, 3).collect()
    )
    assert api_rows == rows


def test_per_commit_stream_across_replace(spark):
    """A per-commit CDF stream whose window crosses a REPLACE TABLE
    commit serves the full-snapshot rewrite as remove/add actions
    (Delta's rule), value-exact, one batch per commit."""
    from delta_lake_platform_spark.streaming.cdf import ChangeFeedStream

    d, t = _mk(spark, n=3)                     # rows 0,1,2 (v=0,10,20)
    ckpt = os.path.join(d, "ckpt")
    stream = ChangeFeedStream(t, ckpt, per_commit=True,
                              max_versions_per_batch=1)
    stream._advance(0)                         # start after the create
    t.append(spark.range(5, 6).selectExpr(
        "id", "id * 10 AS v", "CAST('a' AS STRING) AS tag"
    ))                                         # v1
    t.overwrite(
        spark.range(100, 102).selectExpr(
            "id", "id * 10 AS v", "CAST('r' AS STRING) AS tag"
        ),
        operation="REPLACE TABLE",
    )                                          # v2: full rewrite
    batches = []
    n = stream.process_available(
        lambda b, v0, v1: batches.append(sorted(
            (r["_commit_version"], r["_change_type"], r["id"], r["v"])
            for r in b.collect()
        ))
    )
    assert n == 2
    assert batches[0] == [(1, "insert", 5, 50)]
    assert batches[1] == [
        (2, "delete", 0, 0),
        (2, "delete", 1, 10),
        (2, "delete", 2, 20),
        (2, "delete", 5, 50),
        (2, "insert", 100, 1000),
        (2, "insert", 101, 1010),
    ]
