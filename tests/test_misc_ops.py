"""Concurrency control, sampling determinism, UDTF, stream-stream join."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.operators.sampling import (
    hash_sample,
    reservoir_sample,
    stratified_hash_sample,
)
from delta_lake_platform_spark.sources.catalog import load_table
from delta_lake_platform_spark.sources.managed_table import (
    ConcurrentWriteError,
    ManagedTable,
)
from delta_lake_platform_spark.streaming.joins import purchases_after_signup


def test_concurrent_commit_detected(spark):
    """Writer A reads the table, writer B commits, writer A tries to
    claim the same version -> optimistic-concurrency error — and the
    loser must NOT clobber the winner's already-published data files
    (the staged-rename publish makes the data path itself the first
    collision point)."""
    from unittest.mock import patch

    d = tempfile.mkdtemp(prefix="ccw_")
    try:
        t = ManagedTable(spark, f"{d}/t")
        t.create(spark.createDataFrame([(1,)], "id long"))  # version 0
        other = ManagedTable(spark, f"{d}/t")
        winner = spark.createDataFrame([(100,)], "id long")
        other.overwrite(winner)  # version 1 lands first
        # Writer A still believes latest is 0 (stale read) and claims 1
        # with DIFFERENT contents:
        with patch.object(t, "_versions", return_value=[0]):
            with pytest.raises(ConcurrentWriteError):
                t.overwrite(spark.createDataFrame([(-1,)], "id long"))
        # The winner's committed snapshot is intact, byte for byte.
        assert [r.id for r in other.read(1).collect()] == [100]
        # After a fresh read, the retry succeeds on version 2.
        assert t.overwrite(winner) == 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_concurrent_filelevel_merge_detected(spark):
    """Same race through the file-level MERGE path: the loser's batch
    dir rename collides, the winner's files survive."""
    from unittest.mock import patch

    from delta_lake_platform_spark.sources.managed_table import MergeClauses

    d = tempfile.mkdtemp(prefix="ccwm_")
    try:
        t = ManagedTable(spark, f"{d}/t")
        t.create(
            spark.range(100)
            .selectExpr("id", "id * 2 as v")
            .repartitionByRange(4, "id")
        )
        other = ManagedTable(spark, f"{d}/t")

        def merge(handle, val):
            return handle.merge(
                spark.createDataFrame([(5, val)], "id long, nv long"),
                MergeClauses(
                    condition="target.id = updates.id",
                    matched_update={"v": "updates.nv"},
                ),
                rewrite=True,
            )

        merge(other, -100)  # version 1 lands first
        stale = {0: t._entry(0)}
        with patch.object(t, "_versions", return_value=[0]), patch.object(
            t, "_entry", side_effect=lambda v: stale.get(v)
        ):
            with pytest.raises(ConcurrentWriteError):
                merge(t, -999)
        assert other.read(1).filter("id = 5").first().v == -100
        assert merge(t, -7) == 2  # fresh retry wins
        assert t.read().filter("id = 5").first().v == -7
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_hash_sample_stable_under_repartition(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = {r.event_id for r in hash_sample(ev, "event_id", 0.2).collect()}
    b = {
        r.event_id
        for r in hash_sample(ev.repartition(13), "event_id", 0.2).collect()
    }
    assert a == b and a  # same rows regardless of layout
    n = ev.count()
    assert 0.1 < len(a) / n < 0.3


def test_stratified_sample_fractions(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    s = stratified_hash_sample(
        ev, "event_id", "event_type", {"click": 0.5, "error": 0.1}
    )
    got = {r.event_type: r.n for r in
           s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r.event_type: r.n for r in
              ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) <= {"click", "error"}
    assert abs(got["click"] / totals["click"] - 0.5) < 0.15
    assert abs(got["error"] / totals["error"] - 0.1) < 0.08


def test_reservoir_sample_exact_k_deterministic(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = sorted(r.event_id for r in reservoir_sample(ev, 25, "event_id").collect())
    b = sorted(
        r.event_id
        for r in reservoir_sample(ev.repartition(7), 25, "event_id").collect()
    )
    assert len(a) == 25 and a == b


def test_udtf_word_ngrams(spark):
    from delta_lake_platform_spark.operators.udtf_ops import register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM word_ngrams('the quick brown fox', 2)"
    ).collect()
    assert [(r.pos, r.ngram) for r in rows] == [
        (0, "the quick"),
        (1, "quick brown"),
        (2, "brown fox"),
    ]


def test_stream_stream_join_equals_batch(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="ssj_")
    try:
        ev = load_table(spark, sf_dir, "events")
        signups = ev.filter(F.col("event_type") == "signup")
        purchases = ev.filter(F.col("event_type") == "purchase")
        signups.write.parquet(f"{d}/s")
        purchases.write.parquet(f"{d}/p")
        schema = ev.schema
        s_stream = spark.readStream.schema(schema).parquet(f"{d}/s")
        p_stream = spark.readStream.schema(schema).parquet(f"{d}/p")
        q = (
            purchases_after_signup(s_stream, p_stream)
            .writeStream.format("memory")
            .queryName("ssj")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.table("ssj").count()
        expected = purchases_after_signup(signups, purchases).count()
        assert got == expected and expected > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_reserved_column_namespace_rejected(spark):
    """'__' belongs to the engine (position tags, materialized row id,
    stats keys) — a user column there would collide somewhere down the
    lifecycle, so creation and evolution refuse it up front."""
    import tempfile

    import pytest
    from pyspark.sql import functions as F

    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="reserved_")
    t = ManagedTable(spark, f"{d}/t")
    with pytest.raises(ValueError, match="reserved '__' prefix"):
        t.create(spark.range(3).select("id", F.lit(1).alias("__fileBytes")))
    t.create(spark.range(3).select("id"))
    with pytest.raises(ValueError, match="reserved"):
        t.alter_add_column("__dv_file", "string")
    t.alter_add_column("v", "bigint")
    with pytest.raises(ValueError, match="reserved"):
        t.alter_rename_column("v", "__numRows")
