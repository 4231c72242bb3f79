"""Streaming Misra-Gries heavy-hitters maintenance
(streaming/heavy_hitters.py + sketches.mg_truncate): exact regime when
m >= key cardinality, the N/(m+1) undercount bound when truncating,
heavy keys always survive, and the replay watermark makes refolds
no-ops."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.operators.sketches import mg_truncate
from delta_lake_platform_spark.sources.managed_table import ManagedTable
from delta_lake_platform_spark.streaming.heavy_hitters import (
    heavy_hitters_maintain_stream,
)


def _stream_of(spark, df, d, n_files=4):
    src = f"{d}/src"
    df.repartition(n_files).write.parquet(src)
    return (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def _skewed(spark):
    # two heavy keys (300 + 200 rows) over a 50-key uniform tail (10 each)
    heavy = [(1,)] * 300 + [(2,)] * 200
    tail = [(100 + k,) for k in range(50) for _ in range(10)]
    return spark.createDataFrame(heavy + tail, "user_id long")


def test_exact_regime_matches_groupby(spark):
    df = _skewed(spark)
    d = tempfile.mkdtemp(prefix="hh_exact_")
    try:
        state = ManagedTable(spark, f"{d}/state")
        folded = heavy_hitters_maintain_stream(
            _stream_of(spark, df, d), state, f"{d}/ckpt", m=1000
        )
        assert folded == 4
        got = {r["user_id"]: r["mg_count"] for r in state.read().collect()}
        want = {
            r["user_id"]: r["cnt"]
            for r in df.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
        }
        assert got == want  # m >= cardinality: nothing truncated, exact
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_truncation_bound_and_heavy_survival(spark):
    df = _skewed(spark)  # N = 1000
    m = 10
    d = tempfile.mkdtemp(prefix="hh_bound_")
    try:
        state = ManagedTable(spark, f"{d}/state")
        heavy_hitters_maintain_stream(
            _stream_of(spark, df, d), state, f"{d}/ckpt", m=m
        )
        got = {r["user_id"]: r["mg_count"] for r in state.read().collect()}
        true = {
            r["user_id"]: r["cnt"]
            for r in df.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
        }
        n = df.count()
        assert len(got) <= m
        # estimates never exceed the truth; undercount bounded by N/(m+1)
        for k, est in got.items():
            assert est <= true[k]
            assert true[k] - est <= n / (m + 1)
        # keys with true count > N/(m+1) are guaranteed present
        for k, cnt in true.items():
            if cnt > n / (m + 1):
                assert k in got, f"heavy key {k} (count {cnt}) truncated away"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_replay_is_noop(spark):
    df = _skewed(spark)
    d = tempfile.mkdtemp(prefix="hh_replay_")
    try:
        state = ManagedTable(spark, f"{d}/state")
        stream = _stream_of(spark, df, d)
        assert heavy_hitters_maintain_stream(
            stream, state, f"{d}/ckpt", m=1000, stream_id="s1"
        ) == 4
        v = state.latest_version()
        before = sorted(map(tuple, state.read().collect()))
        # fresh checkpoint + same stream_id = every batch id replays
        assert heavy_hitters_maintain_stream(
            stream, state, f"{d}/ckpt2", m=1000, stream_id="s1"
        ) == 0
        assert state.latest_version() == v  # no new commits at all
        assert sorted(map(tuple, state.read().collect())) == before
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_mg_truncate_validation_and_noop(spark):
    counts = spark.createDataFrame(
        [(1, 5), (2, 3)], "user_id long, mg_count long"
    )
    with pytest.raises(ValueError):
        mg_truncate(counts, 0, "user_id")
    # fewer keys than m: unchanged
    out = sorted(map(tuple, mg_truncate(counts, 5, "user_id").collect()))
    assert out == [(1, 5), (2, 3)]
    # m=1: subtract the 2nd-largest (3) -> only key 1 survives with 2
    out = sorted(map(tuple, mg_truncate(counts, 1, "user_id").collect()))
    assert out == [(1, 2)]
