"""sampling.weighted_sample — Efraimidis-Spirakis A-ES weighted
sampling without replacement."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.operators.sampling import weighted_sample


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, w double")


def test_known_keys_and_ranking(spark):
    # keys are u^(1/w) with u reproducible from sha-256 of the id —
    # recompute them in Python and pin the selected order
    import hashlib

    rows = [(i, float(10 + 7 * i)) for i in range(8)]
    out = weighted_sample(
        _frame(spark, rows), k=3, weight_col="w"
    ).collect()

    def key(i, w):
        u = (int(hashlib.sha256(str(i).encode()).hexdigest()[8:16], 16) + 1.0) / 2**32
        return round(u ** (1.0 / w), 6)

    expected = sorted(
        ((key(i, w), -i) for i, w in rows), reverse=True
    )[:3]
    got = [(r.sample_key, -r.doc_id) for r in out]
    assert got == [(pytest.approx(k, abs=1e-9), i) for k, i in expected]
    assert [r.rank for r in out] == [1, 2, 3]


def test_membership_stable_under_repartitioning(spark):
    rows = [(i, float(1 + i % 5)) for i in range(200)]
    a = {r.doc_id for r in weighted_sample(_frame(spark, rows), 20, "w").collect()}
    b = {
        r.doc_id
        for r in weighted_sample(
            _frame(spark, rows).repartition(13), 20, "w"
        ).collect()
    }
    assert a == b


def test_nonpositive_and_null_weights_excluded(spark):
    rows = [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 5.0)]
    out = weighted_sample(_frame(spark, rows), 10, "w").collect()
    assert {r.doc_id for r in out} == {1, 5}


def test_heavier_weights_sampled_more_often(spark):
    # two strata of ids: weight 100 vs weight 1 — with k = half the
    # corpus, the heavy stratum must dominate the sample
    rows = [(i, 100.0) for i in range(100)] + [
        (i, 1.0) for i in range(100, 200)
    ]
    out = weighted_sample(_frame(spark, rows), 100, "w").collect()
    heavy = sum(1 for r in out if r.doc_id < 100)
    assert heavy > 80


def test_k_validation(spark):
    with pytest.raises(ValueError):
        weighted_sample(_frame(spark, [(1, 1.0)]), 0, "w")
