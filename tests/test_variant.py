"""Spark 4.x VARIANT surface: parse_json / variant_get /
try_variant_get / schema_of_variant, and parquet round-trip."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def vdf(spark):
    return spark.createDataFrame(
        [
            (1, '{"k": 5, "meta": {"x": 1.5}, "tags": ["a", "b"]}'),
            (2, '{"k": 7}'),
            (3, None),
        ],
        "id long, props string",
    ).select("id", F.parse_json(F.col("props")).alias("v"))


def test_typed_path_extraction(spark, vdf):
    rows = {
        r.id: r
        for r in vdf.select(
            "id",
            F.variant_get("v", "$.k", "long").alias("k"),
            F.variant_get("v", "$.meta.x", "double").alias("x"),
            F.variant_get("v", "$.tags[1]", "string").alias("t1"),
        ).collect()
    }
    assert (rows[1].k, rows[1].x, rows[1].t1) == (5, 1.5, "b")
    assert (rows[2].k, rows[2].x, rows[2].t1) == (7, None, None)
    assert rows[3].k is None  # NULL json -> NULL variant -> NULL path


def test_try_variant_get_is_null_on_type_mismatch(spark, vdf):
    rows = {
        r.id: r
        for r in vdf.select(
            "id",
            F.try_variant_get("v", "$.tags", "long").alias("bad_cast"),
            F.try_variant_get("v", "$.missing.path", "string").alias(
                "missing"
            ),
        ).collect()
    }
    assert rows[1].bad_cast is None
    assert rows[1].missing is None


def test_schema_of_variant_distinguishes_shapes(spark, vdf):
    n = (
        vdf.filter(F.col("v").isNotNull())
        .select(F.schema_of_variant("v").alias("s"))
        .distinct()
        .count()
    )
    assert n == 2


def test_variant_parquet_round_trip(spark, vdf):
    path = os.path.join(tempfile.mkdtemp(prefix="dlp_variant_"), "t")
    vdf.write.parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["v"] == "variant"
    got = {
        r.id: r.k
        for r in back.select(
            "id", F.variant_get("v", "$.k", "long").alias("k")
        ).collect()
    }
    assert got == {1: 5, 2: 7, 3: None}
