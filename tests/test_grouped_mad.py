"""The two MAD implementations (grouped-map applyInPandas vs all-JVM
exact percentile, operators/grouped.py) must agree exactly — they are
the measured two ends of the built-in-vs-UDF ladder."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_platform_spark.operators.grouped import (
    value_mad_per_user,
    value_mad_per_user_builtin,
)
from delta_lake_platform_spark.plans.introspect import (
    explain_str,
    has_broadcast_hash_join,
)
from delta_lake_platform_spark.sources.catalog import load_table


def _rounded(df):
    return df.select(
        "user_id",
        "n",
        F.round("median_value", 9).alias("median_value"),
        F.round("mad_value", 9).alias("mad_value"),
    )


def test_builtin_matches_grouped_udf(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = _rounded(value_mad_per_user(ev))
    b = _rounded(value_mad_per_user_builtin(ev))
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_builtin_broadcasts_medians_and_stays_jvm(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    df = value_mad_per_user_builtin(ev)
    assert has_broadcast_hash_join(df), "per-key medians not broadcast"
    assert "ArrowEvalPython" not in explain_str(df)
    assert "FlatMapGroupsInPandas" not in explain_str(df)
