"""Semi-structured VARIANT queries (Spark 4.x open variant type).

The fixture's ``props`` is a flat ``{"k": int}``, so the query ENRICHES
it deterministically in-query (the same planting pattern the near-dup
queries use): purchases gain ``amount_cents``/``cur``, every third user
gains a ``tags`` array — a heterogeneous shape mix that exercises
typed path extraction (``variant_get``), missing-path NULL semantics
(``try_variant_get``), and per-row shape discovery
(``schema_of_variant``) against a DuckDB JSON oracle.

Amounts travel as integer CENTS so sums are exact and per-row variant
schemas are stable (a fractional amount would infer a different
DECIMAL(p,s) per row, making shape counts engine-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register


def _enriched_json() -> F.Column:
    """Deterministic heterogeneous JSON built from typed columns."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    amount = F.when(
        F.col("event_type") == "purchase",
        F.concat(
            F.lit(', "amount_cents": '),
            F.round(F.col("value") * 100, 0).cast("long").cast("string"),
            F.lit(', "cur": "usd"'),
        ),
    ).otherwise(F.lit(""))
    tags = F.when(
        F.col("user_id") % 3 == 0, F.lit(', "tags": ["a", "b"]')
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit('{"k": '), k.cast("string"), amount, tags, F.lit("}")
    )


VARIANT_ORACLE = """
WITH j AS (
  SELECT event_type,
    ('{"k": ' || json_extract(props::JSON, '$.k')
     || CASE WHEN event_type = 'purchase'
         THEN ', "amount_cents": ' || ROUND(value * 100, 0)::BIGINT
              || ', "cur": "usd"'
         ELSE '' END
     || CASE WHEN user_id % 3 = 0 THEN ', "tags": ["a", "b"]'
         ELSE '' END
     || '}')::JSON AS v
  FROM events
)
SELECT event_type,
  COUNT(*) AS n,
  SUM((json_extract(v, '$.amount_cents') IS NOT NULL)::INT)::BIGINT
    AS n_amount,
  COALESCE(SUM(json_extract(v, '$.amount_cents')::BIGINT), 0)::BIGINT
    AS sum_amount_cents,
  SUM((json_extract_string(v, '$.tags[0]') IS NOT NULL)::INT)::BIGINT
    AS n_tagged,
  COUNT(DISTINCT json_structure(v))::BIGINT AS n_shapes
FROM j
GROUP BY event_type
ORDER BY event_type
"""


@register("events_variant_profile", VARIANT_ORACLE)
def events_variant_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured profiling on the open VARIANT type: parse once
    (``parse_json`` — binary variant, not re-parsed per path), then
    typed extraction with ``variant_get``, optional-path presence with
    ``try_variant_get`` (NULL, never an error), and shape discovery
    with ``schema_of_variant``. At 100 TB the variant binary encoding
    is the point: paths are field-id lookups into the shredded value,
    not repeated JSON string parses, and everything here stays in
    whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events", parallel=True)
    v = F.parse_json(_enriched_json())
    rows = ev.select("event_type", v.alias("v"))
    amount = F.try_variant_get(F.col("v"), "$.amount_cents", "long")
    tag0 = F.try_variant_get(F.col("v"), "$.tags[0]", "string")
    return (
        rows.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(amount.isNotNull().cast("int")).cast("long").alias(
                "n_amount"
            ),
            F.coalesce(F.sum(amount), F.lit(0)).cast("long").alias(
                "sum_amount_cents"
            ),
            F.sum(tag0.isNotNull().cast("int")).cast("long").alias(
                "n_tagged"
            ),
            F.countDistinct(F.schema_of_variant(F.col("v"))).alias(
                "n_shapes"
            ),
        )
        .orderBy("event_type")
    )
