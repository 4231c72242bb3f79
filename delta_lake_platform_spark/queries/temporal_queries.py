"""Temporal operators exposed to the driver: as-of join, banded range
join, and JSON extraction over the events stream."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, range_join_count
from ..sources.catalog import load_table
from .registry import register

ASOF_ORACLE = """
SELECT e.event_id, e.user_id, e.ts,
       p.value AS prior_purchase_value,
       p.ts AS prior_purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts > p.ts
ORDER BY e.event_id
"""


@register("asof_prior_purchase", ASOF_ORACLE)
def asof_prior_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct as-of join: each error event sees the most
    recent strictly-earlier purchase of the same user (operators/
    temporal.py — single shuffle, no range explosion)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        errors,
        purchases,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_cols=["value", "ts"],
        strict=True,
        suffix="_p",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("value_p").alias("prior_purchase_value"),
        F.col("ts_p").alias("prior_purchase_ts"),
    ).orderBy("event_id")


RANGE_ORACLE = """
SELECT e.event_id, e.user_id, e.ts,
  (SELECT COUNT(*) FROM events c
   WHERE c.event_type = 'click' AND c.user_id = e.user_id
     AND c.ts < e.ts AND c.ts >= e.ts - INTERVAL '10 minutes')::BIGINT AS n_in_range
FROM events e
WHERE e.event_type = 'error'
ORDER BY e.event_id
"""


@register("range_clicks_before_error", RANGE_ORACLE)
def range_clicks_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: clicks in the 10 minutes before each error,
    per user — O(n·m) theta join turned into a bucketed equi-join."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    return range_join_count(
        errors, clicks, on=["user_id"], left_time="ts", right_time="ts",
        lookback_seconds=600,
    ).orderBy("event_id")


JSON_ORACLE = """
SELECT event_type,
  COUNT(*) AS n,
  ROUND(AVG(json_extract(props, '$.k')::BIGINT), 4) AS avg_k,
  MAX(json_extract(props, '$.k')::BIGINT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("events_json_props", JSON_ORACLE)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON path into typed column, then
    aggregate (F.get_json_object — JVM-side Jackson, no Python)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# --- linear interpolation over a per-key time grid (r9) ----------------------

INTERP_ORACLE = """
WITH obs AS (
  SELECT user_id,
    (FLOOR(epoch(ts) / 3600) * 3600)::BIGINT AS grid_ts,
    AVG(ROUND(value * 100, 0)) AS v
  FROM events WHERE user_id < 20
  GROUP BY user_id, 2
),
spans AS (
  SELECT user_id, MIN(grid_ts) AS lo, MAX(grid_ts) AS hi FROM obs
  GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(range(lo, hi + 3600, 3600))::BIGINT AS grid_ts
  FROM spans
),
j AS (
  SELECT s.user_id, s.grid_ts, obs.v,
    last_value(obs.v IGNORE NULLS) OVER (
      PARTITION BY s.user_id ORDER BY s.grid_ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN obs.v IS NOT NULL THEN s.grid_ts END IGNORE NULLS)
      OVER (PARTITION BY s.user_id ORDER BY s.grid_ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    first_value(obs.v IGNORE NULLS) OVER (
      PARTITION BY s.user_id ORDER BY s.grid_ts
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN obs.v IS NOT NULL THEN s.grid_ts END IGNORE NULLS)
      OVER (PARTITION BY s.user_id ORDER BY s.grid_ts
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM spine s LEFT JOIN obs ON s.user_id = obs.user_id
    AND s.grid_ts = obs.grid_ts
)
SELECT user_id, grid_ts,
  FLOOR(COALESCE(v,
    CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
      THEN pv + (nv - pv) * ((grid_ts - pt) * 1.0 / (nt - pt)) END,
    pv, nv) * 10000.0 + 0.5)::BIGINT AS value_interp_micro,
  (v IS NOT NULL)::BIGINT AS observed
FROM j
ORDER BY user_id, grid_ts
"""


@register("events_value_interpolated", INTERP_ORACLE)
def events_value_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly grid with linear interpolation between
    neighboring observations (temporal.interpolate_time_grid): the
    missing sibling of LOCF gap-fill — head/tail cells extend the
    nearest observation, interior gaps interpolate by elapsed-time
    fraction. Bounded to user_id < 20 so the grid stays comparable.

    Cross-engine-exact form: the fixture's ``value`` is 2-decimal, so
    the pipeline works in integer CENTS (exact double sums — the cell
    AVG stops being summation-order-dependent) and emits integer
    MICRO-dollars via floor(x + 0.5). Every remaining op is a single
    correctly-rounded IEEE op on bit-identical inputs, so Spark and
    DuckDB agree bit-for-bit; decimal ROUND at any precision was
    flaky here (interpolated midpoints of fixed-precision data sit
    exactly on rounding half-boundaries — seen live at sf0.01)."""
    from ..operators.temporal import interpolate_time_grid

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select(
            "user_id", "ts",
            F.round(F.col("value") * 100, 0).alias("value"),
        )
    )
    g = interpolate_time_grid(ev, round_decimals=None)
    return g.select(
        "user_id", "grid_ts",
        F.floor(F.col("value_interp") * 10000.0 + 0.5)
        .cast("long").alias("value_interp_micro"),
        "observed",
    ).orderBy("user_id", "grid_ts")


# --- exponentially time-decayed per-key aggregates (r9) -----------------------

DECAYED_ORACLE = """
WITH a AS (SELECT MAX(ts) AS anchor FROM events),
w AS (
  SELECT user_id, value,
    POWER(2.0, -(FLOOR(epoch(a.anchor)) - FLOOR(epoch(ts))) / 604800.0) AS wt
  FROM events, a
)
SELECT user_id,
  COUNT(*) AS n_events,
  ROUND(SUM(wt * value), 4) AS decayed_sum,
  ROUND(SUM(wt), 4) AS decayed_count,
  ROUND(SUM(wt * value) / SUM(wt), 4) AS decayed_avg
FROM w
GROUP BY user_id
ORDER BY user_id
"""


@register("events_decayed_engagement", DECAYED_ORACLE)
def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement per user (temporal.decayed_agg):
    each event contributes value * 2^(-age / 7 days) against the
    corpus-wide max timestamp — the feature-store scoring primitive
    that replaces N "events in last K days" windows with one smooth
    decay. One broadcast scalar + one map-side-combinable groupBy;
    rounded to 4 on both sides (decay weights are irrational, so
    rounded sums never sit on a decimal half-boundary)."""
    from ..operators.temporal import decayed_agg

    ev = load_table(spark, sf_dir, "events")
    return decayed_agg(ev, half_life_seconds=7 * 86400.0).orderBy("user_id")
