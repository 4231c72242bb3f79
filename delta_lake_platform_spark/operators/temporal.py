"""Temporal join operators Spark lacks natively: as-of join and
bucketized range join.

Both are implemented as single-shuffle DataFrame compositions (no
cross join, no UDFs):

- as-of join: union the two sides tagged, sort within the key
  partition by time, and carry the most recent right-side values
  forward with last(ignorenulls) over an unbounded-preceding window.
  One shuffle on the key; at 100 TB this is the canonical
  point-in-time-correct join for feature pipelines (no per-row
  subquery, no range explosion).
- range join: equi-join on a coarse time bucket with the right side
  exploded into the buckets its window can reach, then the exact range
  predicate filters within bucket pairs. Shuffle is on (key, bucket);
  the bucket width bounds the fan-out, turning an O(n*m) theta join
  into a banded equi-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: Sequence[str] | None = None,
    strict: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: the latest right row with
    right_time < left_time (strict) or <= (not strict), per key.

    Returns all left columns plus ``<right_col><suffix>`` columns
    (NULL when no prior right row exists).
    """
    right_cols = list(right_cols or [c for c in right.columns
                                     if c not in on and c != right_time])
    lt = F.col("__t")
    l_tagged = left.withColumn("__t", F.col(left_time)).withColumn(
        "__is_left", F.lit(1)
    )
    r_tagged = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    l_full = l_tagged
    for c in right_cols:
        l_full = l_full.withColumn(f"__r_{c}", F.lit(None).cast(
            dict(right.dtypes)[c]
        ))
    unioned = l_full.select(
        *left.columns, "__t", "__is_left", *[f"__r_{c}" for c in right_cols]
    ).unionByName(
        r_tagged.select(
            *on,
            *[
                F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c)
                for c in left.columns
                if c not in on
            ],
            "__t",
            "__is_left",
            *[f"__r_{c}" for c in right_cols],
        )
    )
    # strict: right rows at the same instant sort AFTER left rows, so
    # last() does not see them; non-strict: right rows first.
    tie = F.col("__is_left").asc() if not strict else F.col("__is_left").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *unioned.columns,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("__is_left") == 1).drop(
        "__t", "__is_left", *[f"__r_{c}" for c in right_cols]
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    lookback_seconds: int,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Count right rows with left_time - lookback <= right_time < left_time
    per left row. Banded equi-join: right rows are exploded into every
    bucket their lookback window can serve; exact predicate applies
    within bucket pairs."""
    bucket_seconds = bucket_seconds or lookback_seconds
    n_buckets = (lookback_seconds + bucket_seconds - 1) // bucket_seconds + 1
    lb = (F.unix_timestamp(F.col(left_time)) / bucket_seconds).cast("long")
    rb = (F.unix_timestamp(F.col(right_time)) / bucket_seconds).cast("long")

    l = left.withColumn("__bucket", lb)
    r = right.select(
        *on,
        F.col(right_time).alias("__rt"),
        F.explode(
            F.array(*[rb.cast("long") + i for i in range(n_buckets)])
        ).alias("__bucket"),
    )
    joined = l.join(r, on=[*on, "__bucket"], how="left_outer")
    in_range = (
        F.col("__rt").isNotNull()
        & (F.col("__rt") < F.col(left_time))
        & (
            F.col("__rt")
            >= F.col(left_time) - F.expr(f"INTERVAL {lookback_seconds} SECONDS")
        )
    )
    return (
        joined.groupBy(*left.columns)
        .agg(F.sum(F.when(in_range, 1).otherwise(0)).cast("long").alias("n_in_range"))
    )


def interpolate_time_grid(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 3600,
    round_decimals: int | None = 6,
) -> DataFrame:
    """Per-key time-grid regularization with LINEAR interpolation —
    the missing sibling of LOCF gap-fill: each key gets an epoch-
    aligned grid from its first to its last observation, observed
    cells average their readings, and empty cells interpolate
    linearly between the neighboring observations (head/tail cells
    extend the nearest one).

    Physical shape at 100 TB: one groupBy to the grid grain, one
    per-key min/max agg for the spans, a sequence+explode spine (no
    driver loop), and two ordered windows per key (prev/next
    observation carried via last/first IGNORE NULLS). Everything is
    built-in expressions; the windows sort within key partitions —
    cost is the series length per key, never the corpus.

    Output: key, grid_ts (epoch seconds, BIGINT), value_interp
    (rounded to ``round_decimals``; None = raw double), observed
    (1 for measured cells, 0 for filled).

    Cross-engine determinism note: with fractional inputs, the
    observed-cell AVG is summation-order-dependent and interpolated
    midpoints of fixed-precision data land EXACTLY on decimal
    rounding half-boundaries, so no choice of ``round_decimals``
    hash-compares reliably against another engine (seen live at
    sf0.01: one row off by 1e-6 at 6 decimals, several at 4). The
    registry query instead feeds integer-scaled values (cents), sets
    ``round_decimals=None``, and floors an integer output — exact
    integer sums make every IEEE op bit-identical across engines.
    """
    step = int(step_seconds)
    grid = (F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step).cast(
        "long"
    )
    obs = df.groupBy(F.col(key_col), grid.alias("grid_ts")).agg(
        F.avg(value_col).alias("__v")
    )
    spans = obs.groupBy(key_col).agg(
        F.min("grid_ts").alias("__lo"), F.max("grid_ts").alias("__hi")
    )
    spine = spans.select(
        key_col,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
        ).alias("grid_ts"),
    )
    j = spine.join(obs, [key_col, "grid_ts"], "left")
    wprev = (
        Window.partitionBy(key_col)
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wnext = (
        Window.partitionBy(key_col)
        .orderBy("grid_ts")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col("__v")
    t = F.col("grid_ts")
    prev_v = F.last(v, ignorenulls=True).over(wprev)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wprev)
    next_v = F.first(v, ignorenulls=True).over(wnext)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(wnext)
    frac = (t - prev_t).cast("double") / (next_t - prev_t).cast("double")
    interp = F.coalesce(
        v,
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        ),
        prev_v,  # tail: carry the last observation forward
        next_v,  # head: extend the first observation backward
    )
    return j.select(
        F.col(key_col),
        t,
        (
            interp if round_decimals is None
            else F.round(interp, round_decimals)
        ).alias("value_interp"),
        v.isNotNull().cast("long").alias("observed"),
    )


def decayed_agg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_seconds: float = 7 * 86400.0,
    round_decimals: int = 4,
) -> DataFrame:
    """Exponentially TIME-decayed aggregates per key — the streaming-
    feature-store scoring primitive (recency-weighted engagement,
    decayed revenue, freshness-weighted counts): each observation
    contributes ``value * 2^(-(T - t) / half_life)`` where T is the
    corpus-wide max timestamp (one broadcast scalar), so a reading one
    half-life old counts half as much as one made "now".

    Returns one row per key: ``n_events`` (plain count),
    ``decayed_sum``, ``decayed_count`` (sum of weights — the decayed
    event count), and ``decayed_avg`` (their ratio — NULL only on an
    empty frame, weights are strictly positive).

    Physical shape at 100 TB: a 1-row max-timestamp aggregate joined
    in via broadcast (no driver collect), then ONE map-side-combinable
    groupBy — the weight is computed per row inside whole-stage
    codegen, so the shuffle carries only (key, partial sums). Rounded
    to ``round_decimals`` (decay weights are irrational, so rounded
    comparisons never sit on a decimal half-boundary the way
    fixed-precision sums do).
    """
    anchor = df.agg(F.max(F.col(ts_col)).alias("__anchor"))
    raw = _decayed_rows(
        df.join(F.broadcast(anchor)),
        key_col, ts_col, value_col, half_life_seconds,
    )
    return raw.select(
        F.col(key_col),
        F.col("n_events"),
        F.round(F.col("decayed_sum"), round_decimals).alias("decayed_sum"),
        F.round(F.col("decayed_count"), round_decimals).alias(
            "decayed_count"
        ),
        F.round(
            F.col("decayed_sum") / F.col("decayed_count"), round_decimals
        ).alias("decayed_avg"),
    )


# Sentinel for "derive the anchor inside the plan" (the default two
# 1-row broadcast aggregates). Callers that already KNOW the new anchor
# (streaming folds: batch max via one tiny collect + state anchor from
# footer stats) pass ``anchor_us`` explicitly — the plan then carries a
# literal timestamp instead of two aggregate subtrees joined in, which
# at fold frequency is the difference between 8 jobs and 2 per fold.
# The arithmetic is IDENTICAL (same unix_timestamp/pow expressions over
# the same timestamp value), so results are bit-equal.
_ANCHOR_IN_PLAN = object()


def _anchor_lit(anchor_us) -> Column:
    """Literal timestamp column from epoch microseconds (None -> typed
    NULL, the value the in-plan aggregate yields for an empty input)."""
    if anchor_us is None:
        return F.lit(None).cast("timestamp")
    return F.timestamp_micros(F.lit(int(anchor_us)))


def decayed_agg_update(
    state: DataFrame,
    batch: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_seconds: float = 7 * 86400.0,
    anchor_us=_ANCHOR_IN_PLAN,
) -> DataFrame:
    """Fold a new micro-batch into an existing ``decayed_agg`` state
    WITHOUT revisiting history — the maintenance form that makes the
    decay usable as a continuously-updated feature: exponential decay
    is associative under anchor shift
    (``sum@T' = sum@T * 2^(-(T'-T)/hl) + batch_sum@T'``), so the old
    state re-anchors with one multiply and the batch contributes via
    the same one-pass aggregate ``decayed_agg`` runs.

    ``state`` must carry (key, n_events, decayed_sum, decayed_count,
    anchor_ts) — ``decayed_agg_with_anchor`` emits exactly that shape.
    Returns the same shape at the NEW anchor (max of both anchors;
    a batch older than the state's anchor decays itself instead).
    Physical shape: two 1-row anchor aggregates, one groupBy over the
    BATCH only, and a full-outer join on the key — cost is
    O(batch + |state keys|), never O(history). With ``anchor_us``
    supplied (epoch microseconds of max(batch ts, state anchor)) the
    anchor subtrees collapse to one literal: same values, no joins.
    """
    if anchor_us is _ANCHOR_IN_PLAN:
        new_anchor = (
            batch.agg(F.max(F.col(ts_col)).alias("__ba"))
            .join(
                F.broadcast(
                    state.agg(F.max(F.col("anchor_ts")).alias("__sa"))
                )
            )
            .select(
                F.greatest(
                    F.coalesce(F.col("__ba"), F.col("__sa")),
                    F.coalesce(F.col("__sa"), F.col("__ba")),
                ).alias("__anchor")
            )
        )
        batch_anchored = batch.join(F.broadcast(new_anchor))
        anchor_col = F.col("__anchor")
        state_anchored = state.join(F.broadcast(new_anchor))
    else:
        batch_anchored = batch.withColumn("__anchor", _anchor_lit(anchor_us))
        anchor_col = _anchor_lit(anchor_us)
        state_anchored = state
    fresh = _decayed_rows(
        batch_anchored, key_col, ts_col, value_col, half_life_seconds,
    )
    shift = F.pow(
        F.lit(2.0),
        -(
            F.unix_timestamp(anchor_col)
            - F.unix_timestamp(F.col("anchor_ts"))
        ).cast("double")
        / F.lit(float(half_life_seconds)),
    )
    old = state_anchored.select(
        F.col(key_col),
        F.col("n_events"),
        (F.col("decayed_sum") * shift).alias("decayed_sum"),
        (F.col("decayed_count") * shift).alias("decayed_count"),
        anchor_col.alias("__anchor"),
    )
    merged = old.unionByName(fresh).groupBy(key_col).agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("decayed_sum").alias("decayed_sum"),
        F.sum("decayed_count").alias("decayed_count"),
        F.max("__anchor").alias("anchor_ts"),
    )
    return merged.withColumn(
        "decayed_avg", F.col("decayed_sum") / F.col("decayed_count")
    )


def _decayed_rows(
    df_with_anchor: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_life_seconds: float,
) -> DataFrame:
    """Unrounded per-key decayed partials against a pre-joined
    ``__anchor`` column (shared by decayed_agg_with_anchor and the
    incremental update)."""
    age = F.unix_timestamp(F.col("__anchor")) - F.unix_timestamp(
        F.col(ts_col)
    )
    w = F.pow(
        F.lit(2.0), -age.cast("double") / F.lit(float(half_life_seconds))
    )
    return df_with_anchor.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(w * F.col(value_col)).alias("decayed_sum"),
        F.sum(w).alias("decayed_count"),
        F.max("__anchor").alias("__anchor"),
    )


def decayed_agg_with_anchor(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_seconds: float = 7 * 86400.0,
    anchor_us=_ANCHOR_IN_PLAN,
) -> DataFrame:
    """``decayed_agg`` in its maintainable form: unrounded sums plus
    the ``anchor_ts`` column, the state ``decayed_agg_update`` folds
    batches into. ``anchor_us`` as in ``decayed_agg_update``: a known
    anchor (epoch micros of max(ts)) becomes a literal, skipping the
    1-row aggregate + broadcast join."""
    if anchor_us is _ANCHOR_IN_PLAN:
        anchor = df.agg(F.max(F.col(ts_col)).alias("__anchor"))
        anchored = df.join(F.broadcast(anchor))
    else:
        anchored = df.withColumn("__anchor", _anchor_lit(anchor_us))
    out = _decayed_rows(
        anchored, key_col, ts_col, value_col, half_life_seconds,
    )
    return out.withColumnRenamed("__anchor", "anchor_ts").withColumn(
        "decayed_avg", F.col("decayed_sum") / F.col("decayed_count")
    )
