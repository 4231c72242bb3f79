"""temporal.decayed_agg — exponentially time-decayed per-key aggregates."""

from __future__ import annotations

import datetime as dt

import pytest

from delta_lake_platform_spark.operators.temporal import decayed_agg

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
DAY = dt.timedelta(days=1)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    return {r.user_id: r for r in decayed_agg(df, **kw).collect()}


def test_closed_form_half_life(spark):
    # anchor = max ts = T0+2d; ages 0, 1d, 2d at half_life=1d
    rows = [
        (1, T0 + 2 * DAY, 10.0),  # weight 1
        (1, T0 + 1 * DAY, 10.0),  # weight 1/2
        (1, T0, 10.0),            # weight 1/4
    ]
    r = _run(spark, rows, half_life_seconds=86400.0)[1]
    assert r.n_events == 3
    assert r.decayed_sum == pytest.approx(17.5)
    assert r.decayed_count == pytest.approx(1.75)
    assert r.decayed_avg == pytest.approx(10.0)


def test_anchor_is_global_not_per_key(spark):
    # user 2's newest event is 1d older than the GLOBAL max (user 1's)
    rows = [(1, T0 + DAY, 4.0), (2, T0, 8.0)]
    out = _run(spark, rows, half_life_seconds=86400.0)
    assert out[1].decayed_sum == pytest.approx(4.0)
    assert out[2].decayed_sum == pytest.approx(4.0)  # 8 * 2^-1
    assert out[2].decayed_avg == pytest.approx(8.0)  # ratio cancels decay


def test_weights_monotone_in_half_life(spark):
    rows = [(1, T0 + DAY, 5.0), (1, T0, 5.0)]
    short = _run(spark, rows, half_life_seconds=3600.0)[1]
    long = _run(spark, rows, half_life_seconds=7 * 86400.0)[1]
    assert short.decayed_sum < long.decayed_sum
    assert long.decayed_count <= 2.0


# --- incremental maintenance -------------------------------------------------

from delta_lake_platform_spark.operators.temporal import (  # noqa: E402
    decayed_agg_update,
    decayed_agg_with_anchor,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )


def _assert_state_equals_recompute(spark, history, batch, hl):
    full = {
        r.user_id: r
        for r in decayed_agg_with_anchor(
            _frame(spark, history + batch), half_life_seconds=hl
        ).collect()
    }
    state = decayed_agg_with_anchor(
        _frame(spark, history), half_life_seconds=hl
    )
    inc = {
        r.user_id: r
        for r in decayed_agg_update(
            state, _frame(spark, batch), half_life_seconds=hl
        ).collect()
    }
    assert set(inc) == set(full)
    for k in full:
        assert inc[k].n_events == full[k].n_events, k
        assert inc[k].decayed_sum == pytest.approx(
            full[k].decayed_sum, rel=1e-12
        ), k
        assert inc[k].decayed_count == pytest.approx(
            full[k].decayed_count, rel=1e-12
        ), k
        assert inc[k].anchor_ts == full[k].anchor_ts, k


def test_incremental_equals_recompute_forward_batch(spark):
    history = [(1, T0, 10.0), (1, T0 + DAY, 4.0), (2, T0, 8.0)]
    batch = [(1, T0 + 3 * DAY, 2.0), (3, T0 + 2 * DAY, 6.0)]
    _assert_state_equals_recompute(spark, history, batch, 86400.0)


def test_incremental_equals_recompute_late_batch(spark):
    # every batch row is OLDER than the state's anchor: the anchor
    # must not move and the late rows must decay themselves
    history = [(1, T0 + 3 * DAY, 10.0), (2, T0 + 2 * DAY, 8.0)]
    batch = [(1, T0, 1.0), (2, T0 + DAY, 2.0)]
    _assert_state_equals_recompute(spark, history, batch, 86400.0)


def test_incremental_new_and_untouched_keys(spark):
    # key 2 sees no batch rows (state must re-anchor anyway); key 9 is new
    history = [(1, T0, 5.0), (2, T0, 5.0)]
    batch = [(1, T0 + DAY, 5.0), (9, T0 + DAY, 3.0)]
    _assert_state_equals_recompute(spark, history, batch, 86400.0)
